"""Corpus curation operators — the sampling / splitting / packing /
decontamination stages a pretraining data pipeline runs between "raw corpus"
and "training shards".

Everything is deterministic: splits and mixtures assign by an arithmetic
hash of ``doc_id`` (an LCG step — identical 64-bit integer math in Spark and
DuckDB; no engine RNG is ever consulted), so reruns are stable, membership
is auditable, and both engines agree bit-for-bit. That property — sampling
as a pure function of the key — is also what makes the operators
shuffle-free: selection is a map-side filter at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import fan_out

# One LCG step (numerical-recipes constants), bucketed to [0, 100).
# doc_id * 1103515245 stays far below 2^63 for any realistic corpus id.
_HASH_SQL = "(doc_id * 1103515245 + 12345) % 2147483648"
_BUCKET_SQL = f"({_HASH_SQL}) % 100"


@register(
    "c_split_assign",
    oracle=f"""
SELECT lang, split,
       CAST(COUNT(*) AS BIGINT)                                AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT)       AS n_tokens
FROM (
  SELECT lang, text,
         CASE WHEN {_BUCKET_SQL} < 90 THEN 'train'
              WHEN {_BUCKET_SQL} < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
GROUP BY lang, split
""",
    doc="Deterministic train/val/test split (90/5/5): membership is a pure "
    "function of doc_id (one LCG step mod 100), so the split is stable "
    "across reruns and engines — no RNG, no sampleBy. Per-(lang, split) doc "
    "and token counts audit stratification. Assignment is a map; the only "
    "shuffle is the bounded audit aggregation.",
)
def c_split_assign(e) -> DataFrame:
    bucket = F.expr(_BUCKET_SQL)
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        e["documents"]
        .select("lang", split.alias("split"), F.size(F.split("text", " ")).alias("nt"))
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
    )


@register(
    "c_source_mixture",
    oracle=f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT)                                    AS n_total,
       CAST(SUM(CASE WHEN {_BUCKET_SQL} <
            10 + (CAST(substr(source, 4) AS BIGINT) * 8) % 70
            THEN 1 ELSE 0 END) AS BIGINT)                          AS n_selected
FROM documents
GROUP BY source
""",
    doc="Source-mixture downsampling: each source gets a target inclusion "
    "rate (10..80%, derived from the source id here; a real run feeds a "
    "weights table), and documents are kept when their deterministic "
    "doc_id bucket falls under the rate — the corpus-mixing step that "
    "reweights web/books/code slices before training. Selection is a "
    "map-side filter against a broadcast-size weights map; no sampling "
    "shuffle ever happens.",
)
def c_source_mixture(e) -> DataFrame:
    bucket = F.expr(_BUCKET_SQL)
    rate = 10 + (F.substring("source", 4, 10).cast("long") * 8) % 70
    return (
        e["documents"]
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(bucket < rate, 1).otherwise(0))
            .cast("long")
            .alias("n_selected"),
        )
    )


@register(
    "c_token_packing",
    oracle="""
SELECT doc_id, source,
       CAST(tok_start // 4096 AS BIGINT)        AS shard_id,
       CAST(tok_start % 4096 AS BIGINT)         AS shard_offset,
       CAST(n_tokens AS BIGINT)                 AS n_tokens
FROM (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tokens,
         COALESCE(SUM(len(string_split(text, ' '))) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
  FROM documents
)
""",
    doc="Token-budget shard packing: documents are laid out back-to-back in "
    "doc_id order and cut into 4096-token shards (running token count / "
    "floor-div — the sequence-packing address calculation). Packing is per "
    "source partition, so the cumsum window parallelizes across sources "
    "instead of collapsing to one global sort — the same partition-then-pack "
    "layout a real shard writer uses (global packing would serialize the "
    "corpus through one task).",
)
def c_token_packing(e) -> DataFrame:
    nt = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = e["documents"].select(
        "doc_id", "source", nt.cast("long").alias("n_tokens")
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "doc_id",
        "source",
        (start / 4096).cast("long").alias("shard_id"),
        (start % 4096).cast("long").alias("shard_offset"),
        "n_tokens",
    )


_SHINGLE3_SQL = """list_distinct(list_transform(
  range(1, len(string_split(text, ' ')) - 1),
  i -> md5(string_split(text, ' ')[i] || ' ' ||
           string_split(text, ' ')[i+1] || ' ' ||
           string_split(text, ' ')[i+2])))"""


def _shingle3(col):
    # the one guarded shingle implementation lives in functions.shingles
    from ..functions import shingles

    return shingles(col, 3)


@register(
    "c_decontaminate",
    oracle=f"""
WITH ev AS (
  SELECT DISTINCT unnest({_SHINGLE3_SQL}) AS h
  FROM documents WHERE source = 'src0'
),
tr AS (
  SELECT doc_id, unnest({_SHINGLE3_SQL}) AS h
  FROM documents WHERE source <> 'src0'
),
hits AS (
  SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM tr JOIN ev ON ev.h = tr.h
  GROUP BY tr.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(hits.n_overlap, 0) AS BIGINT) AS n_overlap_shingles,
       COALESCE(hits.n_overlap, 0) >= 5            AS contaminated
FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
LEFT JOIN hits ON hits.doc_id = d.doc_id
""",
    doc="Benchmark decontamination: treat the src0 slice as the held-out "
    "eval set, extract distinct 3-gram shingle hashes from both sides, and "
    "flag training documents sharing >= 5 shingles with any eval document. "
    "The eval shingle set is collected DISTINCT first and broadcast "
    "(benchmarks are small; the corpus is not), so the corpus side never "
    "shuffles — each task probes a broadcast hash set, and the only "
    "exchange is the per-doc overlap count. (On the 40-word fixture "
    "vocabulary most docs collide — the measured fact, not a bug; real "
    "corpora share n-grams only on true contamination.)",
)
def c_decontaminate(e) -> DataFrame:
    docs = e["documents"]
    ev = (
        docs.filter(F.col("source") == "src0")
        .select(F.explode(_shingle3(F.col("text"))).alias("h"))
        .distinct()
    )
    tr = docs.filter(F.col("source") != "src0").select(
        "doc_id", F.explode(_shingle3(F.col("text"))).alias("h")
    )
    hits = (
        tr.join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        docs.filter(F.col("source") != "src0")
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap_shingles"),
            (F.coalesce("n_overlap", F.lit(0)) >= 5).alias("contaminated"),
        )
    )


@register(
    "c_stratified_sample",
    oracle=f"""
WITH banded AS (
  SELECT doc_id, lang,
         CASE WHEN len(string_split(text, ' ')) < 20 THEN 'TOO_SHORT'
              WHEN len(list_distinct(string_split(text, ' '))) * 1000000.0
                   / len(string_split(text, ' ')) < 300000 THEN 'REPETITIVE'
              ELSE 'OK' END AS quality_band,
         ({_HASH_SQL}) AS h
  FROM documents
),
strata AS (
  SELECT lang, quality_band, CAST(COUNT(*) AS BIGINT) AS stratum_n
  FROM banded GROUP BY 1, 2
),
cut AS (
  SELECT lang, quality_band, stratum_n,
         LEAST(CAST(2147483648 AS BIGINT),
               (CAST(2147483648 AS BIGINT) * 60) // stratum_n) AS h_cut
  FROM strata
),
survivors AS (
  SELECT b.doc_id, b.lang, b.quality_band, b.h, c.stratum_n
  FROM banded b JOIN cut c
    ON b.lang = c.lang AND b.quality_band = c.quality_band
  WHERE b.h < c.h_cut
)
SELECT doc_id, lang, quality_band, stratum_n,
       CAST(rk AS BIGINT) AS strat_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, quality_band
                               ORDER BY h, doc_id) AS rk
  FROM survivors
) t
WHERE rk <= 20
""",
    doc="Stratified sampling (beyond reference — balanced eval-set "
    "drawing): up to 20 docs per (lang, quality_band) stratum, "
    "lowest-LCG-hash-first so the draw is deterministic, auditable, and "
    "stable under reruns. The naive form ranks every stratum member — a "
    "per-stratum one-task sort funnel at 100 TB. Instead: (1) count "
    "strata (bounded agg), (2) derive a per-stratum hash cutoff sized for "
    "~3x over-draw (60/stratum_n of the 2^31 hash space), broadcast it, "
    "(3) map-side filter the corpus to ~3K survivors per stratum, (4) "
    "rank ONLY survivors. The expensive exact window runs over a frame "
    "whose size is K-bounded, not corpus-bounded; the corpus itself never "
    "shuffles. Identical integer arithmetic both engines. NOTE the draw "
    "is expected-K, not guaranteed-K: the ~3x over-draw cutoff admits "
    "Binomial(stratum_n, ~60/stratum_n) survivors, so a stratum can "
    "under-fill below 20 with probability exp(-Θ(K)) (Chernoff, ~2e-4 at "
    "K=20) — both engines agree on the deterministic hash either way. A "
    "run that must guarantee K re-ranks only the under-filled strata "
    "(their membership is already counted in `strata`) with the full "
    "per-stratum window — the fallback touches only those strata.",
)
def c_stratified_sample(e) -> DataFrame:
    d = e["documents"]
    # staged select (r9): the token split evaluates once per doc — inline,
    # the band CASE re-derived it per branch (6 splits/row in the plan)
    t1 = d.select(
        "doc_id", "lang", F.split("text", " ").alias("toks"), F.expr(_HASH_SQL).alias("h")
    )
    t2 = t1.select(
        "doc_id",
        "lang",
        "h",
        F.size("toks").alias("n"),
        F.size(F.array_distinct("toks")).alias("ndt"),
    )
    div = F.col("ndt") * 1000000.0 / F.col("n")
    band = (
        F.when(F.col("n") < 20, "TOO_SHORT")
        .when(div < 300000, "REPETITIVE")
        .otherwise("OK")
    )
    banded = t2.select(
        "doc_id",
        "lang",
        band.alias("quality_band"),
        "h",
    )
    strata = banded.groupBy("lang", "quality_band").agg(
        F.count("*").cast("long").alias("stratum_n")
    )
    cut = strata.select(
        "lang",
        "quality_band",
        "stratum_n",
        # integer division on BOTH engines (DuckDB `//`, Spark DIV): a
        # float quotient cast to long would floor differently than the
        # oracle for hashes landing inside the fractional gap
        F.least(
            F.lit(2147483648).cast("long"),
            F.expr("CAST(2147483648 AS BIGINT) * 60 DIV stratum_n"),
        )
        .cast("long")
        .alias("h_cut"),
    )
    survivors = banded.join(F.broadcast(cut), ["lang", "quality_band"]).filter(
        F.col("h") < F.col("h_cut")
    )
    w = Window.partitionBy("lang", "quality_band").orderBy("h", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select(
            "doc_id",
            "lang",
            "quality_band",
            "stratum_n",
            F.col("rk").cast("long").alias("strat_rank"),
        )
    )


@register(
    "c_temperature_mixture",
    oracle=f"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM documents GROUP BY source
),
w AS (
  -- n^0.75 via sqrt(n * sqrt(n)): IEEE-754 requires sqrt to be CORRECTLY
  -- ROUNDED (unlike pow/exp/ln, which vary by libm in the last bit), so
  -- this weight is bit-identical in every engine
  SELECT source, n_s, sqrt(n_s * sqrt(n_s)) AS w_s FROM counts
),
z AS (SELECT SUM(w_s) AS w_total, SUM(n_s) AS n_total FROM w),
rates AS (
  SELECT w.source, w.n_s,
         CAST(FLOOR(LEAST(1.0, (w.w_s * z.n_total * 0.5)
                               / (z.w_total * w.n_s)) * 1000000 + 1e-9)
              AS BIGINT) AS rate_e6
  FROM w CROSS JOIN z
)
SELECT d.source,
       r.n_s                                                     AS n_docs,
       r.rate_e6,
       CAST(SUM(CASE WHEN ({_HASH_SQL}) % 1000000 < r.rate_e6
                THEN 1 ELSE 0 END) AS BIGINT)                    AS n_sampled
FROM documents d JOIN rates r ON r.source = d.source
GROUP BY d.source, r.n_s, r.rate_e6
""",
    doc="Temperature-based source mixing (beyond reference — the standard "
    "pretraining reweighting: sample source s proportionally to n_s^alpha "
    "with alpha=0.75, flattening the natural distribution so huge sources "
    "stop dominating): per-source weight n^0.75, normalized into an "
    "inclusion rate targeting half the corpus, capped at 1, then the "
    "deterministic per-document LCG hash decides membership — fully "
    "reproducible sampling, no RNG. Cross-engine bit-determinism trick: "
    "n^0.75 = sqrt(n * sqrt(n)) uses only sqrt, which IEEE-754 requires "
    "to be correctly rounded — unlike pow/exp/ln, whose last bits vary "
    "by libm and could flip a floored rate. Scale shape: rates live on a "
    "source-count-sized frame joined back broadcast; the corpus sees one "
    "map-side hash compare and one partial-agg shuffle of per-source "
    "counters.",
)
def c_temperature_mixture(e) -> DataFrame:
    d = e["documents"]
    counts = d.groupBy("source").agg(F.count("*").cast("long").alias("n_s"))
    w = counts.select(
        "source", "n_s", F.sqrt(F.col("n_s") * F.sqrt("n_s")).alias("w_s")
    )
    z = w.agg(
        F.sum("w_s").alias("w_total"), F.sum("n_s").alias("n_total")
    )
    rates = w.crossJoin(F.broadcast(z)).select(
        "source",
        "n_s",
        F.floor(
            F.least(
                F.lit(1.0),
                (F.col("w_s") * F.col("n_total") * 0.5)
                / (F.col("w_total") * F.col("n_s")),
            )
            * 1000000
            + 1e-9
        )
        .cast("long")
        .alias("rate_e6"),
    )
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source", F.col("n_s").alias("n_docs"), "rate_e6")
        .agg(
            F.sum(
                F.when(F.expr(f"({_HASH_SQL}) % 1000000") < F.col("rate_e6"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_sampled")
        )
    )


@register(
    "c_shard_layout",
    oracle=f"""
WITH assigned AS (
  SELECT ({_HASH_SQL}) % 16 AS shard_id,
         len(string_split(text, ' ')) AS nt,
         n_chars
  FROM documents
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents)
SELECT CAST(shard_id AS BIGINT)          AS shard_id,
       CAST(COUNT(*) AS BIGINT)          AS n_docs,
       CAST(SUM(nt) AS BIGINT)           AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT)      AS n_chars,
       CAST(FLOOR(COUNT(*) * 16000000.0 / tot.n_total) AS BIGINT) AS load_e6
FROM assigned CROSS JOIN tot
GROUP BY shard_id, tot.n_total
""",
    doc="Training-shard layout audit (beyond reference - the write-side "
    "plan of a shard writer): deterministic LCG-hash assignment of every "
    "document to one of 16 output shards, with per-shard doc/token/byte "
    "loads and the relative-load factor (1e6 = perfectly even). The "
    "assignment is the function a `df.repartitionByRange/repartition(16, "
    "shard_id).write` layout uses - auditing it as a query catches skew "
    "BEFORE the expensive write. Scale: map-side hash + one 16-group "
    "aggregate; the total-count scalar broadcasts.",
)
def c_shard_layout(e) -> DataFrame:
    d = e["documents"]
    tot = d.agg(F.count("*").alias("n_total"))
    assigned = d.select(
        (F.expr(_HASH_SQL) % 16).alias("shard_id"),
        F.size(F.split("text", " ")).alias("nt"),
        "n_chars",
    )
    return (
        assigned.crossJoin(F.broadcast(tot))
        .groupBy("shard_id", "n_total")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.floor(F.count("*") * 16000000.0 / F.any_value("n_total"))
            .cast("long")
            .alias("load_e6"),
        )
        .select("shard_id", "n_docs", "n_tokens", "n_chars", "load_e6")
        .withColumn("shard_id", F.col("shard_id").cast("long"))
    )


@register(
    "c_dsir_weights",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS t
  FROM documents
),
cc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY t),
ct AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM toks
       WHERE lang = 'en' GROUP BY t),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
               CAST(COUNT(DISTINCT t) AS BIGINT) AS v
        FROM toks),
scored AS (
  SELECT toks.doc_id,
         CAST(FLOOR((log2((COALESCE(ct.n, 0) + 1.0) / (tot.nt + tot.v))
                   - log2((cc.n + 1.0) / (tot.nc + tot.v))) * 1000 + 1e-9)
              AS BIGINT) AS llr_e3
  FROM toks
  JOIN cc ON cc.t = toks.t
  LEFT JOIN ct ON ct.t = toks.t
  CROSS JOIN tot
)
SELECT d.doc_id, d.lang, d.source,
       CAST(COUNT(*) AS BIGINT)    AS n_tokens,
       CAST(SUM(s.llr_e3) AS BIGINT) AS llr_sum_e3,
       CAST(FLOOR(SUM(s.llr_e3) * 1.0 / COUNT(*)) AS BIGINT) AS avg_llr_e3
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
GROUP BY d.doc_id, d.lang, d.source
""",
    doc="DSIR importance weights (Xie et al. 2023, 'Data Selection for "
    "Language Models via Importance Resampling'): per-doc log-likelihood "
    "ratio between an add-one-smoothed unigram LM of the target domain "
    "(lang='en' here stands in for the target sample) and the whole-corpus "
    "LM — the score DSIR resamples by to tilt a raw corpus toward a target "
    "distribution. Determinism: each token's llr is FLOOR-quantized to e3 "
    "BEFORE summation (t_lm_perplexity's trick), so per-doc totals are "
    "integer sums, order-independent across partitions; the one float "
    "division in avg is IEEE-exact on identical integer operands. Scale: "
    "both count tables are vocabulary-bounded (map-side combine collapses "
    "the corpus before the shuffle) and broadcastable; scoring is one "
    "equi-join on the token key — the same distributed LM-scoring shape "
    "as t_lm_perplexity, linear in corpus tokens.",
)
def c_dsir_weights(e) -> DataFrame:
    from .text import doc_token_counts

    # the shared pinned (doc, token, cnt) rollup: this query referenced
    # the raw token explode FOUR times per pass (cc/ct/tot/scored); every
    # occurrence-sum is recovered exactly as an integer sum(cnt * ...)
    # over the Heaps-bounded rows (r11; guide §2.3)
    toks = doc_token_counts(e)
    cc = toks.groupBy("t").agg(F.sum("cnt").alias("n_c"))
    ct = toks.filter(F.col("lang") == "en").groupBy("t").agg(
        F.sum("cnt").alias("n_t")
    )
    tot = toks.agg(
        F.sum("cnt").alias("nc"),
        F.sum(F.when(F.col("lang") == "en", F.col("cnt")).otherwise(0)).alias("nt"),
        F.countDistinct("t").alias("v"),
    )
    llr = F.floor(
        (
            F.log2((F.coalesce(F.col("n_t"), F.lit(0)) + 1.0) / (F.col("nt") + F.col("v")))
            - F.log2((F.col("n_c") + 1.0) / (F.col("nc") + F.col("v")))
        )
        * 1000
        + 1e-9
    ).cast("long")
    scored = (
        toks.join(F.broadcast(cc), "t")
        .join(F.broadcast(ct), "t", "left")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "lang", "source", "cnt", llr.alias("llr_e3"))
    )
    return scored.groupBy("doc_id", "lang", "source").agg(
        F.sum("cnt").alias("n_tokens"),
        F.sum(F.col("cnt") * F.col("llr_e3")).alias("llr_sum_e3"),
        F.floor(
            F.sum(F.col("cnt") * F.col("llr_e3")) * 1.0 / F.sum("cnt")
        ).cast("long").alias("avg_llr_e3"),
    )


@register(
    "c_epoch_shuffle",
    oracle="""
WITH p AS (
  SELECT ep.epoch, d.doc_id,
         md5(CAST(ep.epoch AS STRING) || '|' || CAST(d.doc_id AS STRING)) AS k
  FROM documents d
  CROSS JOIN (SELECT 0 AS epoch UNION ALL SELECT 1) ep
),
b AS (SELECT epoch, doc_id, k, substr(k, 1, 2) AS bucket FROM p),
c AS (SELECT epoch, bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM b GROUP BY epoch, bucket),
o AS (SELECT epoch, bucket,
             CAST(SUM(n) OVER (PARTITION BY epoch ORDER BY bucket) - n
                  AS BIGINT) AS off
      FROM c)
SELECT epoch, doc_id, pos, CAST((pos - 1) % 16 AS INT) AS shard
FROM (
  SELECT b.epoch, b.doc_id,
         CAST(o.off + ROW_NUMBER() OVER (PARTITION BY b.epoch, b.bucket
                                         ORDER BY b.k, b.doc_id)
              AS BIGINT) AS pos
  FROM b JOIN o ON o.epoch = b.epoch AND o.bucket = b.bucket
) t
""",
    doc="Deterministic per-epoch global training order: every epoch "
    "re-shuffles the corpus by md5(epoch|doc_id) and assigns each doc a "
    "global position plus a round-robin output shard — the reproducible "
    "'shuffle each epoch' contract a training dataloader needs, with no "
    "RNG state anywhere (re-running epoch 3 after a crash yields the "
    "identical order). Scale: the global position is NOT a corpus-wide "
    "window — the 2-hex-char key prefix pre-buckets rows into 256 ordered "
    "ranges, per-bucket counts (a 256-row frame per epoch) prefix-sum "
    "into offsets, and each row's position is offset + rank WITHIN its "
    "bucket. The corpus shuffles once on (epoch, bucket); no single "
    "partition ever holds an epoch's full order — the distributed "
    "enumeration pattern range-partitioned sorts use, made explicit.",
)
def c_epoch_shuffle(e) -> DataFrame:
    epochs = F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch")
    b = (
        e["documents"]
        .select("doc_id", epochs)
        .withColumn(
            "k",
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("epoch").cast("string"),
                    F.col("doc_id").cast("string"),
                )
            ),
        )
        .withColumn("bucket", F.substring("k", 1, 2))
    )
    c = b.groupBy("epoch", "bucket").agg(F.count("*").alias("n"))
    w_off = (
        Window.partitionBy("epoch")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = c.select(
        "epoch", "bucket", (F.sum("n").over(w_off) - F.col("n")).alias("off")
    )
    w_rk = Window.partitionBy("epoch", "bucket").orderBy("k", "doc_id")
    pos = (F.col("off") + F.row_number().over(w_rk)).cast("long")
    return (
        b.join(F.broadcast(o), ["epoch", "bucket"])
        .select("epoch", "doc_id", pos.alias("pos"))
        .withColumn("shard", ((F.col("pos") - 1) % 16).cast("int"))
    )


@register(
    "c_quality_filter_cascade",
    oracle="""
WITH cls AS (
  SELECT source,
         CASE WHEN ntok < 20 THEN 0
              WHEN div_e6 < 300000 THEN 1
              WHEN nb >= 20 AND dup_e6 >= 200000 THEN 2
              WHEN punct_e6 >= 250000 THEN 3
              ELSE 4 END AS stage_idx
  FROM (
    SELECT source,
           len(string_split(text, ' ')) AS ntok,
           CAST(FLOOR(len(list_distinct(string_split(text, ' '))) * 1000000.0
                / len(string_split(text, ' '))) AS BIGINT) AS div_e6,
           nb,
           CAST(CASE WHEN nb > 0 THEN FLOOR((nb - nd) * 1000000.0 / nb)
                ELSE 0 END AS BIGINT) AS dup_e6,
           CAST(FLOOR((length(text)
                - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
                * 1000000.0 / GREATEST(length(text), 1)) AS BIGINT) AS punct_e6
    FROM (
      SELECT source, text, len(bg) AS nb, len(list_distinct(bg)) AS nd
      FROM (
        SELECT source, text,
               list_transform(range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1]) AS bg
        FROM documents
      ) b
    ) s
  ) sig
),
counts AS (
  SELECT source, CAST(stage_idx AS BIGINT) AS stage_idx,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM cls GROUP BY source, stage_idx
)
SELECT source, stage_idx,
       CASE stage_idx WHEN 0 THEN 'TOO_SHORT' WHEN 1 THEN 'LOW_DIVERSITY'
            WHEN 2 THEN 'REPETITIVE_BIGRAMS' WHEN 3 THEN 'HIGH_PUNCT'
            ELSE 'PASS' END AS stage,
       n_docs,
       CAST(SUM(n_docs) OVER (PARTITION BY source ORDER BY stage_idx DESC)
            AS BIGINT) AS n_entering,
       CAST(FLOOR(n_docs * 1000000.0
            / SUM(n_docs) OVER (PARTITION BY source ORDER BY stage_idx DESC))
            AS BIGINT) AS share_of_entering_e6
FROM counts
""",
    doc="Quality-filter cascade funnel: every production corpus pipeline "
    "publishes a per-stage attrition table (how many docs each filter "
    "removed, of how many that reached it). Stages run cheap-to-expensive "
    "with FIRST-FAILING-STAGE attribution — short-circuit semantics, like "
    "the real cascade that stops evaluating a dropped doc: TOO_SHORT "
    "(<20 tokens) -> LOW_DIVERSITY (type/token < 0.3, t_quality_score's "
    "rule) -> REPETITIVE_BIGRAMS (t_repetition's Gopher/C4 rule) -> "
    "HIGH_PUNCT (>=25% punctuation chars, t_quality_signals' ratio) -> "
    "PASS. All signals are map-side expression work inside whole-stage "
    "codegen; the only shuffle is the (source x 5 stages)-bounded funnel "
    "aggregation, and n_entering is a reverse-cumulative window over that "
    "bounded frame — per-doc cost is one corpus scan at any scale.",
)
def c_quality_filter_cascade(e) -> DataFrame:
    d = e["documents"]
    # STAGED selects on purpose: each non-cheap array (token split, bigram
    # transform, array_distinct) is aliased once and referenced by name
    # downstream — CollapseProject declines to inline a multiply-referenced
    # non-cheap expression, so every signal costs ONE evaluation per doc.
    # Building the nested CASE inline instead duplicates the bigram tree
    # ~6x per row (measured 9.8 s vs 0.5 s warm at sf0.1).
    from ..functions import REPETITION_DUP_E6, REPETITION_MIN_BIGRAMS, bigrams
    from ..session import fan_out

    toks = F.split(F.col("text"), " ")
    # fanned out before the signal stage (r12, guide §2.5): the corpus
    # arrives as one effective split (single parquet row group), so the
    # whole per-doc signal chain — split, two array_distincts, the bigram
    # transform, the punctuation regex — ran in ONE task at any scale
    # (sf1 measured 3.5 s single-task vs 0.45 s at sf0.1)
    t1 = fan_out(d).select("source", "text", toks.alias("toks"))
    bg = bigrams("toks")  # the exact rule t_repetition flags (functions/)
    t1b = t1.select(
        "source",
        F.size("toks").alias("ntok"),
        F.size(F.array_distinct("toks")).alias("ndtok"),
        bg.alias("bg"),
        F.floor(
            (
                F.length("text")
                - F.length(F.regexp_replace(F.col("text"), "[^A-Za-z0-9 ]", ""))
            )
            * 1000000.0
            / F.greatest(F.length("text"), F.lit(1))
        )
        .cast("long")
        .alias("punct_e6"),
    )
    t2 = t1b.select(
        "source",
        "ntok",
        "ndtok",
        F.size("bg").alias("nb"),
        F.size(F.array_distinct("bg")).alias("ndb"),
        "punct_e6",
    )
    ntok, nb = F.col("ntok"), F.col("nb")
    div_e6 = F.floor(F.col("ndtok") * 1000000.0 / ntok).cast("long")
    dup_e6 = (
        F.when(nb > 0, F.floor((nb - F.col("ndb")) * 1000000.0 / nb))
        .otherwise(0)
        .cast("long")
    )
    stage_idx = (
        F.when(ntok < 20, 0)
        .when(div_e6 < 300000, 1)
        .when((nb >= REPETITION_MIN_BIGRAMS) & (dup_e6 >= REPETITION_DUP_E6), 2)
        .when(F.col("punct_e6") >= 250000, 3)
        .otherwise(4)
        .cast("long")
    )
    counts = (
        t2.select("source", stage_idx.alias("stage_idx"))
        .groupBy("source", "stage_idx")
        .agg(F.count("*").alias("n_docs"))
    )
    entering = F.sum("n_docs").over(
        Window.partitionBy("source").orderBy(F.col("stage_idx").desc())
    )
    stage_name = (
        F.when(F.col("stage_idx") == 0, "TOO_SHORT")
        .when(F.col("stage_idx") == 1, "LOW_DIVERSITY")
        .when(F.col("stage_idx") == 2, "REPETITIVE_BIGRAMS")
        .when(F.col("stage_idx") == 3, "HIGH_PUNCT")
        .otherwise("PASS")
    )
    return counts.select(
        "source",
        "stage_idx",
        stage_name.alias("stage"),
        "n_docs",
        entering.cast("long").alias("n_entering"),
        F.floor(F.col("n_docs") * 1000000.0 / entering)
        .cast("long")
        .alias("share_of_entering_e6"),
    )
