"""t_bpe_train: byte-pair-encoding merge training (Sennrich 2016) over the
document corpus — the tokenizer-training analog of the repo's iterative
driver-fixpoint operators (s_ivf_train, j4c_balancer_convergence).

The loop alternates (1) adjacent-symbol-pair counting over the
frequency-weighted word vocabulary and (2) greedy non-overlapping merge of
the argmax pair, emitting the merge table an LLM tokenizer ships:
(merge_idx, lhs, rhs, pair_count, n_symbols).

Cross-engine determinism has no floats at all: counts are BIGINTs, the
argmax total order is (count DESC, lhs, rhs), and the vocabulary cutoff is
(count DESC, word). The greedy merge itself is ONE string replace per
word, exact by construction: each symbol is wrapped in its own chr(31)
sentinels (``\\x1f a \\x1f\\x1f b \\x1f``), so consecutive pair occurrences
share no characters and the engines' left-to-right non-overlapping
``replace`` implements precisely BPE's merge order — no fold/UDF needed,
and chr(31) is verified absent from the corpus alphabet.

Scale: the corpus is touched ONCE (word count, partial-agg'd); every
iteration after that runs on the frequency-truncated vocabulary (top
``_BPE_VOCAB`` words), a dimension-sized frame — pair counting is a
vocab-bounded groupBy and the merge is a map. At 100 TB the word-count
scan dominates and parallelizes perfectly; the loop cost is independent
of corpus size, exactly how production BPE trainers batch it. The oracle
unrolls the same loop into materialized CTEs (plain CTEs re-evaluate per
reference — exponential across a chained unrolling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import register

_BPE_MERGES = 6
_BPE_VOCAB = 300

_SEP = "\x1f"


def _bpe_oracle() -> str:
    sep = "chr(31)"
    sep2 = f"{sep}||{sep}"
    parts = [
        f"""WITH bpw AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) t WHERE word <> '' GROUP BY word
  ORDER BY cnt DESC, word LIMIT {_BPE_VOCAB}
),
bpv_0 AS MATERIALIZED (
  SELECT word, cnt,
         {sep} || array_to_string(
           list_transform(range(1, length(word) + 1), i -> word[i]),
           {sep2}) || {sep} AS repr
  FROM bpw
)"""
    ]
    for k in range(1, _BPE_MERGES + 1):
        p = k - 1
        parts.append(f"""
bps_{k} AS MATERIALIZED (
  SELECT cnt, string_split(trim(repr, {sep}), {sep2}) AS syms FROM bpv_{p}
),
bpp_{k} AS MATERIALIZED (
  SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS c FROM (
    SELECT syms[i] AS l, syms[i + 1] AS r, cnt FROM (
      SELECT cnt, syms,
             unnest(generate_series(1, len(syms) - 1)) AS i FROM bps_{k}
    )
  ) GROUP BY l, r
),
bpb_{k} AS MATERIALIZED (
  SELECT l, r, c FROM bpp_{k} ORDER BY c DESC, l, r LIMIT 1
),
bpv_{k} AS MATERIALIZED (
  SELECT v.word, v.cnt,
         replace(v.repr, {sep}||b.l||{sep2}||b.r||{sep},
                 {sep}||b.l||b.r||{sep}) AS repr
  FROM bpv_{p} v, bpb_{k} b
),
bpt_{k} AS (
  SELECT CAST({k} AS INT) AS merge_idx, l AS lhs, r AS rhs,
         c AS pair_count,
         (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM (
            SELECT unnest(string_split(trim(repr, {sep}), {sep2})) AS s
            FROM bpv_{k})) AS n_symbols
  FROM bpb_{k}
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM bpt_{k}" for k in range(1, _BPE_MERGES + 1)
    )
    return (
        ",".join(parts)
        + f"\nSELECT merge_idx, lhs, rhs, pair_count, n_symbols FROM ({union}) t"
    )


def _bpe_tokenize_oracle() -> str:
    sep = "chr(31)"
    sep2 = f"{sep}||{sep}"
    # reuse the training chain's CTEs, then apply the 6 merges IN ORDER to a
    # whole-document wrapped representation (words separated by chr(30), so
    # no merge pattern can span a word boundary) and count surviving symbols
    train = _bpe_oracle()
    chain = train[: train.rindex("\nSELECT merge_idx")]  # drop final SELECT
    # Merge CTEs join as LEFT JOIN ON TRUE with COALESCE'd identity
    # patterns (ADVICE r4): if the corpus yields fewer than _BPE_MERGES
    # merges, an empty bpb_k must act as a NO-OP replace — chr(29) never
    # occurs in the wrapped repr (precondition asserted alongside the
    # chr(30)/chr(31) one), so replace(x, chr(29), '') is the identity —
    # instead of a zero-row cross join that would spuriously hash-mismatch
    # the Spark side (which simply applies the shorter merge list).
    expr = "repr"
    for k in range(1, _BPE_MERGES + 1):
        expr = (
            f"replace({expr}, "
            f"coalesce({sep}||m{k}.l||{sep2}||m{k}.r||{sep}, chr(29)), "
            f"coalesce({sep}||m{k}.l||m{k}.r||{sep}, ''))"
        )
    froms = " ".join(
        f"LEFT JOIN bpb_{k} m{k} ON TRUE" for k in range(1, _BPE_MERGES + 1)
    )
    return f"""{chain},
bpdoc AS (
  SELECT doc_id, length(text) AS n_chars_m,
         array_to_string(
           list_transform(string_split(text, ' '), w ->
             {sep} || array_to_string(
               list_transform(range(1, length(w) + 1), i -> w[i]),
               {sep2}) || {sep}),
           chr(30)) AS repr,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
  FROM documents
)
SELECT doc_id, n_words,
       CAST((length(r2) - length(replace(r2, {sep2}, ''))) // 2
            + n_words AS BIGINT) AS n_tokens,
       CAST(CAST(n_chars_m AS BIGINT) * 1000000
            // ((length(r2) - length(replace(r2, {sep2}, ''))) // 2
                + n_words) AS BIGINT) AS chars_per_token_e6
FROM (
  SELECT doc_id, n_words, n_chars_m, {expr} AS r2
  FROM bpdoc {froms}
) t"""


@register(
    "t_bpe_tokenize",
    oracle=_bpe_tokenize_oracle(),
    doc="Apply the trained BPE merge table corpus-wide: wrap every "
    "character of every word in chr(31) sentinels (words separated by "
    "chr(30), so no merge can cross a word boundary), replay the 6 "
    "merges IN TRAINING ORDER as chained string replaces, then count "
    "surviving symbols per document arithmetically (separator-pair count "
    "+ word count — the tokens never materialize as rows). Pure map, "
    "ZERO shuffle, whole-stage codegen end to end; the merge table "
    "arrives as 6 collected literals (broadcast-sized by construction). "
    "Emits (doc_id, n_words, n_tokens, chars_per_token_e6) — the "
    "tokens-per-doc accounting a training-data pipeline bills by. "
    "Precondition (holds for the fixtures, asserted in tests): text has "
    "no empty words and no chr(30)/chr(31). Oracle: the training chain's "
    "CTEs cross-joined (six 1-row merge tables) into the same chained "
    "replace.",
)
def t_bpe_tokenize(e) -> DataFrame:
    merges = sorted(
        (r.merge_idx, r.lhs, r.rhs)
        for r in t_bpe_train(e).select("merge_idx", "lhs", "rhs").collect()
    )
    sep2 = _SEP + _SEP
    words = F.split("text", " ")
    repr_col = F.array_join(
        F.transform(
            words,
            lambda w: F.concat(
                F.lit(_SEP),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.length(w)),
                        lambda i: w.substr(i, F.lit(1)),
                    ),
                    sep2,
                ),
                F.lit(_SEP),
            ),
        ),
        "\x1e",
    )
    for _, l, r in merges:
        repr_col = F.replace(
            repr_col, F.lit(_SEP + l + sep2 + r + _SEP), F.lit(_SEP + l + r + _SEP)
        )
    return (
        e["documents"]
        .select(
            "doc_id",
            F.size(words).cast("long").alias("n_words"),
            F.length(repr_col).cast("long").alias("len_all"),
            F.length(F.replace(repr_col, F.lit(sep2), F.lit("")))
            .cast("long")
            .alias("len_nosep"),
            F.length("text").cast("long").alias("n_chars_m"),
        )
        .select(
            "doc_id",
            "n_words",
            F.expr(
                "CAST((len_all - len_nosep) DIV 2 + n_words AS BIGINT)"
            ).alias("n_tokens"),
            "n_chars_m",
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            F.expr(
                "CAST(n_chars_m * 1000000 DIV n_tokens AS BIGINT)"
            ).alias("chars_per_token_e6"),
        )
    )


@register(
    "t_bpe_train",
    oracle=_bpe_oracle(),
    doc="BPE tokenizer merge training (Sennrich 2016): count the corpus "
    "words ONCE, truncate to the frequency-top vocabulary, then "
    "iteratively merge the most-frequent adjacent symbol pair "
    "(argmax total order: count DESC, lhs, rhs) and emit the merge "
    "table (merge_idx, lhs, rhs, pair_count, n_symbols) a tokenizer "
    "ships. The greedy non-overlapping merge is a single string replace "
    "over a chr(31)-wrapped symbol representation — adjacent pair "
    "occurrences share no characters, so left-to-right replace IS the "
    "BPE merge in both engines, no UDF. Driver-fixpoint shape shared "
    "with s_ivf_train: per round one vocab-bounded pair groupBy + a map; "
    "the corpus-sized scan happens once. All-BIGINT counts. Oracle: the "
    "same loop unrolled into materialized CTEs.",
)
def t_bpe_train(e) -> DataFrame:
    from ..registry import eager_cache_thunk

    return eager_cache_thunk(e, "bpe_train_merges", lambda: _bpe_train_run(e))


def _bpe_train_run(e) -> DataFrame:
    spark = e["documents"].sparkSession
    sep2 = _SEP + _SEP
    vocab = (
        e["documents"]
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(_BPE_VOCAB)
        .select(
            "word",
            "cnt",
            F.concat(
                F.lit(_SEP),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.length("word")),
                        lambda i: F.col("word").substr(i, F.lit(1)),
                    ),
                    sep2,
                ),
                F.lit(_SEP),
            ).alias("repr"),
        )
        .localCheckpoint(eager=True)
    )
    traj: list[tuple[int, str, str, int, int]] = []
    for k in range(1, _BPE_MERGES + 1):
        syms = F.split(
            F.regexp_replace("repr", f"^{_SEP}|{_SEP}$", ""), sep2
        )
        pairs = (
            vocab.select("cnt", syms.alias("syms"))
            .select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not pairs:  # all words are single symbols: nothing left to merge
            break
        best = pairs[0]
        vocab = vocab.select(
            "word",
            "cnt",
            F.replace(
                F.col("repr"),
                F.lit(_SEP + best.l + sep2 + best.r + _SEP),
                F.lit(_SEP + best.l + best.r + _SEP),
            ).alias("repr"),
        ).localCheckpoint(eager=True)
        n_symbols = (
            vocab.select(
                F.explode(
                    F.split(
                        F.regexp_replace("repr", f"^{_SEP}|{_SEP}$", ""), sep2
                    )
                ).alias("s")
            )
            .agg(F.countDistinct("s").alias("n"))
            .collect()[0]
            .n
        )
        traj.append((k, best.l, best.r, int(best.c), int(n_symbols)))
    return spark.createDataFrame(
        traj,
        "merge_idx int, lhs string, rhs string, pair_count bigint, "
        "n_symbols bigint",
    )
