"""t_bpe_train vs an independent sequential BPE trainer.

The Spark loop and the DuckDB oracle share the wrapped-string replace
trick, so the parametrized oracle gate alone can't catch a bug in the
trick itself. This model is the textbook dict-based BPE (Sennrich 2016,
Algorithm 1): explicit symbol tuples, explicit left-to-right
non-overlapping merge, no string representation at all — an independent
third derivation of the same merge table.
"""

from __future__ import annotations

from collections import Counter

import duckdb

from hadoop_hdfs_spark.pipeline.bpetrain import _BPE_MERGES, _BPE_VOCAB
from hadoop_hdfs_spark.registry import queries


def _sequential_bpe(word_counts: dict[str, int], n_merges: int):
    vocab = {w: tuple(w) for w in word_counts}
    merges = []
    for k in range(1, n_merges + 1):
        pair_counts: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += word_counts[w]
        if not pair_counts:
            break
        # argmax total order: count DESC, then (lhs, rhs) ascending
        (l, r), c = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        new_vocab = {}
        for w, syms in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[w] = tuple(out)
        vocab = new_vocab
        n_symbols = len({s for syms in vocab.values() for s in syms})
        merges.append((k, l, r, c, n_symbols))
    return merges


def test_bpe_matches_sequential_model(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT word, COUNT(*) AS cnt FROM ("
        "  SELECT unnest(string_split(text, ' ')) AS word"
        f"  FROM read_parquet('{sf_dir}/documents.parquet')"
        ") t WHERE word <> '' GROUP BY word "
        f"ORDER BY cnt DESC, word LIMIT {_BPE_VOCAB}"
    ).fetchall()
    expected = _sequential_bpe(dict(rows), _BPE_MERGES)

    got = [
        (r.merge_idx, r.lhs, r.rhs, r.pair_count, r.n_symbols)
        for r in sorted(
            queries()["t_bpe_train"](spark, sf_dir).collect(),
            key=lambda r: r.merge_idx,
        )
    ]
    assert got == expected


def test_sentinels_absent_from_corpus(sf_dir):
    """Precondition of the wrapped-replace trick AND the oracle's identity
    pattern: chr(29) (no-op replace pattern for missing merges), chr(30)
    (word separator) and chr(31) (symbol sentinel) must not occur in the
    fixture text."""
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE text LIKE '%' || chr(29) || '%' "
        "   OR text LIKE '%' || chr(30) || '%' "
        "   OR text LIKE '%' || chr(31) || '%'"
    ).fetchone()[0]
    assert n == 0


def test_sequential_model_greedy_merge_shapes():
    """Pin the greedy non-overlapping semantics the engines must share:
    'a a a' -> [aa, a] and interleaved pairs merge independently."""
    merges = _sequential_bpe({"aaa": 10, "xabab": 1}, 1)
    assert merges[0][1:3] == ("a", "a")
    # after merging (a,a): aaa -> (aa, a); xabab untouched pairwise count
    merges2 = _sequential_bpe({"abab": 5}, 2)
    # first merge (a,b) occurs twice in one word, non-overlapping
    assert merges2[0][1:4] == ("a", "b", 10)
    # second merge joins the two 'ab' symbols
    assert merges2[1][1:4] == ("ab", "ab", 5)


# ---------------------------------------------------- production-scale path
# The product trainer (train_merges) walks symbol LISTS; this reference
# walks the SENTINEL STRING form (chr(31)-wrapped chars, Python's
# left-to-right non-overlapping str.replace as the merge) — the same
# independence the oracle's string CTEs provide, but runnable at hundreds
# of merges.

_S = "\x1f"


def _string_bpe(word_counts: dict[str, int], n_merges: int):
    sep2 = _S + _S
    reprs = {w: _S + sep2.join(w) + _S for w in word_counts}
    merges = []
    for k in range(1, n_merges + 1):
        pair_counts: Counter = Counter()
        for w, rep in reprs.items():
            syms = rep.strip(_S).split(sep2)
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += word_counts[w]
        if not pair_counts:
            break
        (l, r), c = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        reprs = {
            w: rep.replace(_S + l + sep2 + r + _S, _S + l + r + _S)
            for w, rep in reprs.items()
        }
        n_symbols = len(
            {s for rep in reprs.values() for s in rep.strip(_S).split(sep2)}
        )
        merges.append((k, l, r, c, n_symbols))
    return merges, reprs


def _synthetic_vocab(n_words: int = 300) -> dict[str, int]:
    """Deterministic md5-derived vocabulary over a 4-letter alphabet —
    enough shared substructure that hundreds of merges exist."""
    import hashlib

    vocab: dict[str, int] = {}
    for i in range(n_words):
        h = hashlib.md5(f"bpe-word-{i}".encode()).hexdigest()
        w = "".join("abcd"[int(c, 16) % 4] for c in h[: 6 + i % 10])
        vocab[w] = vocab.get(w, 0) + 1 + int(h[:4], 16) % 50
    return vocab


def test_train_merges_matches_string_reference_at_300_merges():
    vocab = _synthetic_vocab()
    want, _ = _string_bpe(vocab, 300)
    assert len(want) >= 256, "fixture must sustain >= 256 merges"
    from hadoop_hdfs_spark.pipeline.bpetrain import train_merges

    got = train_merges(sorted(vocab.items()), 300)
    assert got == want


def test_bpe_apply_never_revisits_passed_ranks(spark):
    """Adversarial case for the rank-heap kernel: rule 1 creates symbol
    'ab', and rule 0's lhs IS 'ab'. Sequential in-order replay has already
    passed rank 0 when 'ab' appears, so 'abx' must encode to 2 tokens
    ([ab, x]); a min-rank iteration that re-visits enabled earlier ranks
    would merge to 1. Pins the `j > k` push guard."""
    from hadoop_hdfs_spark.pipeline.bpetrain import bpe_apply

    docs_df = spark.createDataFrame([(1, "abx abx")], "doc_id long, text string")
    merges_df = spark.createDataFrame(
        [(1, "ab", "x"), (2, "a", "b")],
        "merge_idx int, lhs string, rhs string",
    )
    [row] = bpe_apply(docs_df, merges_df).collect()
    assert (row.n_words, row.n_tokens) == (2, 4)


def test_bpe_apply_joins_match_sequential_encoding(spark):
    """bpe_apply (distinct-word encode + corpus join) vs encoding every
    document word with the string reference, at a 256+-merge table."""
    from hadoop_hdfs_spark.pipeline.bpetrain import bpe_apply, train_merges

    vocab = _synthetic_vocab()
    merges = train_merges(sorted(vocab.items()), 300)
    assert len(merges) >= 256
    words = sorted(vocab)
    docs = [
        (i, " ".join(words[(i * 7 + j) % len(words)] for j in range(12)))
        for i in range(40)
    ]
    docs_df = spark.createDataFrame(docs, "doc_id long, text string")
    merges_df = spark.createDataFrame(
        [(k, l, r) for k, l, r, _, _ in merges],
        "merge_idx int, lhs string, rhs string",
    )
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_apply(docs_df, merges_df).collect()
    }

    # sequential: replay the same merges over each word's sentinel string
    sep2 = _S + _S
    def encode(w: str) -> int:
        rep = _S + sep2.join(w) + _S
        for _, l, r, _, _ in merges:
            rep = rep.replace(_S + l + sep2 + r + _S, _S + l + r + _S)
        return len(rep.strip(_S).split(sep2))

    for doc_id, text in docs:
        ws = text.split(" ")
        assert got[doc_id] == (len(ws), sum(encode(w) for w in ws)), doc_id
