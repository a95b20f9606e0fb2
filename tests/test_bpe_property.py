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
