"""Property test: d_span_removal must agree with a sequential model of the
Lee-et-al removal rule on arbitrary corpora — overlapping duplicated spans,
within-doc repeats, canonical-doc occurrences kept, whole-doc erasure."""

from __future__ import annotations

import hashlib
import itertools

from hypothesis import given, settings, strategies as st

from hadoop_hdfs_spark.pipeline.dedup import SPAN_K, d_span_removal

_SEQ = itertools.count(1)


def _model(docs: list[str]) -> dict[int, tuple[int, int, str]]:
    toks = {i: t.split(" ") for i, t in enumerate(docs)}
    canon: dict[str, int] = {}
    for i in sorted(toks):
        for s in range(len(toks[i]) - SPAN_K + 1):
            canon.setdefault(" ".join(toks[i][s : s + SPAN_K]), i)
    out = {}
    for i, tk in toks.items():
        marked: set[int] = set()
        for s in range(len(tk) - SPAN_K + 1):
            if canon[" ".join(tk[s : s + SPAN_K])] < i:
                marked.update(range(s, s + SPAN_K))
        kept = [t for p, t in enumerate(tk) if p not in marked]
        out[i] = (
            len(tk),
            len(marked),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


# 3-token vocabulary over 6-14 token docs: 5-gram collisions across docs are
# common, so canonical-keep, partial-overlap and full-erasure paths all fire.
_doc = st.lists(
    st.sampled_from(["aa", "bb", "cc"]), min_size=6, max_size=14
).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=8))
def test_span_removal_matches_sequential_model(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id LONG, text STRING"
    )
    # unique pseudo-sf tag per example: the span-occ eager cache is keyed by
    # (app, sf_dir, tag) and must not serve a previous example's corpus
    e = {"documents": df, "__sf_dir__": f"hypo-span-{next(_SEQ)}"}
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["dedup_md5"])
        for r in d_span_removal(e).collect()
    }
    assert got == _model(docs)


def test_span_removal_keeps_canonical_occurrence(spark):
    """The min-doc_id holder of a duplicated span keeps its text intact;
    every later holder loses the span's token range."""
    text = "x1 x2 x3 x4 x5 x6"
    df = spark.createDataFrame(
        [(0, text), (1, text), (2, "z " + text)], "doc_id LONG, text STRING"
    )
    e = {"documents": df, "__sf_dir__": f"hypo-span-{next(_SEQ)}"}
    rows = {r["doc_id"]: r for r in d_span_removal(e).collect()}
    assert rows[0]["n_removed"] == 0
    assert rows[1]["n_removed"] == 6  # both 5-gram windows union to all 6
    assert rows[2]["n_removed"] == 6  # suffix occurrence erased, 'z' survives
    assert rows[2]["dedup_md5"] == hashlib.md5(b"z").hexdigest()
