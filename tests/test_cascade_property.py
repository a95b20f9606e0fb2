"""c_quality_filter_cascade vs a sequential reference interpreter.

The funnel-algebra test (test_queries) pins the STRUCTURE of the output;
this one pins the SIGNAL SEMANTICS: for generated corpora, a plain-Python
restatement of the four stage rules (whitespace tokens, type/token
diversity, duplicated-bigram ratio, punctuation ratio — the exact
t_quality_score / t_repetition / t_quality_signals formulas) must
classify every document into the same first-failing stage, and the
per-(source, stage) counts must match exactly. Engine-independent, so it
also guards the shared-SQL oracle blind spot."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def classify(text: str) -> int:
    toks = text.split(" ")
    ntok = len(toks)
    if ntok < 20:
        return 0
    div_e6 = math.floor(len(set(toks)) * 1000000.0 / ntok)
    if div_e6 < 300000:
        return 1
    bg = [f"{toks[i]} {toks[i + 1]}" for i in range(ntok - 1)] if ntok >= 2 else []
    nb = len(bg)
    dup_e6 = math.floor((nb - len(set(bg))) * 1000000.0 / nb) if nb > 0 else 0
    if nb >= 20 and dup_e6 >= 200000:
        return 2
    chars = max(len(text), 1)
    # mirror the regex [^A-Za-z0-9 ]: anything but ascii alnum and space
    punct = len(text) - sum(
        1
        for c in text
        if ("a" <= c <= "z") or ("A" <= c <= "Z") or ("0" <= c <= "9") or c == " "
    )
    if math.floor(punct * 1000000.0 / chars) >= 250000:
        return 3
    return 4


# words from a small alphabet so repetition/diversity branches all occur;
# occasional punctuation-heavy tokens drive the HIGH_PUNCT branch
word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "x!", "!!", "??!", "zz9"])
doc = st.lists(word, min_size=1, max_size=60).map(" ".join)
corpus = st.lists(
    st.tuples(doc, st.sampled_from(["s0", "s1"])), min_size=1, max_size=25
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus)
def test_stage_counts_match_sequential_model(spark, docs):
    from hadoop_hdfs_spark.pipeline.curation import c_quality_filter_cascade

    expected = Counter((src, classify(text)) for text, src in docs)
    e = {
        "documents": spark.createDataFrame(
            [(i, text, src) for i, (text, src) in enumerate(docs)],
            "doc_id LONG, text STRING, source STRING",
        )
    }
    got = {
        (r["source"], r["stage_idx"]): r["n_docs"]
        for r in c_quality_filter_cascade(e).collect()
    }
    assert got == dict(expected)
