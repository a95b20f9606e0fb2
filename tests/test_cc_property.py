"""Property test: near_dup_clusters must agree with a sequential union-find
model on arbitrary pair graphs — long chains, stars, merges between
previously separate components, self-loops, duplicate and reversed edges."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from hadoop_hdfs_spark.pipeline.corpus import near_dup_clusters


def _model(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member of the component
    return {x: find(x) for x in parent}


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cc_matches_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "a_id LONG, b_id LONG")
    got = {r["doc_id"]: r["cluster_id"] for r in near_dup_clusters(df, max_iter=40).collect()}
    assert got == _model(pairs)


def test_cc_long_chain_converges(spark):
    """A 24-node path is the worst diameter for min-label propagation: the
    label walks one hop per round. max_iter must accommodate it."""
    pairs = [(i, i + 1) for i in range(24)]
    df = spark.createDataFrame(pairs, "a_id LONG, b_id LONG")
    got = {r["doc_id"]: r["cluster_id"] for r in near_dup_clusters(df, max_iter=30).collect()}
    assert set(got.values()) == {0}


def test_cc_long_chain_converges_or_raises(spark):
    """A chain component with diameter above the round cap must either
    converge (default cap) or raise loudly — never return labels that
    disagree with the transitive closure."""
    import pytest

    from hadoop_hdfs_spark.pipeline.corpus import near_dup_clusters

    n = 15  # diameter 14: beyond the old silent cap of 10 rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id LONG, b_id LONG"
    )
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(pairs).collect()
    }
    assert labels == {i: 0 for i in range(n)}  # one component, min label
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(pairs, max_iter=3)
