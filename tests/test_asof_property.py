"""Property test: the j8 as-of join (union + forward-fill formulation) must
agree with the obvious O(n^2) sequential model on arbitrary small inputs —
not just on the fixture's well-spaced timestamps.

Timestamps are generated unique per (path, op-side) pair: with duplicate
add timestamps on one path the "latest add" is genuinely ambiguous and both
the Spark window and DuckDB's native ASOF would tie-break arbitrarily.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_hdfs_spark.operators.relational import j8_asof_open_close

PATHS = ["/p/a", "/p/b", "/p/c"]


@st.composite
def edit_sets(draw):
    n = draw(st.integers(min_value=1, max_value=14))
    rows = []
    used = set()
    for txid in range(n):
        path = draw(st.sampled_from(PATHS))
        op = draw(st.sampled_from(["OP_ADD", "OP_CLOSE"]))
        ts = draw(
            st.integers(min_value=0, max_value=40).filter(
                lambda t, p=path, o=op: (p, o, t) not in used
            )
        )
        used.add((path, op, ts))
        rows.append((txid, op, ts, path))
    return rows


def _model(rows):
    out = set()
    for txid, op, ts, path in rows:
        if op != "OP_CLOSE":
            continue
        adds = [
            (a_ts, a_tx)
            for a_tx, a_op, a_ts, a_path in rows
            if a_op == "OP_ADD" and a_path == path and a_ts <= ts
        ]
        if adds:
            a_ts, a_tx = max(adds)
            out.add((path, txid, ts, a_tx, a_ts, ts - a_ts))
        else:
            out.add((path, txid, ts, None, None, None))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(edit_sets())
def test_asof_matches_sequential_model(spark, rows):
    edits = spark.createDataFrame(
        rows, "txid LONG, op STRING, ts_ms LONG, path STRING"
    )
    got = {
        (
            r["path"],
            r["close_txid"],
            r["close_ts_ms"],
            r["open_txid"],
            r["open_ts_ms"],
            r["open_age_ms"],
        )
        for r in j8_asof_open_close({"edits": edits}).collect()
    }
    assert got == _model(rows)


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    rows = []
    for doc_id in range(n):
        src = draw(st.sampled_from(["srcA", "srcB"]))
        n_tok = draw(st.integers(min_value=1, max_value=6000))
        rows.append((doc_id, src, n_tok))
    return rows


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(corpora())
def test_token_packing_matches_sequential_model(spark, rows):
    """Shard addresses must equal the greedy sequential layout per source:
    shard_id*4096 + shard_offset == running token count before the doc."""
    from hadoop_hdfs_spark.pipeline.curation import c_token_packing

    docs = spark.createDataFrame(
        [(i, s, "w " * (t - 1) + "w") for i, s, t in rows],
        "doc_id LONG, source STRING, text STRING",
    )
    got = {
        r["doc_id"]: (r["shard_id"], r["shard_offset"], r["n_tokens"])
        for r in c_token_packing({"documents": docs}).collect()
    }
    running: dict = {}
    for doc_id, src, n_tok in rows:  # doc_id ascending by construction
        start = running.get(src, 0)
        assert got[doc_id] == (start // 4096, start % 4096, n_tok), (
            doc_id,
            got[doc_id],
            start,
        )
        running[src] = start + n_tok
