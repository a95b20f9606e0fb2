"""Property test: the windowed sessionizer agrees with a sequential model
on random event streams (random clients, timestamps, duplicate ts values)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_hdfs_spark.operators.admin import sessionize

GAP = 100


def model_sessions(rows: list[tuple[int, str, int]], gap: int) -> set:
    """rows: (txid, client, ts_ms). Sequential sessionizer: per client sort
    by (ts, txid), split when gap strictly exceeded."""
    out = {}
    by_client: dict[str, list] = {}
    for txid, client, ts in rows:
        by_client.setdefault(client, []).append((ts, txid))
    for client, evs in by_client.items():
        evs.sort()
        seq = 0
        prev = None
        for ts, _ in evs:
            if prev is None or ts - prev > gap:
                seq += 1
                out[(client, seq)] = [ts, ts, 0]
            cur = out[(client, seq)]
            cur[1] = max(cur[1], ts)
            cur[2] += 1
            prev = ts
    return {
        (c, seq, start, end, n) for (c, seq), (start, end, n) in out.items()
    }


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_sessionize_matches_model(spark, events):
    rows = [(i, c, ts) for i, (c, ts) in enumerate(events)]
    df = spark.createDataFrame(rows, "txid long, client string, ts_ms long")
    got = {
        (r["client"], r["session_seq"], r["session_start_ms"],
         r["session_end_ms"], r["ops"])
        for r in sessionize(df, gap_ms=GAP).collect()
    }
    assert got == model_sessions(rows, GAP)
