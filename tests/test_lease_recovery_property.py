"""t24_lease_recovery vs a sequential reference interpreter.

The Spark operator restates recoverLeaseInternal's verdict ladder
(FSNamesystem.java:1521-1596) as joins + a last-block window; this test
replays the same semantics as a plain sequential Python program over
generated lease/block/replica states and requires every verdict row to
match exactly. Catches divergence in the ladder order (hard before soft
before RWR), the last-block selection (max seq, not any block), and the
left-join edges (open file with no blocks at all)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_hdfs_spark.entities import LEASE_HARD_MS, LEASE_SOFT_MS, NOW_MS


def simulate(files: list[dict]) -> dict[str, tuple[int, str]]:
    """Sequential model: path -> (last_block_id, verdict)."""
    out = {}
    for f in files:
        elapsed = NOW_MS - f["last_renewed_ms"]
        blocks = f["blocks"]  # list of (block_id, seq, [replica states])
        if blocks:
            last = max(blocks, key=lambda b: b[1])
            last_id = last[0]
            under_recovery = "RWR" in last[2]
        else:
            last_id, under_recovery = -1, False
        if elapsed > LEASE_HARD_MS:
            v = "MONITOR_RELEASED"
        elif elapsed > LEASE_SOFT_MS:
            v = "RECOVERY_STARTED"
        elif under_recovery:
            v = "RECOVERY_IN_PROGRESS"
        else:
            v = "DENIED_ALREADY_BEING_CREATED"
        out[f["path"]] = (last_id, v)
    return out


file_states = st.lists(
    st.tuples(
        # lease age in ms: spans active / soft / hard regions incl. edges
        st.integers(min_value=0, max_value=2 * LEASE_HARD_MS),
        # per-file blocks: replica-state lists per seq position
        st.lists(
            st.lists(
                st.sampled_from(["FINALIZED", "RBW", "RWR"]),
                min_size=0,
                max_size=3,
            ),
            min_size=0,
            max_size=4,
        ),
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(file_states)
def test_verdicts_match_sequential_model(spark, raw):
    from hadoop_hdfs_spark.operators.cluster import t24_lease_recovery

    files = []
    next_block = 100
    for i, (age_ms, block_specs) in enumerate(raw):
        blocks = []
        for seq, states in enumerate(block_specs):
            blocks.append((next_block, seq, list(states)))
            next_block += 1
        files.append(
            {
                "path": f"/f/{i}",
                "holder": f"c{i % 3}",
                "file_id": i + 1,
                "last_renewed_ms": NOW_MS - age_ms,
                "blocks": blocks,
            }
        )
    e = {
        "leases": spark.createDataFrame(
            [(f["holder"], f["path"], f["last_renewed_ms"]) for f in files],
            "holder STRING, path STRING, last_renewed_ms LONG",
        ),
        "inodes": spark.createDataFrame(
            [(f["file_id"], f["path"]) for f in files], "id LONG, path STRING"
        ),
        "blocks": spark.createDataFrame(
            [
                (bid, f["file_id"], seq)
                for f in files
                for bid, seq, _ in f["blocks"]
            ] or [(0, -1, 0)],  # createDataFrame needs >=0 rows w/ schema
            "block_id LONG, file_id LONG, seq INT",
        ),
        "replicas": spark.createDataFrame(
            [
                (bid, s)
                for f in files
                for bid, _, states in f["blocks"]
                for s in states
            ] or [(0, "FINALIZED")],
            "block_id LONG, state STRING",
        ),
    }
    got = {
        r["path"]: (r["last_block_id"], r["verdict"])
        for r in t24_lease_recovery(e).collect()
    }
    assert got == simulate(files)
