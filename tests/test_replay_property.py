"""Property-based check of edit-log replay (the SURVEY §5 randomized-workload
analog, TestLoadGenerator): random op sequences over an overlapping path
universe must drive apply_edits_batch to the same final state as a Python
model encoding the documented batch contract (replay.py module docstring):
renames first in txid order with collision authority, per-path create/delete/
set-replication fold, then subtree deletes by txid authority.

Pools deliberately overlap (rename destinations are also sources/targets of
other ops; nested paths) so chains, collisions, delete-under-rename, and
recreate-after-delete are all generated."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_hdfs_spark.streaming.replay import apply_edits_batch

PATHS = ["/a", "/a/x", "/b", "/b/z", "/d", "/d/x"]
DESTS = ["/d", "/b", "/e", "/a"]

ops = st.lists(
    st.tuples(
        st.sampled_from(
            ["OP_ADD", "OP_MKDIR", "OP_DELETE", "OP_SET_REPLICATION", "OP_RENAME"]
        ),
        st.sampled_from(PATHS),
        st.sampled_from(DESTS),
        st.integers(min_value=1, max_value=5),
    ),
    min_size=1,
    max_size=8,
)


def model(initial_state: dict, edits: list) -> dict:
    """The documented batch contract, interpreted sequentially in Python."""
    # state: path -> (exists, replication, authority_txid)
    state = {p: (ex, rp, 0) for p, (ex, rp) in initial_state.items()}

    # 1. renames in txid order; later authority wins collisions
    for txid, op, path, dst, _repl in edits:
        if op != "OP_RENAME":
            continue
        moved = {}
        for p in list(state):
            if p == path or p.startswith(path + "/"):
                ex, rp, _ = state.pop(p)
                moved[dst + p[len(path):]] = (ex, rp, txid)
        state.update(moved)

    # 2. per-path fold with txid authority
    last_exist: dict[str, tuple[bool, int]] = {}
    last_repl: dict[str, int] = {}
    for txid, op, path, _dst, repl in edits:
        if op in ("OP_ADD", "OP_MKDIR"):
            last_exist[path] = (True, txid)
            if op == "OP_ADD":
                last_repl[path] = repl if repl is not None else 3
        elif op == "OP_DELETE":
            last_exist[path] = (False, txid)
        elif op == "OP_SET_REPLICATION":
            last_repl[path] = repl
    out = {}
    for p in set(state) | set(last_exist) | set(last_repl):
        old_ex, old_rp, _ = state.get(p, (False, None, 0))
        ex, auth = last_exist.get(p, (old_ex, 0))
        rp = last_repl.get(p, old_rp)
        out[p] = [ex, rp, auth]

    # 3. subtree deletes by authority
    for txid, op, path, _dst, _repl in edits:
        if op != "OP_DELETE":
            continue
        for p, rec in out.items():
            if rec[2] < txid and p.startswith(path + "/"):
                rec[0] = False
    return {p: (ex, rp) for p, (ex, rp, _a) in out.items()}


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ops=ops,
    initial=st.lists(
        st.tuples(st.sampled_from(PATHS), st.integers(min_value=1, max_value=5)),
        max_size=3,
        unique_by=lambda t: t[0],
    ),
)
def test_replay_matches_model(spark, ops, initial):
    initial_state = {p: (True, rp) for p, rp in initial}
    state_rows = [(p, True, rp) for p, rp in initial]
    state = spark.createDataFrame(
        state_rows, "path STRING, exists BOOLEAN, replication INT"
    ) if state_rows else spark.createDataFrame(
        [], "path STRING, exists BOOLEAN, replication INT"
    )
    edits = [
        (
            i + 1,
            op,
            path,
            dst if op == "OP_RENAME" else None,
            repl if op in ("OP_ADD", "OP_SET_REPLICATION") else None,
        )
        for i, (op, path, dst, repl) in enumerate(ops)
    ]
    batch = spark.createDataFrame(
        [(t, o, 0, p, d, r) for t, o, p, d, r in edits],
        "txid LONG, op STRING, ts_ms LONG, path STRING, dst STRING, replication INT",
    )
    got = {
        r["path"]: (r["exists"], r["replication"])
        for r in apply_edits_batch(state, batch).collect()
    }
    want = model(initial_state, edits)
    assert got == want
