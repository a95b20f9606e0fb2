"""Property-based check of edit-log replay (the SURVEY §5 randomized-workload
analog, TestLoadGenerator): random op sequences over a small path universe
must drive apply_edits_batch to the same final state as a straightforward
sequential Python model — including subtree renames, the known trap."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_hdfs_spark.streaming.replay import apply_edits_batch

PATHS = ["/a", "/a/x", "/a/y", "/b", "/b/z", "/c"]
DESTS = ["/d", "/e", "/f"]

ops = st.lists(
    st.tuples(
        st.sampled_from(["OP_ADD", "OP_MKDIR", "OP_DELETE", "OP_SET_REPLICATION", "OP_RENAME"]),
        st.sampled_from(PATHS),
        st.sampled_from(DESTS),
        st.integers(min_value=1, max_value=5),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=ops, initial=st.lists(st.sampled_from(PATHS), max_size=3, unique=True))
def test_replay_matches_python_model(spark, ops, initial):
    state_rows = [(p, True, 3) for p in initial]
    state = spark.createDataFrame(
        state_rows, "path STRING, exists BOOLEAN, replication INT"
    ) if state_rows else spark.createDataFrame(
        [], "path STRING, exists BOOLEAN, replication INT"
    )
    edits = [
        (i, op, 0, path, dst if op == "OP_RENAME" else None,
         repl if op in ("OP_ADD", "OP_SET_REPLICATION") else None)
        for i, (op, path, dst, repl) in enumerate(ops)
    ]
    batch = spark.createDataFrame(
        edits, "txid LONG, op STRING, ts_ms LONG, path STRING, dst STRING, replication INT"
    )
    got = {
        r["path"]: (r["exists"], r["replication"])
        for r in apply_edits_batch(state, batch).collect()
    }

    model_edits = [(i, op, path, dst, repl) for i, (op, path, dst, repl) in enumerate(ops)]
    want = dict({p: (True, 3) for p in initial})
    want = python_model_with_initial(want, model_edits)
    assert got == want


def python_model_with_initial(initial_state, edits):
    state = dict(initial_state)
    renames = [e for e in edits if e[1] == "OP_RENAME"]
    renamed = {}
    for _txid, _op, path, dst, _repl in renames:
        for p in list(state):
            if p == path or p.startswith(path + "/"):
                renamed[dst + p[len(path):]] = state.pop(p)
    state.update(renamed)
    others = [e for e in edits if e[1] != "OP_RENAME"]
    last_exist: dict[str, bool] = {}
    last_repl: dict[str, int] = {}
    for _txid, op, path, _dst, repl in others:
        if op in ("OP_ADD", "OP_MKDIR"):
            last_exist[path] = True
            if op == "OP_ADD":
                last_repl[path] = repl if repl is not None else 3
        elif op == "OP_DELETE":
            last_exist[path] = False
        elif op == "OP_SET_REPLICATION":
            last_repl[path] = repl
    for path in set(last_exist) | set(last_repl):
        old = state.get(path, (False, None))
        state[path] = (
            last_exist.get(path, old[0]),
            last_repl.get(path, old[1]),
        )
    return state
