"""j4c_balancer_convergence vs a sequential reference simulator.

The Spark operator runs the Balancer iteration loop as a driver fixpoint
over DataFrame rounds (Balancer.java:1380-1404); this test replays the same
semantics as a plain sequential Python program — per-rack greedy pairing,
capped moves, state mutation — over generated clusters, and requires the
full per-iteration trajectory to match exactly. Catches any divergence
between the declarative pairing (windows + joins) and the intended
sequential algorithm: tie-breaks, cap application, residual matching,
termination."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_hdfs_spark.operators.cluster import (
    _BAL_MAX_ITERS,
    _BAL_MAX_MOVE,
    _BAL_THRESHOLD_M,
    _j4c_run,
)


def simulate(nodes: list[dict]) -> list[tuple[int, int, int, int, int]]:
    """Sequential model: (iteration, n_pairs, bytes_moved, over, under)."""
    su = sum(n["dfs_used"] for n in nodes)
    sc = sum(n["capacity"] for n in nodes)
    am = su * 100000 // sc
    used = {n["datanode_id"]: n["dfs_used"] for n in nodes}
    meta = {n["datanode_id"]: n for n in nodes}
    traj = []
    for k in range(1, _BAL_MAX_ITERS + 1):
        over, under = [], []
        for i, u in used.items():
            cap = meta[i]["capacity"]
            um = u * 100000 // cap
            if um > am + _BAL_THRESHOLD_M:
                over.append((i, meta[i]["rack"], (um - am) * cap // 100000))
            elif um < am - _BAL_THRESHOLD_M:
                under.append((i, meta[i]["rack"], (am - um) * cap // 100000))
        moves = []
        matched_src, matched_dst = set(), set()
        racks = {r for _, r, _ in over} | {r for _, r, _ in under}
        for r in sorted(racks):
            ro = sorted(
                [(i, x) for i, rr, x in over if rr == r],
                key=lambda t: (-t[1], t[0]),
            )
            ru = sorted(
                [(i, x) for i, rr, x in under if rr == r],
                key=lambda t: (-t[1], t[0]),
            )
            for (si, sx), (ti, tx) in zip(ro, ru):
                moves.append((si, ti, min(sx, tx, _BAL_MAX_MOVE)))
                matched_src.add(si)
                matched_dst.add(ti)
        ro = sorted(
            [(i, x) for i, _, x in over if i not in matched_src],
            key=lambda t: (-t[1], t[0]),
        )
        ru = sorted(
            [(i, x) for i, _, x in under if i not in matched_dst],
            key=lambda t: (-t[1], t[0]),
        )
        for (si, sx), (ti, tx) in zip(ro, ru):
            moves.append((si, ti, min(sx, tx, _BAL_MAX_MOVE)))
        if not moves:
            break
        traj.append(
            (k, len(moves), sum(m for _, _, m in moves), len(over), len(under))
        )
        for si, ti, m in moves:
            used[si] -= m
            used[ti] += m
    return traj


node_lists = st.lists(
    st.tuples(
        st.integers(min_value=1_000_000, max_value=8_000_000_000),  # capacity
        st.integers(min_value=0, max_value=1000),  # used as permille of cap
        st.sampled_from(["r1", "r2", "r3"]),
    ),
    min_size=2,
    max_size=10,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(node_lists)
def test_trajectory_matches_sequential_model(spark, raw):
    nodes = [
        {
            "datanode_id": f"dn-{i:03d}",
            "rack": rack,
            "capacity": cap,
            "dfs_used": cap * used_pm // 1000,
        }
        for i, (cap, used_pm, rack) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        [(n["datanode_id"], n["rack"], n["capacity"], n["dfs_used"]) for n in nodes],
        "datanode_id string, rack string, capacity bigint, dfs_used bigint",
    )
    got = [
        tuple(r)
        for r in _j4c_run({"datanodes": df}).orderBy("iteration").collect()
    ]
    assert got == simulate(nodes)


def test_fixture_trajectory_converges(spark, sf_dir):
    """On the fixture the loop must make monotone progress: bytes_moved
    positive each round, over-node count non-increasing, and it must stop
    before the iteration cap (balanced / no-counterpart exit)."""
    from hadoop_hdfs_spark import registry

    rows = (
        registry.queries()["j4c_balancer_convergence"](spark, sf_dir)
        .orderBy("iteration")
        .collect()
    )
    assert 1 <= len(rows) < _BAL_MAX_ITERS
    assert all(r.bytes_moved > 0 and r.n_pairs > 0 for r in rows)
    overs = [r.over_nodes for r in rows]
    assert overs == sorted(overs, reverse=True)
