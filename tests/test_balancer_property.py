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


def _drain(srcs: list[list], dsts: list[list]) -> list[tuple]:
    """Greedy sequential many-to-many drain (Balancer.chooseNodes:884-925):
    walk both budget lists in order; each step moves min(remaining,
    remaining) between the current source and target and advances
    whichever side is exhausted. Lists are [id, budget] and are MUTATED."""
    moves = []
    i = j = 0
    while i < len(srcs) and j < len(dsts):
        m = min(srcs[i][1], dsts[j][1])
        if m > 0:
            moves.append((srcs[i][0], dsts[j][0], m))
            srcs[i][1] -= m
            dsts[j][1] -= m
        if srcs[i][1] == 0:
            i += 1
        if j < len(dsts) and dsts[j][1] == 0:
            j += 1
    return moves


def simulate(nodes: list[dict]) -> list[tuple[int, int, int, int, int]]:
    """Sequential model: (iteration, n_moves, bytes_moved, over, under).
    Per-iteration node budget min(threshold gap, MAX_SIZE_TO_MOVE) on both
    sides; same-rack drain first, then a cross-rack drain over residual
    budgets re-ranked residual-descending."""
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
        res_src: dict[str, int] = {}
        res_dst: dict[str, int] = {}
        racks = {r for _, r, _ in over} | {r for _, r, _ in under}
        for r in sorted(racks):
            ro = [
                [i, min(x, _BAL_MAX_MOVE)]
                for i, x in sorted(
                    ((i, x) for i, rr, x in over if rr == r),
                    key=lambda t: (-t[1], t[0]),
                )
            ]
            ru = [
                [i, min(x, _BAL_MAX_MOVE)]
                for i, x in sorted(
                    ((i, x) for i, rr, x in under if rr == r),
                    key=lambda t: (-t[1], t[0]),
                )
            ]
            moves += _drain(ro, ru)
            res_src.update({i: b for i, b in ro if b > 0})
            res_dst.update({i: b for i, b in ru if b > 0})
        ro = [
            [i, b]
            for i, b in sorted(res_src.items(), key=lambda t: (-t[1], t[0]))
        ]
        ru = [
            [i, b]
            for i, b in sorted(res_dst.items(), key=lambda t: (-t[1], t[0]))
        ]
        moves += _drain(ro, ru)
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
