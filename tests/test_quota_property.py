"""Quota-enforcing replay (streaming/quota.py) vs a sequential interpreter.

The interpreter replays the same ops over an EXPLICIT path set — the
ground-truth sequential semantics (FSDirectory.verifyQuota walk per
mutation) — and the property requires the driver-fold enforcement to
reject exactly the same txids AND produce the same final namespace after
the merge. Generator scope matches the documented contract: flat-path
model; rename chains of ANY depth within one batch are in scope (the
time-consistent pre-image closure is exact), only renames into/onto the
own subtree are filtered — the reference itself refuses those."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_hdfs_spark.streaming.quota import (
    apply_edits_batch_enforcing,
    verify_quota_batch,
)

SEGS = ["a", "b", "c"]
paths = st.lists(st.sampled_from(SEGS), min_size=1, max_size=3).map(
    lambda s: "/" + "/".join(s)
)


def _within(x: str, p: str) -> bool:
    return p == x or p.startswith(x + "/")


def simulate(initial: set[str], ops: list[dict], quotas: dict[str, int]):
    """Sequential ground truth over explicit path sets."""
    ns = set(initial)
    rejected = []
    for o in sorted(ops, key=lambda o: o["txid"]):
        op, p, dst = o["op"], o["path"], o.get("dst")
        if op in ("OP_ADD", "OP_MKDIR", "OP_SYMLINK"):
            if p in ns:
                continue
            bad = [
                x
                for x, q in quotas.items()
                if _within(x, p)
                and len([e for e in ns if _within(x, e)]) + 1 > q
            ]
            if bad:
                rejected.append(o["txid"])
                continue
            ns.add(p)
        elif op == "OP_DELETE":
            victims = {e for e in ns if _within(p, e)}
            ns -= victims
        elif op == "OP_CONCAT_DELETE":
            ns.discard(p)  # exact path only: concat sources are files
        elif op == "OP_RENAME" and dst:
            moved = {e for e in ns if _within(p, e)}
            if not moved or any(_within(dst, e) for e in ns):
                continue
            bad = [
                x
                for x, q in quotas.items()
                if _within(x, dst)
                and not _within(x, p)
                and len([e for e in ns if _within(x, e)]) + len(moved) > q
            ]
            if bad:
                rejected.append(o["txid"])
                continue
            ns -= moved
            ns |= {dst + e[len(p):] for e in moved}
    return ns, rejected


op_strategy = st.one_of(
    st.tuples(
        st.sampled_from(
            ["OP_ADD", "OP_MKDIR", "OP_DELETE", "OP_CONCAT_DELETE"]
        ),
        paths,
    ).map(
        lambda t: {"op": t[0], "path": t[1], "dst": None}
    ),
    st.tuples(st.just("OP_RENAME"), paths, paths).map(
        lambda t: {"op": t[0], "path": t[1], "dst": t[2]}
    ),
)


@st.composite
def scenarios(draw):
    initial = draw(st.sets(paths, max_size=6))
    raw_ops = draw(st.lists(op_strategy, min_size=1, max_size=10))
    ops = []
    for i, o in enumerate(raw_ops):
        if o["op"] == "OP_RENAME" and (
            _within(o["path"], o["dst"]) or _within(o["dst"], o["path"])
        ):
            continue  # HDFS forbids renames into/onto the own subtree
        ops.append({**o, "txid": i + 1})
    quota_dirs = draw(st.sets(paths, max_size=3))
    quotas = {
        d: draw(st.integers(min_value=0, max_value=5)) for d in quota_dirs
    }
    return initial, ops, quotas


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scenarios())
def test_enforcement_matches_sequential_interpreter(spark, scenario):
    initial, ops, quotas = scenario
    if not ops:
        return
    state = spark.createDataFrame(
        [(p, True, 0) for p in sorted(initial)] or [("/__none__", False, 0)],
        "path string, exists boolean, exist_txid long",
    )
    batch = spark.createDataFrame(
        [
            (o["txid"], o["op"], 1000 + o["txid"], o["path"], o["dst"], None, None, None, None)
            for o in ops
        ],
        "txid long, op string, ts_ms long, path string, dst string,"
        " replication int, perm string, owner string, gen_stamp long",
    )
    want_ns, want_rejected = simulate(initial, ops, quotas)

    got_rejected = [r.txid for r in verify_quota_batch(state, batch, quotas)]
    assert sorted(got_rejected) == sorted(want_rejected), (ops, quotas)

    new_state, rej2 = apply_edits_batch_enforcing(state, batch, quotas)
    assert sorted(r.txid for r in rej2) == sorted(want_rejected)
    if not any(o["op"] == "OP_RENAME" for o in ops):
        # final-namespace parity is only claimed for create/delete batches:
        # apply_edits_batch applies renames FIRST within a batch (its
        # documented micro-batch contract, replay.py module docstring), so
        # rename interleavings legitimately diverge from the strictly
        # sequential interpreter — the quota DECISIONS above are still
        # fully sequential either way.
        got_ns = {
            r.path
            for r in new_state.filter("exists").collect()
            if r.path != "/__none__"
        }
        assert got_ns == want_ns, (ops, quotas, sorted(got_ns), sorted(want_ns))


def test_rejection_records_deepest_violated_dir(spark):
    """Nested quotas: the recorded directory is the deepest violating one
    (the reference throws on the nearest violated ancestor it meets)."""
    state = spark.createDataFrame(
        [("/a/b/x", True, 0)], "path string, exists boolean, exist_txid long"
    )
    batch = spark.createDataFrame(
        [(1, "OP_ADD", 1000, "/a/b/y", None, None, None, None, None)],
        "txid long, op string, ts_ms long, path string, dst string,"
        " replication int, perm string, owner string, gen_stamp long",
    )
    rej = verify_quota_batch(state, batch, {"/a": 1, "/a/b": 1})
    assert len(rej) == 1
    assert rej[0].quota_dir == "/a/b"
    assert rej[0].quota_type == "NS"
    assert rej[0].limit == 1 and rej[0].used == 1


# ---------------------------------------------------------------- ds (bytes)

def simulate_ds(
    initial: dict[str, int],
    ops: list[dict],
    quotas: dict[str, int],
    ds_quotas: dict[str, int],
):
    """Sequential ground truth with BYTE accounting: explicit path->size
    map, diskspace checked per mutation like FSDirectory.verifyQuota's
    dsCount leg (growth-only, shrink always applies)."""
    sizes = dict(initial)
    rejected = []

    def sub_bytes(x):
        return sum(b for e, b in sizes.items() if _within(x, e))

    def sub_count(x):
        return len([e for e in sizes if _within(x, e)])

    for o in sorted(ops, key=lambda o: o["txid"]):
        op, p, dst, b = o["op"], o["path"], o.get("dst"), o.get("bytes", 0)
        if op in ("OP_ADD", "OP_MKDIR", "OP_SYMLINK"):
            if p in sizes:
                continue
            # verifyQuota: either delta positive -> BOTH dimensions checked
            # against updated counts (ns_delta=1 here, so DS is checked
            # even for a 0-byte create in an already-over-quota dir)
            if any(
                _within(x, p) and sub_count(x) + 1 > q
                for x, q in quotas.items()
            ) or any(
                _within(x, p) and sub_bytes(x) + b > q
                for x, q in ds_quotas.items()
            ):
                rejected.append(o["txid"])
                continue
            sizes[p] = b
        elif op == "OP_CLOSE":
            if p not in sizes:
                continue
            delta = b - sizes[p]
            if delta > 0 and (
                any(
                    _within(x, p) and sub_count(x) > q
                    for x, q in quotas.items()
                )
                or any(
                    _within(x, p) and sub_bytes(x) + delta > q
                    for x, q in ds_quotas.items()
                )
            ):
                rejected.append(o["txid"])
                continue
            sizes[p] = b
        elif op == "OP_DELETE":
            for e in [e for e in sizes if _within(p, e)]:
                del sizes[e]
        elif op == "OP_CONCAT_DELETE":
            sizes.pop(p, None)  # exact path only: concat sources are files
        elif op == "OP_RENAME" and dst:
            moved = {e: s for e, s in sizes.items() if _within(p, e)}
            if not moved or any(_within(dst, e) for e in sizes):
                continue
            mb = sum(moved.values())
            if any(
                _within(x, dst) and not _within(x, p)
                and sub_count(x) + len(moved) > q
                for x, q in quotas.items()
            ) or any(
                _within(x, dst) and not _within(x, p)
                and sub_bytes(x) + mb > q
                for x, q in ds_quotas.items()
            ):
                rejected.append(o["txid"])
                continue
            for e in moved:
                del sizes[e]
            for e, s in moved.items():
                sizes[dst + e[len(p):]] = s
    return sizes, rejected


ds_op_strategy = st.one_of(
    st.tuples(
        st.sampled_from(
            ["OP_ADD", "OP_CLOSE", "OP_DELETE", "OP_CONCAT_DELETE"]
        ),
        paths,
        st.integers(min_value=0, max_value=5),
    ).map(lambda t: {"op": t[0], "path": t[1], "dst": None, "bytes": t[2]}),
    st.tuples(st.just("OP_RENAME"), paths, paths).map(
        lambda t: {"op": t[0], "path": t[1], "dst": t[2], "bytes": 0}
    ),
)


@st.composite
def ds_scenarios(draw):
    initial = {
        p: draw(st.integers(min_value=0, max_value=3))
        for p in draw(st.sets(paths, max_size=6))
    }
    raw_ops = draw(st.lists(ds_op_strategy, min_size=1, max_size=10))
    ops = []
    for i, o in enumerate(raw_ops):
        if o["op"] == "OP_RENAME" and (
            _within(o["path"], o["dst"]) or _within(o["dst"], o["path"])
        ):
            continue
        ops.append({**o, "txid": i + 1})
    quotas = {
        d: draw(st.integers(min_value=0, max_value=5))
        for d in draw(st.sets(paths, max_size=2))
    }
    ds_quotas = {
        d: draw(st.integers(min_value=0, max_value=8))
        for d in draw(st.sets(paths, max_size=3))
    }
    return initial, ops, quotas, ds_quotas


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ds_scenarios())
def test_ds_enforcement_matches_sequential_interpreter(spark, scenario):
    initial, ops, quotas, ds_quotas = scenario
    if not ops:
        return
    state = spark.createDataFrame(
        [(p, True, 0, b) for p, b in sorted(initial.items())]
        or [("/__none__", False, 0, 0)],
        "path string, exists boolean, exist_txid long, length long",
    )
    batch = spark.createDataFrame(
        [
            (o["txid"], o["op"], 1000 + o["txid"], o["path"], o["dst"],
             None, None, None, None)
            for o in ops
        ],
        "txid long, op string, ts_ms long, path string, dst string,"
        " replication int, perm string, owner string, gen_stamp long",
    )
    # one block per byte-bearing op; replication NULL -> multiplier 1, so
    # the op's charge IS its generated byte count
    blocks = spark.createDataFrame(
        [(o["txid"], 0, o["bytes"]) for o in ops if o["bytes"]]
        or [(-1, 0, 0)],
        "txid long, block_seq int, num_bytes long",
    )
    _, want_rejected = simulate_ds(initial, ops, quotas, ds_quotas)
    got = verify_quota_batch(
        state, batch, quotas, ds_quotas=ds_quotas, blocks=blocks
    )
    assert sorted(r.txid for r in got) == sorted(want_rejected), (
        ops, quotas, ds_quotas, got,
    )


def test_over_quota_dir_rejects_growth_in_other_dimension(spark):
    """verifyQuota checks BOTH dimensions whenever either delta is
    positive (INodeDirectoryWithQuota.java:151-162): a directory seeded
    already over its DS quota rejects even a 0-byte create (ns_delta=1,
    ds_delta=0), and one over its NS quota rejects a growth-only close
    (ns_delta=0, ds_delta>0)."""
    state = spark.createDataFrame(
        [("/a/x", True, 0, 5), ("/a/y", True, 0, 0)],
        "path string, exists boolean, exist_txid long, length long",
    )
    batch = spark.createDataFrame(
        [
            (1, "OP_ADD", 1001, "/a/z", None, None, None, None, None),
            (2, "OP_CLOSE", 1002, "/a/y", None, None, None, None, None),
        ],
        "txid long, op string, ts_ms long, path string, dst string,"
        " replication int, perm string, owner string, gen_stamp long",
    )
    blocks = spark.createDataFrame(
        [(2, 0, 2)], "txid long, block_seq int, num_bytes long"
    )
    # /a holds 5 bytes > ds_quota 3: the 0-byte OP_ADD must be refused
    # (DS dimension, zero ds_delta) — the pre-fix code accepted it.
    rej = verify_quota_batch(
        state, batch, {}, ds_quotas={"/a": 3}, blocks=blocks
    )
    # the growth close (txid 2) also overflows the already-over dir
    assert [(r.txid, r.quota_type) for r in rej] == [(1, "DS"), (2, "DS")]
    # /a holds 2 entries > ns_quota 1: the growth close (ds_delta=+2)
    # must be refused on the NS dimension despite ns_delta=0.
    rej = verify_quota_batch(
        state, batch, {"/a": 1}, ds_quotas={"/a": 100}, blocks=blocks
    )
    assert [(r.txid, r.quota_type) for r in rej] == [(1, "NS"), (2, "NS")]


def test_ds_close_resize_and_replication_multiplier(spark):
    """OP_CLOSE growth is checked, shrink applies, and the charge is
    block-bytes x the op's carried replication."""
    state = spark.createDataFrame(
        [("/a/f", True, 0, 4)], "path string, exists boolean,"
        " exist_txid long, length long"
    )
    batch = spark.createDataFrame(
        [
            (1, "OP_ADD", 1001, "/a/g", None, 3, None, None, None),
            (2, "OP_CLOSE", 1002, "/a/f", None, None, None, None, None),
            (3, "OP_CLOSE", 1003, "/a/g", None, None, None, None, None),
        ],
        "txid long, op string, ts_ms long, path string, dst string,"
        " replication int, perm string, owner string, gen_stamp long",
    )
    blocks = spark.createDataFrame(
        [(1, 0, 2), (2, 0, 1), (3, 0, 9)],
        "txid long, block_seq int, num_bytes long",
    )
    # /a holds 4 bytes. txid 1: OP_ADD charge 3*2=6 -> 10 <= 12 OK.
    # txid 2: close shrinks /a/f 4->1 (never checked) -> 7.
    # txid 3: close grows /a/g 6->9, delta 3 -> 10 <= 12 OK.
    rej = verify_quota_batch(
        state, batch, {}, ds_quotas={"/a": 12}, blocks=blocks
    )
    assert rej == []
    # same batch under a tighter quota: txid 1 rejected (6 > 5 headroom
    # over 4), txid 3's growth then fits only if /a/g exists — it doesn't
    # (the add was refused), so the close is a no-op, and txid 2's shrink
    # still applies.
    rej = verify_quota_batch(
        state, batch, {}, ds_quotas={"/a": 9}, blocks=blocks
    )
    assert [(r.txid, r.quota_type, r.used) for r in rej] == [(1, "DS", 4)]


def test_growth_close_ns_checked_without_ds_quotas(spark):
    """A growth close in an already-over-NS-quota directory must reject
    even when NO byte quota is configured: verifyQuota gates on either
    positive delta, then checks BOTH dimensions — the pre-fix code only
    folded OP_CLOSE at all when ds_quotas was non-empty."""
    state = spark.createDataFrame(
        [("/a/x", True, 0, 0), ("/a/y", True, 0, 0)],
        "path string, exists boolean, exist_txid long, length long",
    )
    batch = spark.createDataFrame(
        [(1, "OP_CLOSE", 1001, "/a/y", None, None, None, None, None)],
        "txid long, op string, ts_ms long, path string, dst string,"
        " replication int, perm string, owner string, gen_stamp long",
    )
    blocks = spark.createDataFrame(
        [(1, 0, 4)], "txid long, block_seq int, num_bytes long"
    )
    rej = verify_quota_batch(state, batch, {"/a": 1}, blocks=blocks)
    assert [(r.txid, r.quota_type) for r in rej] == [(1, "NS")]


def test_concat_delete_frees_quota_within_batch(spark):
    """OP_CONCAT_DELETE removes exactly its source path, and the fold
    must credit that in-batch free — otherwise it rejects a create the
    merge (and the reference's sequential loader) would accept."""
    state = spark.createDataFrame(
        [("/a/x", True, 0, 0)],
        "path string, exists boolean, exist_txid long, length long",
    )
    batch = spark.createDataFrame(
        [
            (1, "OP_CONCAT_DELETE", 1001, "/a/x", "/b/t", None, None, None, None),
            (2, "OP_ADD", 1002, "/a/y", None, None, None, None, None),
        ],
        "txid long, op string, ts_ms long, path string, dst string,"
        " replication int, perm string, owner string, gen_stamp long",
    )
    assert verify_quota_batch(state, batch, {"/a": 1}) == []


def test_ds_quotas_without_blocks_raises(spark):
    """ds_quotas with no block payload table is silent non-enforcement
    (every charge would read 0) — it must fail loudly instead."""
    import pytest

    state = spark.createDataFrame(
        [("/a/x", True, 0, 0)],
        "path string, exists boolean, exist_txid long, length long",
    )
    batch = spark.createDataFrame(
        [(1, "OP_ADD", 1001, "/a/y", None, None, None, None, None)],
        "txid long, op string, ts_ms long, path string, dst string,"
        " replication int, perm string, owner string, gen_stamp long",
    )
    with pytest.raises(ValueError, match="blocks side table"):
        verify_quota_batch(state, batch, {}, ds_quotas={"/a": 3})


def test_verify_accepts_reduced_projections(spark):
    """The drop-in contract apply_edits_batch documents: a (txid, op,
    path) batch and a (path, exists)-only state must verify without
    AnalysisException."""
    state = spark.createDataFrame(
        [("/a/x", True)], "path string, exists boolean"
    )
    batch = spark.createDataFrame(
        [(1, "OP_ADD", "/a/y"), (2, "OP_ADD", "/a/z")],
        "txid long, op string, path string",
    )
    rej = verify_quota_batch(state, batch, {"/a": 2})
    assert [(r.txid, r.quota_type) for r in rej] == [(2, "NS")]
