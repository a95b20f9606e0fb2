"""Quota-enforcing edit replay (FSDirectory.verifyQuota:1564-1605, rename
variant :1605-1629): a ``verify_quota`` mode for the T1 replay MERGE that
flags — and withholds — every mutation that would push a quota'd directory
over its namespace quota, instead of applying ops unchecked.

Shape: the reference walks ancestors on every sequential mutation; here the
sequential part is a DRIVER FOLD over the micro-batch's bounded op list
(the same justification as the rename/delete folds in ``replay.py`` — the
reference loader is itself a single-threaded loop over the segment), while
everything that scales with the NAMESPACE stays distributed: the initial
per-directory usage counts come from one broadcast-join aggregation over
the state frame (the A1 ContentSummary ancestor-counting shape), and the
accepted-op filter is an anti-join. Per batch: O(state) distributed work
once, O(ops x tracked-paths) driver work.

Semantics (flat-path namespace model, matching ``apply_edits_batch``):

- ns quota of directory ``x`` bounds the number of EXISTING entries within
  ``x``'s subtree (path == x or path starts with x + "/") — the
  INodeDirectoryWithQuota named-item count.
- Ops fold in txid order. CREATE of a non-existing path consumes one unit
  in every quota'd ancestor; if any would overflow, the op is REJECTED
  (recorded with the deepest violating directory, like the exception the
  reference throws) and changes nothing. CREATE of an existing path is a
  no-op (no quota charge). DELETE frees its live subtree count. RENAME
  moves its subtree's count from the source's ancestors to the
  destination's (verifyQuota's rename variant): it is rejected only if a
  quota'd directory GAINS entries beyond its quota (a move within the same
  quota subtree is free, as in the reference); renames of empty sources or
  onto occupied destinations are no-ops (HDFS rename requires a
  non-existing destination).
- ds (byte) quota is NOT modeled: the changelog projection carries no
  block-size payload (entities edits schema), so there is nothing to sum.
  Documented delegation, not an approximation.

Subtree counts are maintained exactly through the fold with containment
algebra over the TRACKED path set (quota dirs + batch op paths + rename
compositions, closed to a bounded depth): a rename landing entries inside
a tracked directory reads the pre-move count of the composed source path
(``src + (x - dst)``), which is itself tracked. Composition closure runs 3
passes — enough for rename chains of depth 3 within one batch; deeper
chains fall back to a conservative 0 (under-count, accept-biased) and are
excluded from the property-test generator.

Property-tested against a sequential interpreter that replays the same ops
over explicit path SETS (tests/test_quota_property.py): same rejected
txids, same final namespace.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .replay import apply_edits_batch

_CREATE_OPS = ("OP_ADD", "OP_MKDIR", "OP_SYMLINK")


def _within(x: str, p: str) -> bool:
    """p lies within x's subtree (p == x or p under x/)."""
    return p == x or p.startswith(x + "/")


@dataclass(frozen=True)
class QuotaRejection:
    txid: int
    op: str
    path: str
    quota_dir: str
    ns_quota: int
    used: int  # live entries within quota_dir when the op was refused


def _tracked_paths(
    quotas: dict[str, int], ops: list[dict]
) -> set[str]:
    t = set(quotas)
    for o in ops:
        t.add(o["path"])
        if o.get("dst"):
            t.add(o["dst"])
    # composition closure: a rename landing inside tracked x needs the
    # composed source path's count; 3 passes bound chained renames
    renames = [(o["path"], o["dst"]) for o in ops if o["op"] == "OP_RENAME" and o.get("dst")]
    for _ in range(3):
        new = set()
        for s, d in renames:
            for x in t:
                if _within(d, x):
                    new.add(s + x[len(d):])
        if new <= t:
            break
        t |= new
    return t


def _initial_counts(
    state: DataFrame, tracked: set[str]
) -> tuple[dict[str, int], dict[str, bool]]:
    """One distributed pass: for every tracked path, the count of existing
    state entries within its subtree, and whether the exact path exists.
    Broadcast the (bounded) tracked set against the (large) state frame —
    the A1 ancestor-explosion shape with the dimension side pre-known."""
    spark = state.sparkSession
    if not tracked:
        return {}, {}
    tdf = spark.createDataFrame([(t,) for t in sorted(tracked)], "t string")
    live = state.filter(F.coalesce("exists", F.lit(False)))
    joined = live.join(
        F.broadcast(tdf),
        (F.col("path") == F.col("t"))
        | F.col("path").startswith(F.concat("t", F.lit("/"))),
    )
    counts = {
        r["t"]: r["n"]
        for r in joined.groupBy("t")
        .agg(
            F.count("*").alias("n"),
            F.max(F.col("path") == F.col("t")).alias("self_exists"),
        )
        .collect()
    }
    exact = {
        r["t"]: bool(r["e"])
        for r in F.broadcast(tdf)
        .join(live.select(F.col("path").alias("t")), "t", "left_semi")
        .select("t", F.lit(True).alias("e"))
        .collect()
    }
    init_count = {t: counts.get(t, 0) for t in tracked}
    init_exists = {t: exact.get(t, False) for t in tracked}
    return init_count, init_exists


def verify_quota_batch(
    state: DataFrame, batch: DataFrame, quotas: dict[str, int]
) -> list[QuotaRejection]:
    """The driver fold: replay the batch's mutation ops in txid order over
    subtree counters seeded from ``state``, refusing quota-overflowing
    creates/renames. Returns the rejections (empty list = all ops fit)."""
    ops = [
        r.asDict()
        for r in batch.filter(
            F.col("op").isin(*_CREATE_OPS, "OP_DELETE", "OP_RENAME")
        )
        .select("txid", "op", "path", "dst")
        .orderBy("txid")
        .collect()
    ]
    tracked = _tracked_paths(quotas, ops)
    live, exists = _initial_counts(state, tracked)
    rejections: list[QuotaRejection] = []

    def compose(s: str, d: str, x: str) -> str:
        return s + x[len(d):]

    for o in ops:
        op, p, dst, txid = o["op"], o["path"], o.get("dst"), o["txid"]
        if op in _CREATE_OPS:
            if exists.get(p, False):
                continue  # already present: no new entry, no charge
            violated = [
                x
                for x, q in quotas.items()
                if _within(x, p) and live[x] + 1 > q
            ]
            if violated:
                deepest = max(violated, key=len)
                rejections.append(
                    QuotaRejection(
                        txid, op, p, deepest, quotas[deepest], live[deepest]
                    )
                )
                continue
            for x in tracked:
                if _within(x, p):
                    live[x] += 1
            exists[p] = True
        elif op == "OP_DELETE":
            r = live.get(p, 0)
            if r == 0:
                continue
            pre = dict(live)
            for x in tracked:
                if _within(x, p):
                    live[x] = pre[x] - r
                elif _within(p, x):
                    live[x] = 0
            for x in tracked:
                if _within(p, x):
                    exists[x] = False
        elif op == "OP_RENAME" and dst:
            s_cnt = live.get(p, 0)
            if s_cnt == 0 or live.get(dst, 0) > 0:
                continue  # empty source / occupied destination: no-op
            violated = [
                x
                for x, q in quotas.items()
                if _within(x, dst)
                and not _within(x, p)
                and live[x] + s_cnt > q
            ]
            if violated:
                deepest = max(violated, key=len)
                rejections.append(
                    QuotaRejection(
                        txid, op, p, deepest, quotas[deepest], live[deepest]
                    )
                )
                continue
            pre_live, pre_exists = dict(live), dict(exists)
            for x in tracked:
                in_s, in_d = _within(x, p), _within(x, dst)
                if in_s and in_d:
                    continue
                if in_s:
                    live[x] = pre_live[x] - s_cnt
                elif in_d:
                    live[x] = pre_live[x] + s_cnt
                elif _within(p, x):
                    live[x] = 0
                elif _within(dst, x):
                    c = compose(p, dst, x)
                    live[x] = pre_live.get(c, 0)
            for x in tracked:
                if _within(p, x):
                    exists[x] = False
                elif _within(dst, x):
                    exists[x] = pre_exists.get(compose(p, dst, x), False)
    return rejections


def apply_edits_batch_enforcing(
    state: DataFrame, batch: DataFrame, quotas: dict[str, int]
) -> tuple[DataFrame, list[QuotaRejection]]:
    """``apply_edits_batch`` with quota enforcement: verify, withhold the
    rejected ops (anti-join on txid), merge the rest. Returns
    (new_state, rejections) — callers log the rejections where the
    reference would have thrown QuotaExceededException."""
    rejections = verify_quota_batch(state, batch, quotas)
    if rejections:
        spark = batch.sparkSession
        rej = spark.createDataFrame(
            [(r.txid,) for r in rejections], "txid long"
        )
        batch = batch.join(F.broadcast(rej), "txid", "left_anti")
    return apply_edits_batch(state, batch), rejections
