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
compositions, closed transitively): a rename landing entries inside a
tracked directory reads the pre-move count of the composed source path
(``src + (x - dst)``), which is itself tracked. The composition closure
is TIME-CONSISTENT: renames are walked once in descending txid order, so
each composed path is closed only through strictly earlier renames — the
exact set the fold consults, finite by construction (a naive unordered
fixpoint diverges on valid two-rename ping-pongs). A pathological batch
that still explodes the tracked set raises loudly (no silent under-count).

Property-tested against a sequential interpreter that replays the same ops
over explicit path SETS (tests/test_quota_property.py): same rejected
txids, same final namespace.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import register
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
    # Composition closure, TIME-CONSISTENT (ADVICE r4 — the old fixed
    # 3 passes silently under-counted deeper chains, and a naive fixpoint
    # over the unordered rename list genuinely diverges on valid inputs:
    # two renames can ping-pong compositions forever). The fold only ever
    # needs a composed path's count at times BEFORE the rename that
    # composed it, so walk the renames ONCE in DESCENDING txid order:
    # when rename (s, d) is processed, the set already holds every path
    # whose count must be correct at any later time, and each addition
    # (s + x[len(d):]) only needs correctness at strictly earlier times —
    # handled by the remaining (earlier) renames. One pass, exact, and
    # terminating by construction.
    renames = sorted(
        (o["txid"], o["path"], o["dst"])
        for o in ops
        if o["op"] == "OP_RENAME" and o.get("dst")
    )
    limit = max(10_000, 100 * len(t))
    for _, s, d in reversed(renames):
        t |= {s + x[len(d):] for x in t if _within(d, x)}
        if len(t) > limit:
            # Per-dst growth is geometric only for pathologically nested
            # rename stacks; refuse loudly rather than degrade silently.
            raise ValueError(
                "quota verification degraded: rename pre-image closure "
                f"exceeded {limit} tracked paths for a {len(renames)}-rename "
                "batch — split the segment or reduce maxFilesPerTrigger"
            )
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

    # Index structures keep the fold near-linear in |ops| (a naive
    # every-tracked-path sweep per op is O(ops x tracked) — quadratic in a
    # segment where most op paths are distinct):
    # - containment of a path WITHIN tracked x  <=>  x is an ancestor
    #   prefix of the path — O(depth) dict probes;
    # - tracked paths WITHIN a subtree p — a bisect range scan over the
    #   sorted tracked list ([p+"/", p+"0") plus p itself; "0" = "/"+1).
    import bisect

    tracked_sorted = sorted(tracked)

    def ancestors_in_tracked(p: str) -> list[str]:
        out = []
        if p in tracked:
            out.append(p)
        i = p.find("/", 1)
        while i != -1:
            a = p[:i]
            if a in tracked:
                out.append(a)
            i = p.find("/", i + 1)
        return out

    def tracked_within(p: str) -> list[str]:
        lo = bisect.bisect_left(tracked_sorted, p + "/")
        hi = bisect.bisect_left(tracked_sorted, p + "0")
        out = tracked_sorted[lo:hi]
        if p in tracked:
            out.append(p)
        return out

    def compose(s: str, d: str, x: str) -> str:
        return s + x[len(d):]

    for o in ops:
        op, p, dst, txid = o["op"], o["path"], o.get("dst"), o["txid"]
        if op in _CREATE_OPS:
            if exists.get(p, False):
                continue  # already present: no new entry, no charge
            anc = ancestors_in_tracked(p)
            violated = [x for x in anc if x in quotas and live[x] + 1 > quotas[x]]
            if violated:
                deepest = max(violated, key=len)
                rejections.append(
                    QuotaRejection(
                        txid, op, p, deepest, quotas[deepest], live[deepest]
                    )
                )
                continue
            for x in anc:
                live[x] += 1
            exists[p] = True
        elif op == "OP_DELETE":
            r = live.get(p, 0)
            if r == 0:
                continue
            for x in ancestors_in_tracked(p):
                live[x] -= r
            for x in tracked_within(p):
                if x != p:
                    live[x] = 0
                exists[x] = False
            live[p] = 0
            if p in exists:
                exists[p] = False
        elif op == "OP_RENAME" and dst:
            s_cnt = live.get(p, 0)
            if s_cnt == 0 or live.get(dst, 0) > 0:
                continue  # empty source / occupied destination: no-op
            anc_s = set(ancestors_in_tracked(p))
            anc_d = set(ancestors_in_tracked(dst))
            violated = [
                x
                for x in anc_d - anc_s
                if x in quotas and live[x] + s_cnt > quotas[x]
            ]
            if violated:
                deepest = max(violated, key=len)
                rejections.append(
                    QuotaRejection(
                        txid, op, p, deepest, quotas[deepest], live[deepest]
                    )
                )
                continue
            in_src = tracked_within(p)  # includes p itself when tracked
            pre_live = {x: live.get(x, 0) for x in in_src}
            pre_exists = {x: exists.get(x, False) for x in in_src}
            for x in anc_s - anc_d:
                live[x] -= s_cnt
            for x in anc_d - anc_s:
                live[x] += s_cnt
            for x in in_src:
                live[x] = 0
                exists[x] = False
            for x in tracked_within(dst):
                if x == dst:
                    continue  # handled by the ancestor delta (live[dst]+=S)
                c = compose(p, dst, x)
                live[x] = pre_live.get(c, live.get(c, 0))
                exists[x] = pre_exists.get(c, exists.get(c, False))
            if dst in tracked:
                exists[dst] = pre_exists.get(p, exists.get(p, False))
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


# ----------------------------------------------------------- driver gate
# t1b: the quota-enforcement semantics under the driver's hash oracle, not
# just pytest. Scope chosen to be EXACTLY SQL-expressible so the fold's
# sequential accept/reject logic gets hash-checked: a creates-only segment
# (one group-commit batch, txid <= _T1B_TXID_CAP) verified against
# DISJOINT per-user-directory quotas derived from the batch itself (every
# '/ev/u<k>' with k % 5 == 0 gets ns_quota = _T1B_QUOTA; the namespace
# state contributes nothing under /ev, so initial usage is zero). With
# disjoint dirs, creates-only and empty initial usage, the sequential
# semantics collapse to a closed form the oracle states with two windows:
# a create is rejected iff its path's FIRST occurrence ranks beyond the
# dir's capacity among first-occurrences (repeat creates of an ACCEPTED
# path are exists-no-ops; repeats of a rejected path re-check a dir that
# is full forever, since nothing frees space in a creates-only batch).

_T1B_QUOTA = 3
_T1B_TXID_CAP = 4096  # one segment — the group-commit batch boundary


@register(
    "t1b_quota_rejections",
    oracle=f"""
WITH qcr AS (
  SELECT txid, op, path, '/ev/' || split_part(path, '/', 3) AS quota_dir
  FROM edits
  WHERE op IN ('OP_ADD', 'OP_MKDIR', 'OP_SYMLINK')
    AND txid <= {_T1B_TXID_CAP}
    AND CAST(substr(split_part(path, '/', 3), 2) AS BIGINT) % 5 = 0
),
qfc AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY path ORDER BY txid) AS pn
  FROM qcr
),
qfirsts AS (
  SELECT path, ROW_NUMBER() OVER (PARTITION BY quota_dir ORDER BY txid) AS rk
  FROM qfc WHERE pn = 1
)
SELECT c.txid, c.op, c.path, c.quota_dir,
       CAST({_T1B_QUOTA} AS BIGINT) AS ns_quota,
       CAST({_T1B_QUOTA} AS BIGINT) AS used
FROM qcr c JOIN qfirsts f ON f.path = c.path
WHERE f.rk > {_T1B_QUOTA}
""",
    doc="Quota enforcement under the driver's hash gate "
    "(FSDirectory.verifyQuota:1564-1605 as the T1 replay applies it): run "
    "the REAL verify_quota_batch driver fold over one creates-only edit "
    "segment with per-user-directory namespace quotas and emit every "
    "rejection (txid, path, violated dir, quota, usage at refusal). The "
    "oracle restates the sequential accept/reject process in closed form "
    "— valid exactly because the gated scope has disjoint quota dirs, "
    "creates only, and zero initial usage, so 'rejected' == 'first "
    "occurrence ranks beyond capacity' — which makes this a genuine "
    "cross-engine check of the fold's ordering, repeat-create no-op, and "
    "capacity logic. Scale: initial usage counts are one distributed "
    "broadcast-join aggregation over the namespace; the sequential part "
    "folds one bounded segment (the reference loader is the same "
    "single-threaded loop); quota dirs are an admin-bounded set.",
)
def t1b_quota_rejections(e) -> DataFrame:
    from ..registry import eager_cache_thunk

    return eager_cache_thunk(e, "t1b_quota", lambda: _t1b_run(e))


def _t1b_run(e) -> DataFrame:
    spark = e["edits"].sparkSession
    batch = e["edits"].filter(
        F.col("op").isin(*_CREATE_OPS) & (F.col("txid") <= _T1B_TXID_CAP)
    )
    user_dir = F.concat(F.lit("/ev/"), F.split("path", "/").getItem(2))
    quota_rows = (
        batch.select(user_dir.alias("d"))
        .filter(
            F.expr("CAST(substr(split(d, '/')[2], 2) AS BIGINT) % 5 = 0")
        )
        .distinct()
        .collect()
    )
    quotas = {r["d"]: _T1B_QUOTA for r in quota_rows}
    state = e["inodes"].select("path", F.lit(True).alias("exists"))
    rejections = verify_quota_batch(state, batch, quotas)
    return spark.createDataFrame(
        [
            (r.txid, r.op, r.path, r.quota_dir, r.ns_quota, r.used)
            for r in rejections
        ],
        "txid long, op string, path string, quota_dir string,"
        " ns_quota long, used long",
    )
