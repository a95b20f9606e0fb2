"""T3/T4/T7: heartbeat liveness, lease expiry, and pending-work timeout as
stateful streaming computations (SURVEY.md §2.8).

The reference runs monitor threads that scan sorted maps on an interval
(FSNamesystem.heartbeatCheck:3247-3296 — dead after 10.5 min;
LeaseManager.Monitor:365-411 — soft 60 s / hard 3600 s;
PendingReplicationBlocks.java:48 + PendingReplicationMonitor:178-195 —
re-queue unconfirmed replication work after 5 min). The Spark-first
restatement is ``applyInPandasWithState`` keyed by the monitored entity,
with processing-time timeouts standing in for the monitor threads: state
holds the last-seen timestamp, a timeout firing emits the EXPIRED record.

These are the engine's only non-SQL-expressible operators (driver records
rows-only checks); the batch analogs (f4_datanode_report, t4_lease_expiry,
t7_pending_timeout) carry the oracle-verified semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..entities import (  # single source of truth for the monitor limits
    HEARTBEAT_EXPIRY_MS,  # 2 * 5 min recheck + 10 * 3 s heartbeat
    LEASE_HARD_MS,
    LEASE_SOFT_MS,
)

LIVENESS_OUTPUT = StructType(
    [
        StructField("datanode_id", StringType(), False),
        StructField("last_heartbeat_ms", LongType(), True),
        StructField("is_dead", BooleanType(), False),
    ]
)

LIVENESS_STATE = StructType([StructField("last_heartbeat_ms", LongType(), True)])


def make_heartbeat_monitor(timeout_ms: int = HEARTBEAT_EXPIRY_MS):
    def monitor(key, rows, state):
        yield from heartbeat_monitor(key, rows, state, timeout_ms)

    return monitor


def heartbeat_monitor(
    key: tuple[str],
    rows: Iterator[pd.DataFrame],
    state: GroupState,
    timeout_ms: int = HEARTBEAT_EXPIRY_MS,
) -> Iterator[pd.DataFrame]:
    """T3 heartbeat tracker: one state cell per datanode holding the latest
    heartbeat; a processing-time timeout marks the node dead — the
    heartbeatCheck monitor without the thread."""
    (datanode_id,) = key
    if state.hasTimedOut:
        (last,) = state.get if state.exists else (None,)
        state.remove()
        yield pd.DataFrame(
            {"datanode_id": [datanode_id], "last_heartbeat_ms": [last], "is_dead": [True]}
        )
        return
    latest: int | None = state.get[0] if state.exists else None
    for pdf in rows:
        m = int(pdf["heartbeat_ms"].max())
        latest = m if latest is None else max(latest, m)
    state.update((latest,))
    state.setTimeoutDuration(timeout_ms)
    yield pd.DataFrame(
        {"datanode_id": [datanode_id], "last_heartbeat_ms": [latest], "is_dead": [False]}
    )


def heartbeat_liveness_stream(heartbeats, timeout_ms: int = HEARTBEAT_EXPIRY_MS):
    """Wire the T3 monitor over a streaming (datanode_id, heartbeat_ms)
    frame. Returns the stateful DataFrame; caller attaches the sink.
    ``timeout_ms`` is the dead-node threshold (tests shrink it)."""
    return heartbeats.groupBy("datanode_id").applyInPandasWithState(
        make_heartbeat_monitor(timeout_ms),
        outputStructType=LIVENESS_OUTPUT,
        stateStructType=LIVENESS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def make_heartbeat_event_monitor(timeout_ms: int = HEARTBEAT_EXPIRY_MS):
    """T3 monitor with EVENT-time expiry (the t22 gate's certifiable
    form): pings update the per-node latest and pin the timeout at
    latest + timeout_ms; the ONLY emission is the dead declaration when
    the watermark passes that pin — the heartbeatCheck removal
    (FSNamesystem.heartbeatCheck:3247-3296) as data, with no per-batch
    alive chatter so the drained sink is exactly the removed set."""

    def monitor(key, rows, state):
        (datanode_id,) = key
        if state.hasTimedOut:
            (last,) = state.get if state.exists else (None,)
            state.remove()
            yield pd.DataFrame(
                {
                    "datanode_id": [datanode_id],
                    "last_heartbeat_ms": [last],
                    "is_dead": [True],
                }
            )
            return
        latest: int | None = state.get[0] if state.exists else None
        for pdf in rows:
            m = int(pdf["ping_ms"].max())
            latest = m if latest is None else max(latest, m)
        state.update((latest,))
        state.setTimeoutTimestamp(latest + timeout_ms)
        yield from ()

    return monitor


def heartbeat_event_stream(pings, timeout_ms: int = HEARTBEAT_EXPIRY_MS):
    """Wire the event-time T3 monitor over a watermarked streaming
    (datanode_id, ping_ms, ts) frame; emits one row per dead node."""
    return pings.groupBy("datanode_id").applyInPandasWithState(
        make_heartbeat_event_monitor(timeout_ms),
        outputStructType=LIVENESS_OUTPUT,
        stateStructType=LIVENESS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


LEASE_OUTPUT = StructType(
    [
        StructField("holder", StringType(), False),
        StructField("last_renewed_ms", LongType(), True),
        StructField("expired", BooleanType(), False),
    ]
)

LEASE_STATE = StructType([StructField("last_renewed_ms", LongType(), True)])


def lease_monitor(
    key: tuple[str], rows: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """T4 lease tracker keyed by holder: renewals refresh state; the
    hard-limit timeout releases the lease (oldest-first ordering falls out
    of per-key timeout scheduling)."""
    (holder,) = key
    if state.hasTimedOut:
        (last,) = state.get if state.exists else (None,)
        state.remove()
        yield pd.DataFrame(
            {"holder": [holder], "last_renewed_ms": [last], "expired": [True]}
        )
        return
    latest: int | None = state.get[0] if state.exists else None
    for pdf in rows:
        m = int(pdf["renewed_ms"].max())
        latest = m if latest is None else max(latest, m)
    state.update((latest,))
    state.setTimeoutDuration(LEASE_HARD_MS)
    yield pd.DataFrame(
        {"holder": [holder], "last_renewed_ms": [latest], "expired": [False]}
    )


def lease_expiry_stream(renewals):
    return renewals.groupBy("holder").applyInPandasWithState(
        lease_monitor,
        outputStructType=LEASE_OUTPUT,
        stateStructType=LEASE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


LEASE_EVENT_OUTPUT = StructType(
    [
        StructField("holder", StringType(), False),
        StructField("path", StringType(), False),
        StructField("last_renewed_ms", LongType(), True),
        StructField("phase", StringType(), False),
    ]
)

LEASE_EVENT_STATE = StructType(
    [
        StructField("last_renewed_ms", LongType(), True),
        StructField("soft_fired", BooleanType(), False),
    ]
)


def make_lease_event_monitor(
    soft_ms: int = LEASE_SOFT_MS, hard_ms: int = LEASE_HARD_MS
):
    """T4 monitor with EVENT-time expiry and the reference's TWO-PHASE
    ladder (the t23 gate's certifiable form), keyed per (holder, path):

    - renewals refresh the state cell and pin the timeout at
      last + soft_ms (``Lease.renew``: lastUpdate := now,
      LeaseManager.java:211-213);
    - when the WATERMARK passes the soft pin the lease becomes
      preemptable — another client's startFile may force recovery
      (``Lease.expiredSoftLimit`` :221-223, checked by
      ``FSNamesystem.recoverLeaseInternal``:1569-1576) — emitted as
      phase='soft_preemptable', state retained, timeout RE-PINNED at
      last + hard_ms (the ladder's second rung);
    - when the watermark passes the hard pin the Monitor force-releases
      (``Lease.expiredHardLimit`` :216-218 via ``checkLeases``:365-411)
      — emitted as phase='hard_released', state evicted.

    A single firing emits every rung the current watermark has already
    crossed (both phases at once when the final watermark is past the
    hard pin), so the drained sink is a pure function of the data no
    matter how the micro-batches sliced the stream.
    """

    def monitor(key, rows, state):
        holder, path = key
        if state.hasTimedOut:
            last, soft_fired = state.get if state.exists else (None, False)
            wm = state.getCurrentWatermarkMs()
            phases = []
            if not soft_fired and wm > last + soft_ms:
                phases.append("soft_preemptable")
            if wm > last + hard_ms:
                phases.append("hard_released")
                state.remove()
            else:
                state.update((last, True))
                state.setTimeoutTimestamp(last + hard_ms)
            if phases:
                yield pd.DataFrame(
                    {
                        "holder": [holder] * len(phases),
                        "path": [path] * len(phases),
                        "last_renewed_ms": [last] * len(phases),
                        "phase": phases,
                    }
                )
            return
        last, soft_fired = state.get if state.exists else (None, False)
        for pdf in rows:
            m = int(pdf["renewed_ms"].max())
            last = m if last is None else max(last, m)
        state.update((last, False))  # a renewal resets the ladder
        state.setTimeoutTimestamp(last + soft_ms)
        yield from ()

    return monitor


def lease_event_stream(
    renewals, soft_ms: int = LEASE_SOFT_MS, hard_ms: int = LEASE_HARD_MS
):
    """Wire the event-time T4 monitor over a watermarked streaming
    (holder, path, renewed_ms, ts) frame; emits one row per threshold
    crossing (soft_preemptable, then hard_released)."""
    return renewals.groupBy("holder", "path").applyInPandasWithState(
        make_lease_event_monitor(soft_ms, hard_ms),
        outputStructType=LEASE_EVENT_OUTPUT,
        stateStructType=LEASE_EVENT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


PENDING_TIMEOUT_MS = 300_000  # PendingReplicationBlocks.java:48 — 5 min

PENDING_OUTPUT = StructType(
    [
        StructField("block_id", LongType(), False),
        StructField("dispatched_ms", LongType(), True),
        StructField("replicas_in_flight", LongType(), False),
        StructField("timed_out", BooleanType(), False),
    ]
)

PENDING_STATE = StructType(
    [
        StructField("dispatched_ms", LongType(), True),
        StructField("replicas_in_flight", LongType(), False),
    ]
)


def make_pending_replication_monitor(
    timeout_ms: int = PENDING_TIMEOUT_MS, event_time: bool = False
):
    def monitor(key, rows, state):
        yield from pending_replication_monitor(
            key, rows, state, timeout_ms, event_time
        )

    return monitor


def pending_replication_monitor(
    key: tuple[int],
    rows: Iterator[pd.DataFrame],
    state: GroupState,
    timeout_ms: int = PENDING_TIMEOUT_MS,
    event_time: bool = False,
) -> Iterator[pd.DataFrame]:
    """T7 pending-replication tracker keyed by block
    (PendingReplicationBlocks.java:38-55 + PendingReplicationMonitor
    :178-195): a ``dispatch`` event adds in-flight replicas and stamps the
    dispatch time; a ``confirm`` event (the new replica's blockReceived)
    decrements, removing the entry at zero; the processing-time timeout
    firing re-emits the entry with ``timed_out=True`` — the reference's
    timedOutItems hand-off that re-queues the block into
    neededReplications (T6).

    ``event_time=True`` switches the monitor to EVENT-time expiry: the
    timeout is pinned at dispatched_ms + timeout_ms and fires when the
    WATERMARK passes it — deterministic given the data, which is what lets
    the t21 gate (streaming/pending.py) hash-match the monitor's full
    emission relation against a closed-form SQL oracle. The caller must
    wire ``GroupStateTimeout.EventTimeTimeout`` and a watermark.

    Late-arrival branch (event-time only): when a block's events land in
    a batch ENTERED with the watermark already past its pin — a late
    blockReceived or re-dispatch, data delivery winning over the
    same-batch timeout — the deadline passed before those events were
    logged, so the timed-out row is emitted FIRST and the batch folds
    against a fresh map (the reference's remover moved the entry to
    timedOutItems; late confirms decrement nothing —
    PendingReplicationBlocks.remove:87-99 on an absent entry). Without
    this branch the fold would re-pin ``dispatched + timeout`` BELOW the
    watermark, which GroupState.setTimeoutTimestamp rejects — a late
    confirm would crash the production stream (found by the randomized
    differential, tests/test_pending_monitor_property.py)."""
    (block_id,) = key
    if state.hasTimedOut:
        ts, n = state.get if state.exists else (None, 0)
        state.remove()
        yield pd.DataFrame(
            {
                "block_id": [block_id],
                "dispatched_ms": [ts],
                "replicas_in_flight": [n],
                "timed_out": [True],
            }
        )
        return
    ts, n = state.get if state.exists else (None, 0)
    if (
        event_time
        and state.exists
        and state.getCurrentWatermarkMs() > ts + timeout_ms
    ):
        state.remove()
        yield pd.DataFrame(
            {
                "block_id": [block_id],
                "dispatched_ms": [ts],
                "replicas_in_flight": [n],
                "timed_out": [True],
            }
        )
        ts, n = None, 0
    for pdf in rows:
        for ev, ev_ms, inc in zip(
            pdf["event"], pdf["event_ms"], pdf["n_replicas"]
        ):
            if ev == "dispatch":
                n += int(inc)
                ts = int(ev_ms) if ts is None else max(ts, int(ev_ms))
            elif ev == "confirm":
                n -= int(inc)
    if n <= 0:
        # all in-flight replicas confirmed — entry leaves the pending map
        if state.exists:
            state.remove()
        yield pd.DataFrame(
            {
                "block_id": [block_id],
                "dispatched_ms": [ts],
                "replicas_in_flight": [0],
                "timed_out": [False],
            }
        )
        return
    state.update((ts, n))
    if event_time:
        state.setTimeoutTimestamp(ts + timeout_ms)
    else:
        state.setTimeoutDuration(timeout_ms)
    yield pd.DataFrame(
        {
            "block_id": [block_id],
            "dispatched_ms": [ts],
            "replicas_in_flight": [n],
            "timed_out": [False],
        }
    )


def pending_replication_stream(events, timeout_ms: int = PENDING_TIMEOUT_MS):
    """Wire the T7 monitor over a streaming (block_id, event, event_ms,
    n_replicas) frame, where ``event`` is 'dispatch' or 'confirm'. Returns
    the stateful DataFrame; caller attaches the sink. ``timeout_ms`` is
    the re-queue threshold (tests shrink it). State is bounded by the
    in-flight work set — confirms and timeouts both evict."""
    return events.groupBy("block_id").applyInPandasWithState(
        make_pending_replication_monitor(timeout_ms),
        outputStructType=PENDING_OUTPUT,
        stateStructType=PENDING_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def pending_replication_event_stream(events, timeout_ms: int):
    """T7 monitor with EVENT-time expiry: ``events`` must already carry a
    watermarked event-time column (the t21 gate watermarks ``ts`` derived
    from event_ms with 0s delay). The timeout pins at dispatched_ms +
    timeout_ms and fires when the watermark passes it — the deterministic
    form of the 5-min re-queue, gate-matched against a SQL oracle."""
    return events.groupBy("block_id").applyInPandasWithState(
        make_pending_replication_monitor(timeout_ms, event_time=True),
        outputStructType=PENDING_OUTPUT,
        stateStructType=PENDING_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- T25's monitor form: delegation-token expiry (the ExpiredTokenRemover
# thread of AbstractDelegationTokenSecretManager, run by the NN's
# DelegationTokenSecretManager; FSEditLog persists exactly the op stream
# this monitor folds, FSEditLogLoader.java:404-430) ---

TOKEN_OUTPUT = StructType(
    [
        StructField("token_seq", LongType(), False),
        StructField("owner", StringType(), True),
        StructField("status", StringType(), False),
        StructField("death_ms", LongType(), True),
        StructField("n_valid_renewals", LongType(), False),
    ]
)

TOKEN_STATE = StructType(
    [
        StructField("owner", StringType(), True),
        StructField("max_ms", LongType(), True),
        StructField("cur_expiry_ms", LongType(), True),
        StructField("n_renewals", LongType(), True),
        StructField("dead", BooleanType(), True),
    ]
)

_TOKEN_GET = "OP_GET_DELEGATION_TOKEN"
_TOKEN_RENEW = "OP_RENEW_DELEGATION_TOKEN"
_TOKEN_CANCEL = "OP_CANCEL_DELEGATION_TOKEN"


def make_token_expiry_monitor():
    """Delegation-token expiry with SEQUENTIAL authority, keyed per token
    (the t26 gate's certifiable form). Unlike the t25 batch fold — which
    reads the whole log and takes min(maxDate, last renewal) — this is
    the secret manager's actual timeline: a renewal or cancel is only
    valid while the token is LIVE (``renewToken``/``cancelToken`` on a
    removed token throw InvalidToken), and the ExpiredTokenRemover
    removes the token the moment its current expiry passes.

    - the issue op creates the state cell (owner, maxDate) and pins the
      EVENT-time timeout at min(maxDate, expiryTime);
    - a renewal that arrives at ts <= current expiry re-pins at
      min(maxDate, its new expiryTime) — renewToken's cap;
    - a valid cancel emits status='cancelled' at its ts and tombstones;
    - the WATERMARK passing the pin (or any op arriving already past it)
      emits status='expired' at the pinned expiry and tombstones; later
      ops against a tombstone are the InvalidToken no-ops.

    Emission is exactly-once per dead token and a pure function of the
    data under the time-ordered windowed replay: an event at ts <= the
    current pin cannot be outrun by the watermark, because the watermark
    entering its batch is bounded by earlier windows' times (< ts).
    Still-live tokens at stream end emit nothing — the output is the
    remover's removal log."""

    def monitor(key, rows, state):
        (token_seq,) = key
        if token_seq is None or token_seq < 0:
            for _ in rows:  # watermark sentinel: consume, keep no state
                pass
            yield from ()
            return
        if state.hasTimedOut:
            owner, max_ms, cur_e, n_ren, dead = state.get
            if not dead:
                state.update((owner, max_ms, cur_e, n_ren, True))
                yield pd.DataFrame(
                    {
                        "token_seq": [token_seq],
                        "owner": [owner],
                        "status": ["expired"],
                        "death_ms": [cur_e],
                        "n_valid_renewals": [n_ren],
                    }
                )
            return
        owner, max_ms, cur_e, n_ren, dead = (
            state.get if state.exists else (None, None, None, 0, False)
        )
        evs = pd.concat(list(rows)).sort_values("ts_ms")  # order-sensitive fold
        emitted: list[tuple[str, int]] = []
        for op, ts, exp, mx, ow in zip(
            evs["op"], evs["ts_ms"], evs["expiry_ms"], evs["max_ms"], evs["owner"]
        ):
            if dead:
                break  # ops against a removed token: InvalidToken no-ops
            ts = int(ts)
            if cur_e is None:
                if op == _TOKEN_GET:
                    owner, max_ms = ow, int(mx)
                    cur_e = min(max_ms, int(exp))
                continue
            if ts > cur_e:
                # the token expired before this op was logged — the remover
                # beat it; emit the expiry, the op itself is invalid
                emitted.append(("expired", cur_e))
                dead = True
                break
            if op == _TOKEN_RENEW:
                cur_e = min(max_ms, int(exp))
                n_ren += 1
            elif op == _TOKEN_CANCEL:
                emitted.append(("cancelled", ts))
                dead = True
                break
        state.update((owner, max_ms, cur_e, n_ren, dead))
        if not dead and cur_e is not None:
            state.setTimeoutTimestamp(cur_e)
        if emitted:
            yield pd.DataFrame(
                {
                    "token_seq": [token_seq] * len(emitted),
                    "owner": [owner] * len(emitted),
                    "status": [s for s, _ in emitted],
                    "death_ms": [d for _, d in emitted],
                    "n_valid_renewals": [n_ren] * len(emitted),
                }
            )

    return monitor


def token_expiry_event_stream(events):
    """Wire the token monitor over a watermarked streaming
    (token_seq, op, ts_ms, expiry_ms, max_ms, owner, ts) frame; emits one
    row per token death (expired or cancelled)."""
    return events.groupBy("token_seq").applyInPandasWithState(
        make_token_expiry_monitor(),
        outputStructType=TOKEN_OUTPUT,
        stateStructType=TOKEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
