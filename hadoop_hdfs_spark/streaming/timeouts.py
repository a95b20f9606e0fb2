"""T3/T4/T7: heartbeat liveness, lease expiry, and pending-work timeout as
stateful streaming computations (SURVEY.md §2.8).

The reference runs monitor threads that scan sorted maps on an interval
(FSNamesystem.heartbeatCheck:3243-3260 — dead after 10.5 min;
LeaseManager.Monitor:365-411 — soft 60 s / hard 3600 s;
PendingReplicationBlocks timeout 5 min). The Spark-first restatement is
``applyInPandasWithState`` keyed by the monitored entity, with
processing-time timeouts standing in for the monitor threads: state holds
the last-seen timestamp, a timeout firing emits the EXPIRED record.

These are the engine's only non-SQL-expressible operators (driver records
rows-only checks); the batch analogs (f4_datanode_report, t4_lease_expiry)
carry the oracle-verified semantics.
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

HEARTBEAT_EXPIRY_MS = 630_000  # 2 * 5 min recheck + 10 * 3 s heartbeat
LEASE_SOFT_MS = 60_000
LEASE_HARD_MS = 3_600_000

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
