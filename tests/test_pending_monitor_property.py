"""Randomized differential for the t21 pending-replication monitor
(event-time form).

Unlike t22/t23/t26, the pending monitor's emission is deliberately
slicing-DEPENDENT (one progress row per batch a block has events in —
the gate's oracle models the fixed staging), so the expected side here is
a per-window fold replaying PendingReplicationBlocks semantics
window-by-window under the same watermark rules the harness enforces:

- a batch's net effect per block is order-free (n is additive, the
  dispatch stamp is a max), applied against the carried state;
- n <= 0 after a batch: the entry leaves the pending map — a zero row is
  emitted and the state evicted (confirms for unknown blocks emit the
  ts-None zero row, the late-blockReceived no-op);
- otherwise a progress row is emitted and the timeout re-pinned at
  dispatched + timeout;
- the watermark passing the pin with no data for the block emits the
  timed_out row and evicts (timedOutItems hand-off);
- a block whose events arrive in a batch ENTERED with the watermark
  already past its pin expired FIRST: the timed-out row precedes the
  fold of those (late) events, which run against a fresh map — under the
  windowed staging every event of such a batch is later than the pin, so
  this ordering is exact, not approximate.

The last branch is the crash the differential originally caught: the
monitor re-pinned `dispatched + timeout` from the data branch even when
the watermark had already crossed it, which real GroupState rejects
(INVALID_TIMEOUT_TIMESTAMP) — a late confirm could kill the production
stream. The harness's fidelity checks (tests/state_harness.py) keep that
contract enforced here.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_hdfs_spark.streaming.timeouts import (
    make_pending_replication_monitor,
)

TIMEOUT = 100


@st.composite
def _repl_streams(draw):
    n_blocks = draw(st.integers(1, 5))
    n_events = draw(st.integers(1, 18))
    rows = []
    ts_list = sorted(
        draw(
            st.lists(
                st.integers(1, 300),
                min_size=n_events,
                max_size=n_events,
                unique=True,
            )
        )
    )
    for ts in ts_list:
        block = draw(st.integers(0, n_blocks - 1))
        if draw(st.booleans()):
            rows.append((block, "dispatch", ts, draw(st.integers(1, 3))))
        else:
            rows.append((block, "confirm", ts, draw(st.integers(1, 3))))
    ev = pd.DataFrame(
        rows, columns=["block_id", "event", "event_ms", "n_replicas"]
    ).astype({"block_id": "int64", "event_ms": "int64", "n_replicas": "int64"})
    horizon = int(ev["event_ms"].max()) + draw(st.integers(0, 2 * TIMEOUT))
    n_windows = draw(st.integers(1, min(5, len(ev))))
    cuts = (
        sorted(
            draw(
                st.lists(
                    st.integers(1, len(ev) - 1),
                    min_size=n_windows - 1,
                    max_size=n_windows - 1,
                    unique=True,
                )
            )
        )
        if len(ev) > 1
        else []
    )
    bounds = [0, *cuts, len(ev)]
    windows = [
        ev.iloc[a:b].reset_index(drop=True) for a, b in zip(bounds, bounds[1:])
    ]
    return windows, horizon


def _expected(windows, horizon):
    """Window-by-window fold of PendingReplicationBlocks under the
    event-time watermark rules; returns the ordered emission list."""
    state: dict[int, tuple[int | None, int]] = {}
    pins: dict[int, int] = {}
    out = []
    wm = None

    def fire(batch_blocks):
        for b in sorted(list(pins)):
            if b not in batch_blocks and wm is not None and wm > pins[b]:
                ts, n = state.pop(b)
                del pins[b]
                out.append((b, ts, n, True))

    for win in windows:
        blocks = set(win["block_id"])
        fire(blocks)
        for b in sorted(blocks):
            grp = win[win["block_id"] == b]
            ts, n = state.get(b, (None, 0))
            if b in pins and wm is not None and wm > pins[b]:
                # expired before this batch's (late) events were logged
                out.append((b, ts, n, True))
                state.pop(b, None)
                del pins[b]
                ts, n = None, 0
            d = grp[grp["event"] == "dispatch"]
            c = grp[grp["event"] == "confirm"]
            if len(d):
                m = int(d["event_ms"].max())
                ts = m if ts is None else max(ts, m)
                n += int(d["n_replicas"].sum())
            n -= int(c["n_replicas"].sum())
            if n <= 0:
                state.pop(b, None)
                pins.pop(b, None)
                out.append((b, ts, 0, False))
            else:
                state[b] = (ts, n)
                pins[b] = ts + TIMEOUT
                out.append((b, ts, n, False))
        hi = int(win["event_ms"].max())
        wm = hi if wm is None else max(wm, hi)
    wm = horizon if wm is None else max(wm, horizon)
    fire(set())
    return sorted(out, key=_row_key)


def _row_key(r):
    return (r[0], -1 if r[1] is None else r[1], r[2], r[3])


@settings(
    max_examples=150,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(_repl_streams())
def test_pending_monitor_matches_window_fold(stream):
    from state_harness import drive_monitor

    windows, horizon = stream
    got = drive_monitor(
        make_pending_replication_monitor(TIMEOUT, event_time=True),
        windows,
        horizon,
        key_cols=("block_id",),
        ts_col="event_ms",
    )
    got_rows = (
        []
        if got is None
        else sorted(
            (
                (
                    int(r.block_id),
                    None if pd.isna(r.dispatched_ms) else int(r.dispatched_ms),
                    int(r.replicas_in_flight),
                    bool(r.timed_out),
                )
                for r in got.itertuples()
            ),
            key=_row_key,
        )
    )
    assert got_rows == _expected(windows, horizon)
