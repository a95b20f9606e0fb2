"""A faithful no-Spark emulation of the applyInPandasWithState contract,
shared by the randomized monitor differentials (test_token_monitor_property,
test_lease_monitor_property).

Contract points emulated, matching Structured Streaming's event-time
timeout semantics:

- one state cell per group key, surviving across micro-batches;
- the timeout is RESET on every invocation — it survives only if the
  function sets it again (GroupState.setTimeoutTimestamp docs);
- an event-time timeout fires when the watermark entering a batch is
  STRICTLY past the pinned timestamp, delivered with an empty row
  iterator and ``hasTimedOut=True`` — but only to groups that receive no
  data in that batch (data delivery wins);
- the watermark entering batch k is the max event time of batches < k
  (delay 0, the gates' ``withWatermark(ts, '0 seconds')``), and a final
  sentinel advance to the horizon fires the remaining timeouts — exactly
  what the windowed staging + availableNow drain does;
- ``getCurrentWatermarkMs`` returns the watermark of the firing batch.
"""

from __future__ import annotations

import pandas as pd


class FakeGroupState:
    """The slice of the GroupState API the monitors touch."""

    def __init__(self):
        self._value = None
        self._timeout = None
        self._timed_out = False
        self._wm = None
        self._removed = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    @property
    def hasTimedOut(self):
        return self._timed_out

    def update(self, value):
        self._value = tuple(value)
        self._removed = False

    def remove(self):
        self._value = None
        self._timeout = None
        self._removed = True

    def setTimeoutTimestamp(self, ts_ms):
        # Fidelity with pyspark.sql.streaming.state.GroupState: a
        # non-positive timestamp raises VALUE_NOT_POSITIVE, and a
        # timestamp strictly below the current watermark raises
        # INVALID_TIMEOUT_TIMESTAMP. Enforcing both here means a passing
        # differential ALSO proves the monitor can never crash the real
        # stream with a stale or degenerate pin, however the batches
        # slice.
        ts_ms = int(ts_ms)
        if ts_ms <= 0:
            raise ValueError(f"timeout timestamp must be positive: {ts_ms}")
        if self._wm is not None and ts_ms < self._wm:
            raise ValueError(
                f"timeout timestamp {ts_ms} below watermark {self._wm}"
            )
        self._timeout = ts_ms

    def getCurrentWatermarkMs(self):
        return self._wm if self._wm is not None else 0


def drive_monitor(monitor, windows, horizon, key_cols, ts_col):
    """Replay windowed batches through ``monitor`` exactly as the staged
    availableNow drain does; returns the concatenated emitted frame (or
    None if nothing was emitted). ``windows`` must be time-ordered and
    time-partitioned (all events of window k precede window k+1 — the
    write_windowed_stage layout)."""
    states: dict[tuple, FakeGroupState] = {}
    out: list[pd.DataFrame] = []
    wm = None

    def invoke(key, pdfs, timed_out):
        st = states.setdefault(key, FakeGroupState())
        st._timed_out = timed_out
        st._timeout = None  # per-invocation reset; monitor must re-pin
        st._wm = wm
        for pdf in monitor(key, iter(pdfs), st):
            out.append(pdf)
        if st._removed or st._value is None:
            states.pop(key, None)

    def fire_timeouts(batch_keys):
        for key, st in list(states.items()):
            if (
                st._timeout is not None
                and key not in batch_keys
                and wm is not None
                and wm > st._timeout
            ):
                invoke(key, [], True)

    for win in windows:
        by_key = {
            (k if isinstance(k, tuple) else (k,)): grp.reset_index(drop=True)
            for k, grp in win.groupby(list(key_cols))
        }
        fire_timeouts(set(by_key))
        for key, pdf in by_key.items():
            invoke(key, [pdf], False)
        hi = int(win[ts_col].max())
        wm = hi if wm is None else max(wm, hi)
    wm = horizon if wm is None else max(wm, horizon)
    fire_timeouts(set())
    if not out:
        return None
    return pd.concat(out, ignore_index=True)
