"""Randomized differentials for the t23 lease-ladder monitor and the t22
heartbeat monitor (the two single-key event-time expiry shapes whose
emission is a pure function of the data under the gap contract).

`make_lease_event_monitor` (streaming/timeouts.py) is driven through the
shared no-Spark applyInPandasWithState harness (tests/state_harness.py)
and must agree, on arbitrary generated renewal series and window
slicings, with the closed-form reference semantics of LeaseManager:

- a lease is soft-preemptable iff NOW is strictly past its FINAL renewal
  + soft limit (Lease.expiredSoftLimit), emitted exactly once;
- it is hard-released iff NOW is strictly past final renewal + hard
  limit (Lease.expiredHardLimit via checkLeases), emitted exactly once
  after the soft rung;
- every emission carries the lease's FINAL last_renewed_ms — no
  mid-stream firing against a stale renewal can occur while renewals
  keep arriving, PROVIDED the renewal gap stays under the soft limit
  (the entity contract: renewals every soft/2; the module docstring's
  no-spurious-firing argument). The generator therefore draws gaps in
  [1, soft_ms - 1] — the domain t23 stages — but leaves series length,
  phase, lease interleavings and micro-batch boundaries to hypothesis.

The t23 gate certifies the drain end-to-end on the fixture; this test
covers the state-machine's input space: ladders that stop at the soft
rung, cross both rungs in one firing or two separate firings windows
apart, leases still live at NOW, and single-renewal leases.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_hdfs_spark.streaming.timeouts import make_lease_event_monitor

SOFT = 100
HARD = 700


@st.composite
def _renewal_streams(draw):
    n_leases = draw(st.integers(1, 6))
    rows = []
    for i in range(n_leases):
        holder = f"h{i % 3}"
        path = f"/f{i}"
        t = draw(st.integers(0, 200))
        rows.append((holder, path, t))
        for _ in range(draw(st.integers(0, 5))):
            t += draw(st.integers(1, SOFT - 1))  # the entity's gap contract
            rows.append((holder, path, t))
    renewals = (
        pd.DataFrame(rows, columns=["holder", "path", "renewed_ms"])
        .astype({"renewed_ms": "int64"})
        .sort_values(["renewed_ms", "holder", "path"], kind="mergesort")
        .reset_index(drop=True)
    )
    # NOW: anywhere from mid-stream (nothing fires) to far past every pin
    now = int(renewals["renewed_ms"].max()) + draw(st.integers(0, 2 * HARD))
    n_windows = draw(st.integers(1, min(5, len(renewals))))
    cuts = (
        sorted(
            draw(
                st.lists(
                    st.integers(1, len(renewals) - 1),
                    min_size=n_windows - 1,
                    max_size=n_windows - 1,
                    unique=True,
                )
            )
        )
        if len(renewals) > 1
        else []
    )
    # window boundaries must not split equal timestamps across batches
    # (the staged windows partition by TIME, so equal-ts rows share a
    # window); snap each cut forward past any tie run
    ts = renewals["renewed_ms"].tolist()
    snapped = []
    for c in cuts:
        while c < len(ts) and c > 0 and ts[c] == ts[c - 1]:
            c += 1
        if 0 < c < len(ts):
            snapped.append(c)
    bounds = sorted({0, *snapped, len(renewals)})
    windows = [
        renewals.iloc[a:b].reset_index(drop=True)
        for a, b in zip(bounds, bounds[1:])
    ]
    return renewals, windows, now


def _expected(renewals: pd.DataFrame, now: int):
    rows = set()
    last = renewals.groupby(["holder", "path"])["renewed_ms"].max()
    for (holder, path), lr in last.items():
        lr = int(lr)
        if now > lr + SOFT:
            rows.add((holder, path, lr, "soft_preemptable"))
        if now > lr + HARD:
            rows.add((holder, path, lr, "hard_released"))
    return rows


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(_renewal_streams())
def test_lease_monitor_matches_closed_form(stream):
    from state_harness import drive_monitor

    renewals, windows, now = stream
    got = drive_monitor(
        make_lease_event_monitor(SOFT, HARD),
        windows,
        now,
        key_cols=("holder", "path"),
        ts_col="renewed_ms",
    )
    got_rows = (
        set()
        if got is None
        else {
            (r.holder, r.path, int(r.last_renewed_ms), r.phase)
            for r in got.itertuples()
        }
    )
    assert got_rows == _expected(renewals, now)
    # exactly-once: no duplicated (lease, phase) emission
    if got is not None:
        assert len(got) == len(got_rows)


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(_renewal_streams())
def test_heartbeat_monitor_matches_closed_form(stream):
    """Same differential for the single-rung t22 heartbeat monitor
    (make_heartbeat_event_monitor): a node is declared dead — once, with
    its FINAL ping — iff NOW is strictly past final ping + expiry; live
    nodes emit nothing. Reuses the renewal-stream generator with
    (holder, path) read as a composite node id and renewed_ms as the
    ping series, the same gap contract (heartbeats every expiry/3 in the
    reference, HEARTBEAT_EXPIRY = 10 min vs 3 s intervals)."""
    from hadoop_hdfs_spark.streaming.timeouts import make_heartbeat_event_monitor

    from state_harness import drive_monitor

    renewals, windows, now = stream
    pings = renewals.assign(
        datanode_id=renewals["holder"] + renewals["path"],
        ping_ms=renewals["renewed_ms"],
    )[["datanode_id", "ping_ms"]]
    win_pings = [
        w.assign(
            datanode_id=w["holder"] + w["path"], ping_ms=w["renewed_ms"]
        )[["datanode_id", "ping_ms"]]
        for w in windows
    ]
    got = drive_monitor(
        make_heartbeat_event_monitor(SOFT),
        win_pings,
        now,
        key_cols=("datanode_id",),
        ts_col="ping_ms",
    )
    got_rows = (
        set()
        if got is None
        else {
            (r.datanode_id, int(r.last_heartbeat_ms), r.is_dead)
            for r in got.itertuples()
        }
    )
    last = pings.groupby("datanode_id")["ping_ms"].max()
    expected = {
        (node, int(lp), True)
        for node, lp in last.items()
        if now > int(lp) + SOFT
    }
    assert got_rows == expected
    if got is not None:
        assert len(got) == len(got_rows)
