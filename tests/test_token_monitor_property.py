"""Randomized three-way differential for the t26 token monitor.

The `make_token_expiry_monitor` fold (streaming/timeouts.py) is driven
through a faithful emulation of the applyInPandasWithState contract —
per-group state cells, per-invocation timeout reset, event-time timeouts
fired when the watermark passes the pin, data delivery winning over a
same-batch timeout — with NO SparkSession, so hypothesis can afford real
example counts. Its removal log must agree exactly, on arbitrary
generated token-op streams, with

1. an INDEPENDENT sequential simulator of the reference semantics
   (AbstractDelegationTokenSecretManager: renewToken valid only while
   live and capped at maxDate, cancelToken removes immediately, the
   ExpiredTokenRemover kills at the pinned expiry), written against the
   reference description rather than the monitor's code; and
2. the registered DuckDB oracle SQL for `t26_token_expiry_stream`
   (LAG + running-MIN prefix authority), run over the same ops frame.

The generator preserves the two domain contracts the entity guarantees
(tests/test_entities.py): each token's issue precedes its other ops, and
event times are globally distinct (edits-derived ts is unique per txid).
Everything else — op interleavings across tokens, renewal/cancel mixes,
maxDate caps, expiry landing before/at/after later ops, window slicing —
is left to hypothesis.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_hdfs_spark.streaming.timeouts import make_token_expiry_monitor

GET = "OP_GET_DELEGATION_TOKEN"
REN = "OP_RENEW_DELEGATION_TOKEN"
CAN = "OP_CANCEL_DELEGATION_TOKEN"

_COLS = ("token_seq", "op", "ts_ms", "expiry_ms", "max_ms", "owner")


# --------------------------------------------------------------------------
# applyInPandasWithState harness (shared: tests/state_harness.py)
# --------------------------------------------------------------------------


def _drive_monitor(windows, horizon):
    from state_harness import drive_monitor

    got = drive_monitor(
        make_token_expiry_monitor(),
        windows,
        horizon,
        key_cols=("token_seq",),
        ts_col="ts_ms",
    )
    if got is None:
        return set()
    return {
        (int(r.token_seq), r.owner, r.status, int(r.death_ms), int(r.n_valid_renewals))
        for r in got.itertuples()
    }


# --------------------------------------------------------------------------
# independent reference simulator
# --------------------------------------------------------------------------


def _simulate(ops: pd.DataFrame, horizon: int):
    """DelegationTokenSecretManager semantics, first principles: issue
    pins min(maxDate, expiry); a later op logged past the pin means the
    remover already removed the token (death at the pin, the op is the
    InvalidToken no-op); an in-authority renewal re-pins at
    min(maxDate, its expiry); an in-authority cancel removes at its ts;
    the remover kills any survivor whose pin precedes the horizon."""
    expected = set()
    for tok, grp in ops.groupby("token_seq"):
        grp = grp.sort_values("ts_ms")
        owner = max_ms = pin = None
        renewals = 0
        death = None
        for r in grp.itertuples():
            if pin is None:
                if r.op == GET:
                    owner, max_ms = r.owner, int(r.max_ms)
                    pin = min(max_ms, int(r.expiry_ms))
                continue
            if r.ts_ms > pin:
                death = ("expired", pin)
                break
            if r.op == REN:
                pin = min(max_ms, int(r.expiry_ms))
                renewals += 1
            elif r.op == CAN:
                death = ("cancelled", int(r.ts_ms))
                break
        if death is None and pin is not None and pin < horizon:
            death = ("expired", pin)
        if death is not None:
            expected.add((int(tok), owner, death[0], death[1], renewals))
    return expected


# --------------------------------------------------------------------------
# generator: interleaved lifecycles with globally-distinct event times
# --------------------------------------------------------------------------


@st.composite
def _token_streams(draw):
    n_tokens = draw(st.integers(1, 6))
    labels = draw(
        st.lists(st.integers(0, n_tokens - 1), min_size=n_tokens, max_size=22)
    )
    # every token issues at least once; first occurrence is the GET
    labels = list(range(n_tokens)) + labels
    order = draw(st.permutations(range(len(labels))))
    labels = [labels[i] for i in order]
    seen = set()
    kinds = []
    for tok in labels:
        if tok not in seen:
            seen.add(tok)
            kinds.append((tok, GET))
        else:
            kinds.append((tok, draw(st.sampled_from([REN, CAN]))))
    # event times start at 1: epoch-ms in production, and the harness
    # (like real GroupState) rejects a non-positive timeout pin
    ts_list = sorted(
        draw(
            st.lists(
                st.integers(1, 60),
                min_size=len(kinds),
                max_size=len(kinds),
                unique=True,
            )
        )
    )
    rows = []
    for (tok, op), ts in zip(kinds, ts_list):
        if op == GET:
            max_ms = ts + draw(st.integers(0, 30))
            exp = ts + draw(st.integers(1, 25))
            rows.append((tok, GET, ts, exp, max_ms, f"u{tok % 3}"))
        elif op == REN:
            rows.append((tok, REN, ts, ts + draw(st.integers(1, 25)), None, None))
        else:
            rows.append((tok, CAN, ts, None, None, None))
    ops = pd.DataFrame(rows, columns=_COLS).astype(
        {"token_seq": "int64", "ts_ms": "int64"}
    )
    n_windows = draw(st.integers(1, min(4, len(ops))))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(1, len(ops) - 1),
                min_size=n_windows - 1,
                max_size=n_windows - 1,
                unique=True,
            )
        )
    )
    ordered = ops.sort_values("ts_ms").reset_index(drop=True)
    bounds = [0, *cuts, len(ops)]
    windows = [
        ordered.iloc[a:b].reset_index(drop=True)
        for a, b in zip(bounds, bounds[1:])
    ]
    return ops, windows


def _oracle_rows(ops: pd.DataFrame):
    from hadoop_hdfs_spark import registry

    registry._import_operator_modules()
    con = duckdb.connect()
    con.register("token_ops", ops)
    sql = registry._REGISTRY["t26_token_expiry_stream"].oracle
    out = con.execute(sql).df()
    con.close()
    return {
        (int(r.token_seq), r.owner, r.status, int(r.death_ms), int(r.n_valid_renewals))
        for r in out.itertuples()
    }


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(_token_streams())
def test_token_monitor_matches_simulator_and_oracle(stream):
    ops, windows = stream
    horizon = int(ops["ts_ms"].max()) + 1
    expected = _simulate(ops, horizon)
    assert _drive_monitor(windows, horizon) == expected
    assert _oracle_rows(ops) == expected
