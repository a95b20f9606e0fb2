"""Time-bucketed analytics over the raw high-volume events stream — the
batch twins of the metrics the reference exposes as incrementally-maintained
counters (NameNodeMetrics / DataNodeMetrics rate gauges,
server/namenode/metrics/NameNodeMetrics.java:63-104).

The raw ``events`` fixture is the one genuinely data-scale table (it grows
linearly with SF like lineitem); everything here aggregates FIRST — the
shuffle moves (bucket, type) partial counts, never events — and only then
applies windows over the bounded (minutes x types) aggregate.

``events.ts`` is surfaced as BIGINT nanoseconds by
``entities.normalize_event_ts`` whatever the fixture's physical parquet
type (TIMESTAMP(NANOS) or timestamp[us]); DuckDB sees a TIMESTAMP and
buckets via ``epoch_ns`` — both sides use INTEGER nanosecond division
(``div`` / ``//``); double math would lose precision above 2^53 ns and is
avoided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..registry import register

_NS_PER_MIN = 60_000_000_000


@register(
    "t11_event_rates",
    oracle=f"""
WITH b AS (
  SELECT epoch_ns(ts) // {_NS_PER_MIN}        AS bucket,
         event_type,
         CAST(COUNT(*) AS BIGINT)             AS n_events,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events
  GROUP BY 1, 2
)
SELECT CAST(bucket * 60000 AS BIGINT) AS bucket_start_ms,
       event_type, n_events, value_cents,
       CAST(n_events - COALESCE(LAG(n_events) OVER (
         PARTITION BY event_type ORDER BY bucket), 0) AS BIGINT) AS delta_events
FROM b
""",
    doc="Tumbling-window rate metrics (NameNodeMetrics rate gauges, "
    "server/namenode/metrics/NameNodeMetrics.java:63-104, as a batch query): "
    "per-minute event counts and value totals per type, plus the "
    "minute-over-minute delta. Partial aggregation collapses the event "
    "stream map-side before the shuffle; the LAG window then runs over the "
    "(minutes x types) aggregate — bounded by wall-clock span, not data "
    "volume. value is summed as floor(x*100) BIGINT cents so the total is "
    "order-independent (double sums are not).",
)
def t11_event_rates(e) -> DataFrame:
    ev = e["events"]
    b = (
        ev.groupBy(
            F.expr(f"ts div {_NS_PER_MIN}").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    return b.select(
        (F.col("bucket") * 60000).cast("long").alias("bucket_start_ms"),
        "event_type",
        "n_events",
        "value_cents",
        (F.col("n_events") - F.coalesce(F.lag("n_events").over(w), F.lit(0)))
        .cast("long")
        .alias("delta_events"),
    )

@register(
    "c9_json_props",
    oracle="""
SELECT event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       CAST(COUNT(*) AS BIGINT)                               AS n_events,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY 1, 2
""",
    doc="Semi-structured property extraction (beyond reference — the "
    "reference stores opaque XML/JSON attribute blobs it never queries, "
    "e.g. ListPathsServlet emissions): parse the JSON props column, "
    "extract and type a field, aggregate by it. Spark evaluates "
    "get_json_object JVM-side inside codegen — at 100 TB the parse is a "
    "map; only (type, k_mod) partial counts shuffle. A hot production "
    "variant would from_json into a struct column once at ingest and let "
    "parquet store it columnar.",
)
def c9_json_props(e) -> DataFrame:
    ev = e["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", (F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )

# The FULL edit-op vocabulary (FSEditLogOpCodes.java:31-60, all 18
# non-deprecated/non-transport ops — matches entities._EDITS_SQL).
_OPCODES = [
    "OP_ADD", "OP_MKDIR", "OP_CLOSE", "OP_RENAME", "OP_DELETE",
    "OP_SET_REPLICATION", "OP_SET_PERMISSIONS", "OP_SET_OWNER",
    "OP_TIMES", "OP_SET_QUOTA", "OP_SYMLINK", "OP_CONCAT_DELETE",
    "OP_SET_GENSTAMP", "OP_REASSIGN_LEASE", "OP_GET_DELEGATION_TOKEN",
    "OP_RENEW_DELEGATION_TOKEN", "OP_CANCEL_DELEGATION_TOKEN",
    "OP_UPDATE_MASTER_KEY",
]

_PIVOT_SQL = ",\n".join(
    f"       CAST(SUM(CASE WHEN op = '{op}' THEN 1 ELSE 0 END) AS BIGINT) AS {op.lower()}"
    for op in _OPCODES
)


@register(
    "t12_opcode_hour_pivot",
    oracle=f"""
SELECT ts_ms // 3600000 AS hour_bucket,
{_PIVOT_SQL}
FROM edits
GROUP BY 1
""",
    doc="Pivot (beyond reference — the web UI renders opcode counters as a "
    "wide table, NamenodeJspHelper; here as a first-class operator): hourly "
    "edit-rate matrix, one column per opcode. The pivot value list is "
    "EXPLICIT, so Spark skips the distinct-values pre-scan a bare pivot() "
    "needs and compiles straight to conditional partial aggregates — one "
    "shuffle of (hour, 5 counters) regardless of stream size; the DuckDB "
    "oracle states the identical conditional-sum form.",
)
def t12_opcode_hour_pivot(e) -> DataFrame:
    edits = e["edits"]
    p = (
        edits.groupBy((F.col("ts_ms") / 3600000).cast("long").alias("hour_bucket"))
        .pivot("op", _OPCODES)
        .count()
    )
    # pivot leaves NULL where a (bucket, op) pair never occurred; the oracle's
    # conditional sums produce 0 — align, and fix column names/types
    return p.select(
        "hour_bucket",
        *[
            F.coalesce(F.col(op), F.lit(0)).cast("long").alias(op.lower())
            for op in _OPCODES
        ],
    )
