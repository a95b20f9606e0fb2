"""Time-bucketed analytics over the raw high-volume events stream — the
batch twins of the metrics the reference exposes as incrementally-maintained
counters (NameNodeMetrics / DataNodeMetrics rate gauges,
server/namenode/metrics/NameNodeMetrics.java:63-104).

The raw ``events`` fixture is the one genuinely data-scale table (it grows
linearly with SF like lineitem); everything here aggregates FIRST — the
shuffle moves (bucket, type) partial counts, never events — and only then
applies windows over the bounded (minutes x types) aggregate.

``events.ts`` is parquet TIMESTAMP(NANOS): Spark 4 surfaces it as BIGINT
nanoseconds (``nanosAsLong``), DuckDB as a TIMESTAMP — both sides bucket by
INTEGER nanosecond division (``div`` / ``//``); double math would lose
precision above 2^53 ns and is avoided.
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
