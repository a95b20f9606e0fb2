"""Streaming twin of the batch rate metrics (``t11_event_rates``): tumbling
one-minute windows per event type, maintained incrementally — the actual
NameNodeMetrics shape (server/namenode/metrics/NameNodeMetrics.java:63-104:
counters roll over fixed intervals as ops arrive, they are not recomputed).

Scale shape: state is one partial aggregate per open (window, type) pair —
bounded by watermark horizon x type cardinality, independent of event
volume. The shuffle each micro-batch moves per-partition partial counts.

``events.ts`` is normalized to BIGINT nanoseconds by
``entities.normalize_event_ts`` (fixture generations vary between
TIMESTAMP(NANOS) and timestamp[us] physical types);
``timestamp_millis(ts div 1e6)`` truncates to the same minute bucket the
batch query derives with ``ts div 60e9`` — integer math throughout (double
division loses precision above 2^53 ns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..entities import normalize_event_ts


def event_rates_stream(
    spark: SparkSession,
    events_parquet_dir: str,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
):
    """Stream per-minute (event_type, n_events, value_cents) aggregates.

    Returns ``(query, table)``: ``query`` drains the directory under an
    availableNow trigger; ``table()`` reads the append-mode memory sink.
    Append emits a window exactly once, when the watermark passes its end —
    windows still open within the watermark delay of the stream tail stay
    in state (same contract as ``edit_sessions_stream``).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(events_parquet_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = normalize_event_ts(reader.parquet(events_parquet_dir))
    ev = src.select(
        F.timestamp_millis(F.expr("ts div 1000000")).alias("ts"),
        "event_type",
        "value",
    )
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )
    name = "event_rates_sink"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )

    def table() -> DataFrame:
        return spark.table(name)

    return q, table
