"""Event-time sessionization of the edit stream with Structured Streaming.

The batch form (`t10_edit_sessions`, operators/admin.py) computes gap-based
client sessions with lag + running-sum windows. This is the streaming
restatement: ``session_window`` merges events whose gaps stay under the
lease hard limit (3600 s, FSConstants.java:41-42), a watermark bounds state
for late edits, and the aggregation runs incrementally per micro-batch.

Boundary semantics match the batch query exactly: ``session_window`` merges
an event landing exactly on the window end (inclusive), so a new session
opens only when the inter-event gap strictly exceeds the gap duration —
the batch query's ``ts_ms - lag(ts_ms) > GAP`` condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SESSION_GAP_MS = 3_600_000  # lease hard limit (FSConstants.java:41-42)


def edit_sessions_stream(
    spark: SparkSession,
    edits_parquet_dir: str,
    gap_ms: int = SESSION_GAP_MS,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
):
    """Stream (client, session_window, ops) from an edits parquet directory.

    Returns ``(query, table)`` where ``query`` is the started streaming
    query (availableNow trigger — drains the directory then stops) and
    ``table()`` reads the append-mode memory sink. Session-window
    aggregation supports append output only: a session row is emitted
    exactly once, when the watermark passes its end (last event + gap) —
    sessions still open within the watermark delay of the stream tail stay
    in state. Late rows beyond ``watermark`` are dropped — the
    lost-heartbeat analog.
    """
    schema = spark.read.parquet(edits_parquet_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(edits_parquet_dir)
    ev = src.select(
        F.element_at(F.split("path", "/"), 3).alias("client"),
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
    )
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy("client", F.session_window("ts", f"{gap_ms} milliseconds"))
        .agg(F.count("*").alias("ops"))
    )
    name = "edit_sessions_sink"
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
