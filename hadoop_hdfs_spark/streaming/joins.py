"""Stream-stream interval join: pair OP_CLOSE edits with the OP_ADD edits
that opened them, as both streams arrive — the continuous form of the batch
as-of pairing (``j8_asof_open_close``, operators/relational.py), bounded to
the lease hard-limit window.

Scale shape: both sides carry a watermark and the join condition carries an
explicit event-time bound, so each side's buffered state is only the
watermark+bound horizon — without the time bound a stream-stream join must
buffer one side forever. State is keyed by path (the equi key); matching is
a hash lookup per arriving row, exactly the shuffled-hash-join layout, held
incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Pairing horizon: one day — the abandoned-file sweep window (an OP_ADD
# with no OP_CLOSE inside it is a lease-recovery candidate, the
# LeaseManager.Monitor sweep generalized to event time). The lease hard
# limit itself (3600 s, FSConstants.java:41-42) is shorter than the edit
# stream's minimum same-path revisit interval in the fixture model.
_PAIR_HORIZON_S = 86400


def open_close_pairs_stream(
    spark: SparkSession,
    edits_parquet_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
):
    """Stream (path, open_txid, close_txid, open_age_ms) pairs.

    Inner join: a pair is emitted when both sides have arrived; the
    event-time bound (close within the sweep horizon of its open) plus
    the watermarks let Spark evict adds older than the horizon. Returns
    ``(query, table)`` like the other streaming helpers.
    """
    schema = spark.read.parquet(edits_parquet_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(edits_parquet_dir)
    ev = src.select(
        "txid", "op", "path", F.timestamp_millis(F.col("ts_ms")).alias("ts")
    )
    adds = (
        ev.filter(F.col("op") == "OP_ADD")
        .select(
            F.col("path").alias("a_path"),
            F.col("txid").alias("open_txid"),
            F.col("ts").alias("a_ts"),
        )
        .withWatermark("a_ts", watermark)
    )
    closes = (
        ev.filter(F.col("op") == "OP_CLOSE")
        .select(
            F.col("path").alias("c_path"),
            F.col("txid").alias("close_txid"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    joined = closes.join(
        adds,
        F.expr(
            f"""
            c_path = a_path AND
            a_ts <= c_ts AND
            a_ts >= c_ts - INTERVAL {_PAIR_HORIZON_S} SECONDS
            """
        ),
    ).select(
        F.col("c_path").alias("path"),
        "open_txid",
        "close_txid",
        (
            F.unix_millis(F.col("c_ts")) - F.unix_millis(F.col("a_ts"))
        ).alias("open_age_ms"),
    )
    name = "open_close_pairs_sink"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )

    def table() -> DataFrame:
        return spark.table(name)

    return q, table
