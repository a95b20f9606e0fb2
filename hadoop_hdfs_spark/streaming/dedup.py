"""Streaming exact deduplication — the continuous form of ``d_exact_dedup``
(pipeline/dedup.py): as documents arrive, keep the first occurrence of each
content digest and drop the rest.

State discipline is the whole point at scale: a naive ``dropDuplicates``
keeps every digest ever seen (state grows with the corpus);
``dropDuplicatesWithinWatermark`` bounds state to the watermark horizon —
the right contract for an ingest pipeline where a duplicate, if it comes,
comes within a bounded window of its original (crawl retries, double
uploads). Cross-horizon dedup belongs to the batch compaction pass
(``d_exact_dedup``) that closes the loop offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_documents_stream(
    spark: SparkSession,
    documents_parquet_dir: str,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
):
    """Stream (doc_id, text_md5) of first-seen documents from a parquet dir.

    Event time is the ingest timestamp carried by the fixture's ``doc_id``
    (one doc per second from the epoch — deterministic and monotone, the
    arrival-order analog). Returns ``(query, table)`` as the other
    streaming helpers do (availableNow trigger + memory sink).
    """
    schema = spark.read.parquet(documents_parquet_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(documents_parquet_dir)
    keyed = src.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        # +1 day: a row landing exactly ON the initial watermark (epoch 0,
        # i.e. doc_id=0) would be discarded as late before its digest ever
        # reaches state — keep the synthetic clock strictly above it
        F.timestamp_seconds(F.col("doc_id") + 86400).alias("ingest_ts"),
    )
    deduped = keyed.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["text_md5"]
    )
    name = "dedup_documents_sink"
    q = (
        deduped.select("doc_id", "text_md5")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )

    def table() -> DataFrame:
        return spark.table(name)

    return q, table
