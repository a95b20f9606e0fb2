"""T3 heartbeat liveness as a live stateful stream: verifies both the
update path (heartbeats refresh state) and the timeout path (a silent
datanode is declared dead by the processing-time timeout)."""

from __future__ import annotations

import time

import pytest


@pytest.mark.timeout(180)
def test_heartbeat_timeout_declares_dead(spark, tmp_path):
    from hadoop_hdfs_spark.streaming.timeouts import heartbeat_liveness_stream

    src = tmp_path / "hb"
    src.mkdir()
    schema = "datanode_id STRING, heartbeat_ms LONG"

    # batch 1: dn_a and dn_b both heartbeat
    spark.createDataFrame(
        [("dn_a", 1000), ("dn_b", 1000)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = heartbeat_liveness_stream(stream, timeout_ms=3000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("liveness")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait for batch 1 to land: both alive
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM liveness").collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
        alive = {r["datanode_id"]: r["is_dead"] for r in rows}
        assert alive == {"dn_a": False, "dn_b": False}

        # dn_b keeps heartbeating (several batches); dn_a goes silent
        deadline = time.time() + 90
        dead_seen = False
        i = 0
        while time.time() < deadline and not dead_seen:
            spark.createDataFrame(
                [("dn_b", 2000 + i)], schema
            ).coalesce(1).write.mode("append").parquet(str(src))
            i += 1
            time.sleep(2)
            for r in spark.sql("SELECT * FROM liveness").collect():
                if r["datanode_id"] == "dn_a" and r["is_dead"]:
                    dead_seen = True
        assert dead_seen, "silent datanode was never declared dead by timeout"
        # the survivor's LATEST observation is alive (it may transiently be
        # declared dead during a batch-processing gap and revive — correct
        # monitor semantics, matching the reference's dead->alive flap on a
        # recovered heartbeat)
        b_rows = [
            r
            for r in spark.sql("SELECT * FROM liveness").collect()
            if r["datanode_id"] == "dn_b"
        ]
        assert b_rows
        latest = max(b_rows, key=lambda r: (r["last_heartbeat_ms"], not r["is_dead"]))
        assert not latest["is_dead"]
    finally:
        q.stop()


@pytest.mark.timeout(180)
def test_pending_replication_timeout_requeues(spark, tmp_path):
    """T7 live: a confirmed block leaves the pending map; an unconfirmed
    block is re-emitted with timed_out=True by the processing-time
    timeout (PendingReplicationBlocks timedOutItems semantics)."""
    from hadoop_hdfs_spark.streaming.timeouts import pending_replication_stream

    src = tmp_path / "pending"
    src.mkdir()
    schema = "block_id LONG, event STRING, event_ms LONG, n_replicas LONG"

    # batch 1: work dispatched for blocks 1 and 2
    spark.createDataFrame(
        [(1, "dispatch", 1000, 2), (2, "dispatch", 1000, 1)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = pending_replication_stream(stream, timeout_ms=3000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("pending")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM pending").collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
        got = {r["block_id"]: r for r in rows}
        assert got[1]["replicas_in_flight"] == 2 and not got[1]["timed_out"]
        assert got[2]["replicas_in_flight"] == 1 and not got[2]["timed_out"]

        # block 2's replica is confirmed; block 1 never confirms. Keep the
        # micro-batches coming (timeouts only fire when a batch runs) until
        # block 1 is re-emitted by timeout.
        spark.createDataFrame(
            [(2, "confirm", 2000, 1)], schema
        ).coalesce(1).write.mode("append").parquet(str(src))
        deadline = time.time() + 90
        timed_out_seen = False
        confirmed_seen = False
        i = 0
        while time.time() < deadline and not (timed_out_seen and confirmed_seen):
            # heartbeat batches on an unrelated block to trigger processing
            spark.createDataFrame(
                [(99, "dispatch", 3000 + i, 1)], schema
            ).coalesce(1).write.mode("append").parquet(str(src))
            i += 1
            time.sleep(2)
            for r in spark.sql("SELECT * FROM pending").collect():
                if r["block_id"] == 1 and r["timed_out"]:
                    assert r["replicas_in_flight"] == 2  # unconfirmed work re-queued
                    timed_out_seen = True
                if r["block_id"] == 2 and r["replicas_in_flight"] == 0:
                    assert not r["timed_out"]
                    confirmed_seen = True
        assert timed_out_seen, "unconfirmed work never re-queued by timeout"
        assert confirmed_seen, "confirmed work never evicted from the map"
    finally:
        q.stop()


def test_t22_event_time_liveness_matches_batch_f4(spark, sf_dir):
    """The gated event-time heartbeat monitor (t22) must agree with the
    BATCH dead-node classification (f4's DEAD rows) node-for-node, and
    its folded state must reproduce the datanodes snapshot column —
    cross-operator consistency beyond the SQL oracle."""
    from pyspark.sql import functions as F

    from hadoop_hdfs_spark import registry
    from hadoop_hdfs_spark.entities import HEARTBEAT_EXPIRY_MS, NOW_MS

    e = registry._entities(spark, sf_dir)
    stream_dead = registry.queries()["t22_heartbeat_liveness_stream"](
        spark, sf_dir
    )
    batch_dead = e["datanodes"].filter(
        F.lit(NOW_MS) - F.col("last_heartbeat_ms") > HEARTBEAT_EXPIRY_MS
    ).select("datanode_id", "last_heartbeat_ms")
    got = {
        (r.datanode_id, r.last_heartbeat_ms) for r in stream_dead.collect()
    }
    want = {
        (r.datanode_id, r.last_heartbeat_ms) for r in batch_dead.collect()
    }
    assert got == want and len(got) > 0
    # removal_pass is the registration-order sequence, 1..N dense
    passes = sorted(r.removal_pass for r in stream_dead.collect())
    assert passes == list(range(1, len(got) + 1))
