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
