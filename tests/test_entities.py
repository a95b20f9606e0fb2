"""The entity model must be byte-identical between Spark and the DuckDB
oracle — everything downstream depends on it."""

from __future__ import annotations

import pytest

from hadoop_hdfs_spark.entities import ENTITY_SQL, load_entities, oracle_prelude
from hadoop_hdfs_spark.testing import compare_frames, duckdb_connect


@pytest.fixture(scope="module")
def entities(spark, sf_dir):
    return load_entities(spark, sf_dir)


@pytest.mark.parametrize("name", list(ENTITY_SQL))
def test_entity_matches_oracle(spark, sf_dir, entities, name):
    spark_pdf = entities[name].toPandas()
    con = duckdb_connect(sf_dir)
    duck_pdf = con.execute(oracle_prelude() + f"SELECT * FROM {name}").fetchdf()
    con.close()
    assert len(spark_pdf) > 0, f"{name} is empty"
    compare_frames(spark_pdf, duck_pdf)


def test_entity_invariants(spark, sf_dir, entities):
    inodes = entities["inodes"]
    blocks = entities["blocks"]
    replicas = entities["replicas"]

    # unique ids / paths
    assert inodes.count() == inodes.select("id").distinct().count()
    assert inodes.count() == inodes.select("path").distinct().count()
    assert blocks.count() == blocks.select("block_id").distinct().count()

    # every block belongs to a file inode
    files = inodes.filter(~inodes.is_dir).select(inodes.id.alias("file_id"))
    orphans = blocks.join(files, "file_id", "left_anti").count()
    assert orphans == 0

    # replica fan-out produces missing, under- and over-replicated blocks
    from pyspark.sql import functions as F

    rep_counts = blocks.join(replicas, "block_id", "left").groupBy("block_id").agg(
        F.count("datanode_id").alias("n")
    )
    ns = {r["n"] for r in rep_counts.select("n").distinct().collect()}
    assert 0 in ns and 5 in ns

    # replicas of one block land on distinct datanodes
    dup = (
        replicas.groupBy("block_id", "datanode_id")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0


def test_normalize_event_ts_bigint_passthrough(spark):
    from hadoop_hdfs_spark.entities import normalize_event_ts

    df = spark.range(3).selectExpr("id", "id * 1000000000 AS ts")
    out = normalize_event_ts(df)
    assert dict(out.dtypes)["ts"] == "bigint"
    assert [r.ts for r in out.orderBy("id").collect()] == [0, 1000000000, 2000000000]


def test_normalize_event_ts_ntz_to_utc_nanos(spark):
    """timestamp[us] fixtures read as TIMESTAMP_NTZ; the normalizer must
    interpret the wall-clock as UTC (DuckDB epoch_ns semantics) and emit
    BIGINT nanoseconds."""
    from hadoop_hdfs_spark.entities import normalize_event_ts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '1970-01-01 00:01:00' AS ts"
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    out = normalize_event_ts(df)
    assert dict(out.dtypes)["ts"] == "bigint"
    assert out.collect()[0].ts == 60_000_000_000


def test_events_ts_surfaces_as_nanos(spark, sf_dir, entities):
    """Whatever the fixture's physical parquet type, the registered events
    view exposes BIGINT nanoseconds (all downstream bucketing is integer
    nanosecond math)."""
    ev = spark.table("events")
    assert dict(ev.dtypes)["ts"] == "bigint"
