"""S5 HFTP connector: XML listing round-trip through the Python Data
Source, servlet-param pushdown, and Range reads."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_hdfs_spark import hftp
from hadoop_hdfs_spark.entities import load_entities


@pytest.fixture(scope="module")
def listing(spark, sf_dir, tmp_path_factory):
    e = load_entities(spark, sf_dir)
    path = str(tmp_path_factory.mktemp("hftp") / "listing.xml")
    n = hftp.write_hftp_listing(e["inodes"], path)
    hftp.register(spark)
    return path, n, e["inodes"]


def test_listing_roundtrip_lossless(spark, listing):
    path, n, inodes = listing
    back = spark.read.format("hftp").option("url", f"file://{path}").load()
    assert back.count() == n
    a = {
        (r["path"], r["isdir"], r["length"], r["owner"])
        for r in back.collect()
    }
    b = {
        (r["path"], r["is_dir"], r["length"] if not r["is_dir"] else 0, r["owner"])
        for r in inodes.collect()
    }
    assert a == b


def test_listing_parallel_partitions(spark, listing):
    path, n, _ = listing
    df = (
        spark.read.format("hftp")
        .option("url", f"file://{path}")
        .option("numPartitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == n


def test_servlet_params_pushed_into_source(spark, listing):
    path, _, inodes = listing
    # root subtree + filter regex evaluated inside the reader, not in Spark
    sub = (
        spark.read.format("hftp")
        .option("url", f"file://{path}")
        .option("root", "/r1")
        .option("filter", "f.*")
        .load()
    )
    got = {r["path"] for r in sub.collect()}
    want = {
        r["path"]
        for r in inodes.filter(
            (F.col("path") == "/r1")
            | (
                F.col("path").startswith("/r1/")
                & F.element_at(F.split("path", "/"), -1).rlike("^f")
            )
        ).collect()
        # reader uses fullmatch on the basename
        if r["path"] == "/r1" or r["name"].startswith("f")
    }
    assert got == want
    assert len(got) > 0


def test_non_recursive_lists_direct_children_only(spark, listing):
    path, _, inodes = listing
    kids = (
        spark.read.format("hftp")
        .option("url", f"file://{path}")
        .option("root", "/r1")
        .option("recursive", "false")
        .load()
    )
    got = {r["path"] for r in kids.collect()}
    want = {"/r1"} | {
        r["path"] for r in inodes.filter(F.col("parent_id") == 11).collect()
    }
    assert got == want


def test_range_read(tmp_path):
    blob = tmp_path / "block.bin"
    blob.write_bytes(bytes(range(256)) * 4)
    out = hftp.range_read(f"file://{blob}", offset=300, length=10)
    assert out == bytes((300 + i) % 256 for i in range(10))
