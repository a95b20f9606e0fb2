"""The functions/ library must agree exactly with the inline expressions the
registered (oracle-verified) queries state — two forms, one semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_hdfs_spark import functions as HF
from hadoop_hdfs_spark import registry

QUERIES = registry.queries()


def test_path_functions_match_c1(spark, sf_dir):
    e = registry._entities(spark, sf_dir)
    lib = e["inodes"].select(
        "id",
        HF.path_basename("path").alias("basename"),
        HF.path_parent("path").alias("parent_path"),
        HF.path_depth("path").alias("depth"),
    )
    q = QUERIES["c1_path_functions"](spark, sf_dir).select(
        "id", "basename", "parent_path", "depth"
    )
    assert lib.exceptAll(q).count() == 0 and q.exceptAll(lib).count() == 0


def test_block_codec_roundtrip(spark, sf_dir):
    e = registry._entities(spark, sf_dir)
    d = e["blocks"].select(
        "block_id",
        "gen_stamp",
        HF.parse_block_id(HF.block_name("block_id")).alias("rt_id"),
        HF.parse_gen_stamp(HF.meta_name("block_id", "gen_stamp")).alias("rt_gs"),
        HF.is_meta_filename(HF.meta_name("block_id", "gen_stamp")).alias("ok_meta"),
        HF.is_block_filename(HF.block_name("block_id")).alias("ok_blk"),
    )
    bad = d.filter(
        (F.col("rt_id") != F.col("block_id"))
        | (F.col("rt_gs") != F.col("gen_stamp"))
        | ~F.col("ok_meta")
        | ~F.col("ok_blk")
    )
    assert bad.count() == 0


def test_perm_octal_matches_c5(spark, sf_dir):
    e = registry._entities(spark, sf_dir)
    lib = e["inodes"].select("perm", HF.perm_octal("perm").alias("octal")).distinct()
    q = QUERIES["c5_permission_codec"](spark, sf_dir).select("perm", "octal")
    assert lib.exceptAll(q).count() == 0 and q.exceptAll(lib).count() == 0


def test_subtree_predicate(spark, sf_dir):
    e = registry._entities(spark, sf_dir)
    inodes = e["inodes"]
    root_all = inodes.filter(HF.is_descendant_of("path", F.lit("/"))).count()
    assert root_all == inodes.count() - 1  # everything but '/' itself
    # no path is its own descendant
    assert inodes.filter(HF.is_descendant_of("path", F.col("path"))).count() == 0


def test_vector_scalars(spark, sf_dir):
    e = registry._entities(spark, sf_dir)
    row = (
        e["embeddings"]
        .select(
            HF.dot("embedding", "embedding").alias("dd"),
            HF.l2_norm("embedding").alias("n"),
        )
        .first()
    )
    assert abs(row["dd"] - row["n"] ** 2) < 1e-9


def test_shingles_matches_curation(spark, sf_dir):
    from hadoop_hdfs_spark.pipeline.curation import _shingle3

    e = registry._entities(spark, sf_dir)
    d = e["documents"].select(
        HF.shingles("text", 3).alias("lib"), _shingle3(F.col("text")).alias("inline")
    )
    assert d.filter(F.col("lib") != F.col("inline")).count() == 0
