"""s_knn_ivfpq: plan shape + the honest recall pair for the composed
IVF-routing -> PQ-ADC-shortlist -> exact-re-rank search topology. The
oracle hash-match runs in test_queries.py like every registered query;
these tests pin what the hash cannot see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_hdfs_spark import registry
from hadoop_hdfs_spark.entities import load_entities
from hadoop_hdfs_spark.pipeline import ivfpq

QUERIES = registry.queries()


@pytest.fixture(scope="module")
def recall_pair(spark, sf_dir):
    """(structureless_avg, clustered_avg) end-to-end IVF-PQ recall
    permille. The clustered leg runs the SAME composed search path on
    label-correlated geometry with the label partition as the coarse
    cells — the converged partitioner's ideal on that geometry."""
    from hadoop_hdfs_spark.pipeline.similarity import _SPARK_CLUSTERED_VECS

    e = load_entities(spark, sf_dir)

    def avg_recall(df):
        return df.agg(F.avg("recall_permille").alias("a")).collect()[0].a

    plain = avg_recall(QUERIES["s_knn_ivfpq"](spark, sf_dir))
    clustered_xe = e["embeddings"].select(
        "vec_id",
        "label",
        F.expr(
            f"transform({_SPARK_CLUSTERED_VECS},"
            " x -> cast(floor(x * 1000000) as bigint))"
        ).alias("xe"),
    )
    label_asg = e["embeddings"].select("vec_id", F.col("label").alias("cell"))
    return plain, avg_recall(ivfpq._ivfpq_search(clustered_xe, label_asg))


def test_ivfpq_recall_is_honest_on_structureless_vectors(recall_pair):
    # NPROBE/k cell pruning + 4-byte codes on random 64-d vectors: recall
    # must sit well below the ship bar — anything higher would mean the
    # gate is measuring the fixture, not the topology
    plain, _ = recall_pair
    assert plain < 700, plain


def test_ivfpq_recall_passes_ship_gate_on_clustered_geometry(recall_pair):
    # label-correlated geometry: routing finds the right cells, the ADC
    # shortlist + exact re-rank recovers the true neighbors — the number
    # that says the 64x-compressed, NPROBE-pruned index can ship
    plain, clustered = recall_pair
    assert clustered >= 800, clustered
    assert clustered > plain


def test_ivfpq_plan_broadcasts_all_small_sides(spark, sf_dir):
    """Centroids, the routed query table, the codebook, and the query
    sample are all broadcast; the corpus is never the build side and no
    unplanned CartesianProduct appears. The only corpus-scale work is the
    encode map + the cell-equi-joined ADC scan."""
    from hadoop_hdfs_spark.plans import formatted_plan

    plan = formatted_plan(QUERIES["s_knn_ivfpq"](spark, sf_dir)).split(
        "\n\n"
    )[0]
    assert plan.count("CartesianProduct") == 0
    assert plan.count("BroadcastNestedLoopJoin") >= 2  # centroids + exact leg


def test_ivfpq_shares_one_training_loop_with_s_ivf_train(spark, sf_dir):
    """Running the trajectory gate then the search must NOT run Lloyd's
    twice: both consume the memoized loop products (the converged
    assignment is stashed when either runs first)."""
    from hadoop_hdfs_spark.registry import _CACHED

    QUERIES["s_ivf_train"](spark, sf_dir).count()
    tags = {k[2] for k in _CACHED}
    assert {"ivf_train_traj", "ivf_converged_asg"} <= tags
