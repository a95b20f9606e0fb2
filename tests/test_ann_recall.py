"""ANN recall measurement: the s_knn_recall harness must (a) report the
honest low recall of one-bucket probing on the structureless fixture
vectors, and (b) report high recall when the coarse key actually encodes
geometry — proving the operator composition, not just the plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_hdfs_spark.pipeline.similarity import s_knn_recall


@pytest.fixture(scope="module")
def clustered(spark):
    """300 vectors in 3 tight, well-separated 8-d clusters; label == cluster.
    Every true neighbor shares the query's label, so bucketed top-5 must
    equal exact top-5."""
    rows = []
    for i in range(300):
        c = i % 3
        base = [10.0 * (1 if d == c else 0) for d in range(8)]
        # deterministic small jitter, unique per vector
        jit = [((i * 31 + d * 17) % 13 - 6) / 100.0 for d in range(8)]
        rows.append((i, [b + j for b, j in zip(base, jit)], c))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    return {"embeddings": df}


def test_recall_is_perfect_on_clustered_data(clustered):
    rec = s_knn_recall(clustered)
    agg = rec.agg(
        F.min("recall_permille").alias("mn"), F.count("*").alias("n")
    ).collect()[0]
    from hadoop_hdfs_spark.pipeline.similarity import QUERY_K

    assert agg.n == QUERY_K  # fixed-K sample: lowest md5(vec_id)
    assert agg.mn == 1000, rec.orderBy("query_id").collect()


def test_recall_reports_random_baseline_on_fixture(spark, sf_dir):
    from hadoop_hdfs_spark import registry

    rec = registry.queries()["s_knn_recall"](spark, sf_dir)
    avg = rec.agg(F.avg("recall_permille").alias("a")).collect()[0].a
    # structureless vectors + label buckets: recall must sit far below a
    # real index's bar — the gate's whole point is surfacing this
    assert avg < 500


def test_clustered_fixture_recall_passes_ship_gate(spark, sf_dir):
    """The driver-gated clustered variant: label-correlated geometry must
    push the bucketed index past the >= 0.8 recall@5 ship bar (it lands at
    1.0 on the md5-derived centers)."""
    from hadoop_hdfs_spark import registry

    rec = registry.queries()["s_knn_recall_clustered"](spark, sf_dir)
    agg = rec.agg(
        F.min("recall_permille").alias("mn"), F.count("*").alias("n")
    ).collect()[0]
    assert agg.n >= 1
    assert agg.mn >= 800, rec.orderBy("query_id").collect()


def test_mrl_truncation_honest_pair(spark, sf_dir):
    """s_mrl_truncation's numbers must be geometry, not artifact: prefix
    recall is LOW on the structureless fixture (a random vector's first
    16 dims carry 1/4 of the information — truncation is NOT safe for an
    untrained-embedding model, and the gate must say so) and MONOTONE in
    prefix width; on FRONT-LOADED geometry (dimension i scaled by
    1/(1+i) — the importance decay MRL training produces) the 32-dim
    prefix crosses the ship bar — the pair that makes the gate a real
    measurement of the model, not of the harness."""
    from hadoop_hdfs_spark.entities import load_entities
    from hadoop_hdfs_spark.pipeline.ann import _mrl_recall
    from hadoop_hdfs_spark import registry

    res = registry.queries()["s_mrl_truncation"](spark, sf_dir)
    a = res.agg(
        F.avg("recall_p16_permille").alias("p16"),
        F.avg("recall_p32_permille").alias("p32"),
    ).collect()[0]
    assert a.p16 < 500 and a.p32 < 700, (a.p16, a.p32)
    assert a.p32 >= a.p16

    e = load_entities(spark, sf_dir)
    front_xe = e["embeddings"].select(
        "vec_id",
        F.expr(
            "transform(embedding, (x, i) ->"
            " cast(floor(cast(x as double) * 1000000 / (1 + i)) as bigint))"
        ).alias("xe"),
    )
    c = _mrl_recall(front_xe).agg(
        F.avg("recall_p16_permille").alias("p16"),
        F.avg("recall_p32_permille").alias("p32"),
    ).collect()[0]
    assert c.p32 >= 800, (c.p16, c.p32)
    assert c.p32 >= a.p32 and c.p16 >= a.p16
