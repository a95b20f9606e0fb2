"""a15_size_sketch has no DuckDB oracle (sketches are not bit-reproducible
across engines); this bounds its error against the exact a14 answers instead,
so "approximate" stays a measured guarantee, not a shrug.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_hdfs_spark import registry

QUERIES = registry.queries()


def test_sketch_tracks_exact(spark, sf_dir):
    exact = {
        r["replication"]: r
        for r in QUERIES["a14_size_percentiles"](spark, sf_dir).collect()
    }
    entities = registry._entities(spark, sf_dir)
    true_distinct = {
        r["replication"]: r["nd"]
        for r in entities["inodes"]
        .filter(~F.col("is_dir"))
        .groupBy("replication")
        .agg(F.countDistinct("length").alias("nd"))
        .collect()
    }
    sketch = QUERIES["a15_size_sketch"](spark, sf_dir).collect()
    assert {r["replication"] for r in sketch} == set(exact)
    for r in sketch:
        ex = exact[r["replication"]]
        # exact counts must agree exactly
        assert r["n_files"] == ex["n_files"]
        # HLL++ rsd defaults to 5%; allow 3 sigma
        nd = true_distinct[r["replication"]]
        assert abs(r["approx_distinct_sizes"] - nd) <= max(3, 0.15 * nd)
        # GK percentile_approx returns an OBSERVED value; the exact side
        # interpolates between observations, so in small groups the two can
        # differ by one size-step — allow a 10% relative band.
        for exact_key, approx_key in [
            ("p50_mib_e2", "p50_approx_mib_e2"),
            ("p90_mib_e2", "p90_approx_mib_e2"),
            ("p99_mib_e2", "p99_approx_mib_e2"),
        ]:
            assert abs(r[approx_key] - ex[exact_key]) <= 0.10 * max(ex[exact_key], 100)
