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


def test_kmv_sketch_tracks_exact(spark, sf_dir):
    """t_shingle_kmv: the estimator branch must engage (k_used == k) and
    track the exact distinct shingle count within ~3/sqrt(k); the shared
    (k-1)*2^60 constant is re-derived here independently so a wrong
    numerator cannot hide behind the cross-engine hash match (it did in
    r6 until this test caught it)."""
    import duckdb

    from hadoop_hdfs_spark.pipeline.text import _KMV_K, _KMV_NUM

    assert int(_KMV_NUM) == (_KMV_K - 1) * 2**60

    exact = dict(
        duckdb.sql(
            f"""
SELECT source, COUNT(DISTINCT s) FROM (
  SELECT source, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS s
  FROM (SELECT source, string_split(text, ' ') AS words
        FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE len(string_split(text, ' ')) >= 3),
       unnest(generate_series(1, len(words) - 2)) AS u(i)
) GROUP BY source
"""
        ).fetchall()
    )
    got = {
        r.source: (r.est_distinct_shingles, r.k_used)
        for r in registry.queries()["t_shingle_kmv"](spark, sf_dir).collect()
    }
    assert set(got) == set(exact)
    engaged = 0
    for s, n in exact.items():
        est, k_used = got[s]
        if k_used == _KMV_K:
            engaged += 1
            assert abs(est - n) <= 3 / (_KMV_K**0.5) * n + 3, (s, est, n)
        else:
            assert est == n == k_used, (s, est, n)  # sub-k: exact by design
    assert engaged > 0, "fixture must exercise the estimator branch"
