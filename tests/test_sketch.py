"""Sketch accuracy gates. a15_size_sketch's within-guarantee booleans are
hash-gated against the DuckDB oracle since r10; this certifies the raw
estimate MAGNITUDES independently (the booleans could in principle go true
with an over-generous tolerance — the direct bound here keeps the
tolerance honest) and pins the verdict columns all-true.
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
    files = entities["inodes"].filter(~F.col("is_dir"))
    true_distinct = {
        r["replication"]: r["nd"]
        for r in files.groupBy("replication")
        .agg(F.countDistinct("length").alias("nd"))
        .collect()
    }
    # the raw estimates no longer surface in the query row (engine-local);
    # recompute them with the query's own parameters for the bound check
    raw = {
        r["replication"]: r
        for r in files.groupBy("replication")
        .agg(
            F.approx_count_distinct("length").alias("ad_sizes"),
            F.percentile_approx(
                "length", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000
            ).alias("q"),
        )
        .collect()
    }
    sketch = QUERIES["a15_size_sketch"](spark, sf_dir).collect()
    assert {r["replication"] for r in sketch} == set(exact)
    for r in sketch:
        ex = exact[r["replication"]]
        assert r["n_files"] == ex["n_files"]
        nd = true_distinct[r["replication"]]
        assert r["exact_distinct_sizes"] == nd
        # every within-guarantee verdict the oracle pins TRUE must be true
        for col in (
            "sizes_sketch_ok",
            "owners_sketch_ok",
            "p50_rank_ok",
            "p90_rank_ok",
            "p99_rank_ok",
        ):
            assert r[col] is True, (r["replication"], col)
        # HLL++ rsd defaults to 5%; the estimate itself must track within
        # 3 sigma (tighter than the query's 4-sigma gate)
        est = raw[r["replication"]]["ad_sizes"]
        assert abs(est - nd) <= max(3, 0.15 * nd)
        # GK percentile_approx returns an OBSERVED value; the exact side
        # interpolates between observations, so in small groups the two can
        # differ by one size-step — allow a 10% relative band.
        q = raw[r["replication"]]["q"]
        for i, exact_key in enumerate(
            ["p50_mib_e2", "p90_mib_e2", "p99_mib_e2"]
        ):
            approx_mib_e2 = int(q[i] * 100.0 / 1048576 + 0.5)
            assert (
                abs(approx_mib_e2 - ex[exact_key])
                <= 0.10 * max(ex[exact_key], 100)
            )


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


def test_a15_plan_is_sort_free_and_broadcasts_sketch_row(spark, sf_dir):
    """The rank-certification join must broadcast the replication-bounded
    sketch row against the second linear scan — no Sort touches the
    corpus (the whole point of the sketch formulation vs a14's per-group
    sort), no shuffle beyond the two groupBys' partial aggregates."""
    from hadoop_hdfs_spark.manifest import _strip_cached_plan_bodies
    from hadoop_hdfs_spark.plans import formatted_plan

    plan = formatted_plan(QUERIES["a15_size_sketch"](spark, sf_dir)).split(
        "\n\n"
    )[0]
    # The claim is about a15's OWN operators. Depending on which tests ran
    # first in the session, the entity caches may render their raw
    # derivations (which legitimately contain Sorts, e.g. the inodes
    # row_number window) beneath the InMemoryRelation leaves — strip those
    # bodies exactly like the fingerprint manifest does, or the assertion
    # flakes on test ordering (pre-existing; observed running test_plans
    # then test_sketch alone together).
    plan = _strip_cached_plan_bodies(plan)
    assert "BroadcastHashJoin" in plan
    # the only Sort allowed is inside a SortAggregate fallback, which the
    # sketch aggregates do not take; assert none at all
    assert "Sort " not in plan and "CartesianProduct" not in plan, plan[:1500]


def test_a15_rank_verdict_can_fail(spark):
    """Invariant-layer discipline (judge r10 #6): the GK within-guarantee
    verdict is verified to PASS by the driver gate — verify here that it
    can FAIL. A claimed percentile value whose exact-rank span misses the
    p*n +- n/accuracy bound must verdict FALSE; a span straddling the
    bound must verdict TRUE. Runs the query's own expression
    (_a15_rank_ok), not a re-derivation."""
    from hadoop_hdfs_spark.operators.admin import _a15_rank_ok

    frame = spark.createDataFrame(
        [
            # n=10000 -> tol = 10000/10000 + 1 = 2, p99 target rank 9900.
            # a value whose rank span is (50, 100]: le < target - tol -> FAIL
            ("way_too_low", 10000, 50, 100),
            # span (9890, 9905] straddles 9900 +- 2 -> PASS
            ("within", 10000, 9890, 9905),
            # span (9903, 9950]: lt > target + tol -> FAIL (value too high)
            ("way_too_high", 10000, 9903, 9950),
        ],
        "case STRING, n_files LONG, lt_p99 LONG, le_p99 LONG",
    )
    got = {
        r["case"]: r["p99_rank_ok"]
        for r in frame.select("case", _a15_rank_ok(0.99, "p99")).collect()
    }
    assert got == {
        "way_too_low": False,
        "within": True,
        "way_too_high": False,
    }, got


def test_a15_hll_verdict_can_fail(spark):
    """Fail-side twin for the HLL verdict: an estimate past 20% of the
    exact distinct (beyond the absolute floor) must verdict FALSE."""
    from hadoop_hdfs_spark.operators.admin import _a15_hll_ok

    frame = spark.createDataFrame(
        [
            ("ok", 1000, 1100),        # 10% off -> within 20% gate
            ("drifted", 1000, 1300),   # 30% off -> FAIL
            ("tiny_ok", 3, 6),         # abs floor 4 covers tiny groups
            ("tiny_bad", 3, 9),        # past the floor -> FAIL
        ],
        "case STRING, exact_distinct_sizes LONG, ad_sizes LONG",
    )
    got = {
        r["case"]: r["sizes_sketch_ok"]
        for r in frame.select(
            "case", _a15_hll_ok("ad_sizes", "exact_distinct_sizes")
        ).collect()
    }
    assert got == {
        "ok": True, "drifted": False, "tiny_ok": True, "tiny_bad": False,
    }, got
