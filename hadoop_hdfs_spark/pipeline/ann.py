"""Random-hyperplane LSH for cosine similarity — the bucketed ANN scale path
that needs no precomputed partitioner (unlike the label-IVF variant).

8 hyperplanes in 64-d space give a 256-bucket signature; cosine-similar
vectors agree on most sign bits, so same-bucket candidates concentrate true
neighbors. At 100 TB the signature is the shuffle key: each query probes one
bucket instead of the corpus, and bucket skew is bounded by signature
entropy.

Determinism across engines: hyperplane components derive from md5 digests —
``w[j][i] = (int(md5(f"{j}|{i}")[:8], 16) % 1000) - 499.5`` — computed once
in Python (hashlib.md5 == SQL md5) and baked as numeric literals into BOTH
the Spark plan and the DuckDB oracle text. No engine evaluates randomness.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..registry import eager_cache, register

N_PLANES = 8
DIM = 64


def _hyperplanes(n: int = N_PLANES) -> list[list[float]]:
    out = []
    for j in range(n):
        row = []
        for i in range(DIM):
            h = hashlib.md5(f"{j}|{i}".encode()).hexdigest()
            row.append((int(h[:8], 16) % 1000) - 499.5)
        out.append(row)
    return out


_W = _hyperplanes()


def _duck_sig_expr(vec: str) -> str:
    """DuckDB: signature bits from sign of dot(v, w_j), packed to an int."""
    bits = []
    for j, w in enumerate(_W):
        dot = " + ".join(f"{vec}[{i + 1}] * ({w[i]})" for i in range(DIM))
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _spark_sig(vcol) -> F.Column:
    sig = F.lit(0)
    for j, w in enumerate(_W):
        dot = _dot(vcol, F.array(*[F.lit(x) for x in w]))
        sig = sig + F.when(dot > 0, 1 << j).otherwise(0)
    return sig.cast("int")


# shared with the brute/IVF paths — the fold order must stay bit-identical
from .similarity import _DUCK_DOT, _DUCK_NORM, _DUCK_VECS, _dot  # noqa: E402


@register(
    "s_ivf_build",
    oracle="""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xe
  FROM embeddings
),
dims AS (
  SELECT label, i, CAST(FLOOR(AVG(xe[i])) AS BIGINT) AS c
  FROM e, range(1, 65) t(i)
  GROUP BY label, i
),
cent AS (
  SELECT label AS cell,
         list(c ORDER BY i) AS ce
  FROM dims GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label, cent.cell,
         CAST(list_reduce(list_transform(range(1, 65),
              i -> (e.xe[i] - cent.ce[i]) * (e.xe[i] - cent.ce[i])),
              (acc, x) -> acc + x) AS BIGINT) AS sq_dist
  FROM e CROSS JOIN cent
)
SELECT vec_id, label, cell AS assigned_cell, sq_dist,
       cell <> label AS moved
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY sq_dist, cell) AS rk
  FROM scored
) t
WHERE rk = 1
""",
    doc="IVF index build — one Lloyd's (k-means) iteration, fully "
    "declarative: per-cell centroids from the current partition (label), "
    "then nearest-centroid reassignment. Everything is integer arithmetic "
    "(components quantized to e6 BEFORE averaging, so no float summation "
    "order can leak into the argmin) and the centroid table is "
    "cell-count-sized — broadcast at any corpus scale; the only shuffle "
    "is the dimension-wise centroid aggregation.",
)
def s_ivf_build(e) -> DataFrame:
    xe = e["embeddings"].select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1000000).cast("long")
        ).alias("xe"),
    )
    xe = eager_cache(e, "ivf_xe", xe)  # eager: feeds centroid agg + assignment join
    dims = (
        xe.select("label", F.posexplode("xe").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.floor(F.avg("x")).cast("long").alias("c"))
    )
    cent = dims.groupBy(F.col("label").alias("cell")).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("ce")
    )
    sq_dist = F.aggregate(
        F.zip_with("xe", "ce", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = xe.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "cell", sq_dist.alias("sq_dist")
    )
    w = Window.partitionBy("vec_id").orderBy("sq_dist", "cell")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "vec_id",
            "label",
            F.col("cell").alias("assigned_cell"),
            "sq_dist",
            (F.col("cell") != F.col("label")).alias("moved"),
        )
    )


@register(
    "s_knn_hyperplane_lsh",
    oracle=f"""
WITH e AS ({_DUCK_VECS}),
sig AS (SELECT vec_id, label, v, {_duck_sig_expr('v')} AS bucket FROM e),
q AS (SELECT * FROM sig WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id, a.bucket,
         CAST(FLOOR({_DUCK_DOT} / ({_DUCK_NORM.format(t='a')} * {_DUCK_NORM.format(t='q')})
              * 1000000) AS BIGINT) AS cos_e6
  FROM q JOIN sig a ON a.bucket = q.bucket AND a.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, bucket, cos_e6, CAST(rk AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_e6 DESC, neighbor_id) AS rk
  FROM scored
) t
WHERE rk <= 3
""",
    doc="Random-hyperplane cosine LSH top-3: 8 md5-seeded hyperplanes give "
    "a 256-bucket signature; each query probes only its bucket (equi-join "
    "on the signature), exact cosine re-ranks within. The ANN scale path "
    "when no coarse partitioner exists.",
)
def s_knn_hyperplane_lsh(e) -> DataFrame:
    vecs = e["embeddings"].select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    sig = eager_cache(
        e, "hyperplane_sig", vecs.withColumn("bucket", _spark_sig(F.col("v")))
    )  # eager: both join sides read it
    q = sig.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket").alias("qbucket"),
        F.col("v").alias("qv"),
    )
    dot = _dot(F.col("v"), F.col("qv"))
    norm = lambda c: F.sqrt(_dot(c, c))  # noqa: E731
    scored = (
        sig.join(F.broadcast(q), (F.col("bucket") == F.col("qbucket")))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "bucket",
            F.floor(dot / (norm(F.col("v")) * norm(F.col("qv"))) * 1000000)
            .cast("long")
            .alias("cos_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_e6").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "bucket", "cos_e6", "rank")
    )
