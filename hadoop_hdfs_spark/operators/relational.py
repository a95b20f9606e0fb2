"""Relational operators beyond the reference's join vocabulary: as-of join,
range (interval-overlap) join, and hierarchical ROLLUP totals.

The reference composes at most one equi join per computation (SURVEY.md §2.3
— "no theta/range/as-of joins exist"); these close that gap with the three
shapes a metadata/event warehouse actually needs, each in its scalable
Spark formulation:

- as-of join: the classic union-and-ffill trick — ONE shuffle, no
  per-row subquery, no skew amplification (a per-probe-row subquery would
  be O(probe x build) at 100 TB).
- range join: equi-join on the coarse key (file_id) + residual interval
  predicate, so Catalyst plans a hash join, never a cartesian.
- rollup: GROUPING SETS partial-agg — every level computed in the same
  map-side pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..registry import register
from .blocks import w1_block_offsets


@register(
    "j8_asof_open_close",
    oracle="""
SELECT c.path                AS path,
       c.txid                AS close_txid,
       c.ts_ms               AS close_ts_ms,
       a.txid                AS open_txid,
       a.ts_ms               AS open_ts_ms,
       c.ts_ms - a.ts_ms     AS open_age_ms
FROM (SELECT * FROM edits WHERE op = 'OP_CLOSE') c
ASOF LEFT JOIN (SELECT * FROM edits WHERE op = 'OP_ADD') a
  ON c.path = a.path AND a.ts_ms <= c.ts_ms
""",
    doc="As-of join (beyond reference — nearest temporal predecessor): pair "
    "every OP_CLOSE edit with the latest OP_ADD at-or-before it on the same "
    "path — the open->close lease pairing (FSEditLog OP_ADD/OP_CLOSE, "
    "FSEditLogOpCodes.java:31-60). Spark lacks a native as-of join, so this "
    "is the scalable union formulation: tag both sides, sort by (path, ts) "
    "once, forward-fill the open side's attributes with last(ignorenulls) "
    "over an unbounded-preceding window, keep probe rows. One shuffle on "
    "path; the DuckDB oracle states the same semantics independently via "
    "its native ASOF LEFT JOIN.",
)
def j8_asof_open_close(e) -> DataFrame:
    edits = e["edits"]
    adds = edits.filter(F.col("op") == "OP_ADD").select(
        "path",
        "ts_ms",
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("close_txid"),
        F.col("txid").alias("open_txid"),
        F.col("ts_ms").alias("open_ts_ms"),
    )
    closes = edits.filter(F.col("op") == "OP_CLOSE").select(
        "path",
        "ts_ms",
        F.lit(1).alias("kind"),
        F.col("txid").alias("close_txid"),
        F.lit(None).cast("long").alias("open_txid"),
        F.lit(None).cast("long").alias("open_ts_ms"),
    )
    # kind orders an OP_ADD before an OP_CLOSE at the same timestamp, giving
    # the as-of "<=" (not "<") bound
    w = (
        Window.partitionBy("path")
        .orderBy("ts_ms", "kind", "close_txid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = adds.unionByName(closes).select(
        "path",
        "ts_ms",
        "kind",
        "close_txid",
        F.last("open_txid", ignorenulls=True).over(w).alias("open_txid"),
        F.last("open_ts_ms", ignorenulls=True).over(w).alias("open_ts_ms"),
    )
    return merged.filter(F.col("kind") == 1).select(
        "path",
        "close_txid",
        F.col("ts_ms").alias("close_ts_ms"),
        "open_txid",
        "open_ts_ms",
        (F.col("ts_ms") - F.col("open_ts_ms")).alias("open_age_ms"),
    )


# Deterministic synthetic read workload: two pread requests per non-empty
# file, offset spread by coprime multipliers, fixed 32 MiB length — the
# client-side access pattern S3/S4 serve (DFSInputStream.fetchBlockByteRange
# :655-762).
_READS_SQL = """
SELECT i.id                                                   AS file_id,
       CAST(r.r AS BIGINT)                                    AS read_id,
       (i.id * 7919 + r.r * 104729) % i.length                AS req_off,
       CAST(33554432 AS BIGINT)                               AS req_len
FROM inodes i
JOIN (SELECT 1 AS r UNION ALL SELECT 2) r ON TRUE
WHERE NOT i.is_dir AND i.length > 0
"""


@register(
    "j9_pread_scatter",
    oracle=f"""
WITH reads AS ({_READS_SQL}),
offsets AS (
  SELECT block_id, file_id, seq,
         CAST(COALESCE(SUM(num_bytes) OVER (
           PARTITION BY file_id ORDER BY seq
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset,
         CAST(COALESCE(SUM(num_bytes) OVER (
           PARTITION BY file_id ORDER BY seq
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + num_bytes AS BIGINT)                                           AS end_offset
  FROM blocks
)
SELECT rd.file_id, rd.read_id, o.block_id, o.seq,
       GREATEST(o.start_offset, rd.req_off)               AS read_start,
       LEAST(o.end_offset, rd.req_off + rd.req_len)       AS read_end
FROM reads rd
JOIN offsets o
  ON o.file_id = rd.file_id
 AND o.start_offset < rd.req_off + rd.req_len
 AND o.end_offset > rd.req_off
""",
    doc="Range join (interval overlap): scatter every positional read "
    "request onto the blocks it overlaps, clipped to per-block "
    "[read_start, read_end) — the multi-request generalization of S3 pread "
    "(DFSInputStream.java:655-762; block selection BlockManager.java:"
    "410-437). Planned as an equi hash join on file_id with the interval "
    "test as a residual filter — never a cartesian; per-file block lists "
    "are bounded (length/64 MiB), so the join fan-out is bounded too.",
)
def j9_pread_scatter(e) -> DataFrame:
    inodes = e["inodes"]
    reads = (
        inodes.filter(~F.col("is_dir") & (F.col("length") > 0))
        .select(
            F.col("id").alias("file_id"),
            F.explode(F.array(F.lit(1).cast("long"), F.lit(2).cast("long"))).alias(
                "read_id"
            ),
            "length",
        )
        .select(
            "file_id",
            "read_id",
            ((F.col("file_id") * 7919 + F.col("read_id") * 104729) % F.col("length")).alias(
                "req_off"
            ),
            F.lit(33554432).cast("long").alias("req_len"),
        )
    )
    o = w1_block_offsets(e)
    return (
        reads.join(o, "file_id")
        .filter(
            (F.col("start_offset") < F.col("req_off") + F.col("req_len"))
            & (F.col("end_offset") > F.col("req_off"))
        )
        .select(
            "file_id",
            "read_id",
            "block_id",
            "seq",
            F.greatest("start_offset", "req_off").alias("read_start"),
            F.least(F.col("end_offset"), F.col("req_off") + F.col("req_len")).alias(
                "read_end"
            ),
        )
    )


@register(
    "a13_usage_rollup",
    oracle="""
SELECT COALESCE(owner, '<all>')                          AS owner,
       COALESCE(grp, '<all>')                            AS grp,
       CAST(COUNT(*) AS BIGINT)                          AS n_files,
       CAST(SUM(length) AS BIGINT)                       AS total_bytes,
       CAST(SUM(length * replication) AS BIGINT)         AS diskspace
FROM inodes
WHERE NOT is_dir
GROUP BY ROLLUP (owner, grp)
""",
    doc="Hierarchical usage rollup (beyond reference — SURVEY.md §2.4 notes "
    "the reference has no grouping sets): per-(owner, group), per-owner, and "
    "grand-total file count / bytes / diskspace (the ContentSummary metrics, "
    "INode.java:192-224) in ONE pass via GROUP BY ROLLUP — partial "
    "aggregation computes every level map-side, one shuffle total, vs three "
    "separate scans.",
)
def a13_usage_rollup(e) -> DataFrame:
    files = e["inodes"].filter(~F.col("is_dir"))
    return (
        files.rollup("owner", "grp")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("length").alias("total_bytes"),
            F.sum(F.col("length") * F.col("replication")).alias("diskspace"),
        )
        .select(
            F.coalesce("owner", F.lit("<all>")).alias("owner"),
            F.coalesce("grp", F.lit("<all>")).alias("grp"),
            "n_files",
            "total_bytes",
            "diskspace",
        )
    )
