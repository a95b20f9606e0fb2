"""Namenode audit-log analytics — the access-pattern queries run against
the reference's `FSNamesystem.audit` stream (FSNamesystem.java:131-175:
tab-separated ugi/ip/cmd/src/dst/perm records on every successful
namespace op, including the READ verbs the edit log never sees).

The audit stream is data-scale (one record per RPC — at a large
installation this is the namenode's densest output). Both queries here
aggregate FIRST: the shuffle moves (key, partial-count) pairs, never
audit records, and the post-aggregate frames are bounded — (ugi x cmd)
is principals x 14 verbs for the usage matrix; the hot-path report is a
TakeOrdered top-k over per-path partials. No window ever sees raw
records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..registry import register


@register(
    "au_usage_matrix",
    oracle="""
SELECT ugi, cmd,
       CAST(COUNT(*) AS BIGINT)            AS n_ops,
       CAST(COUNT(DISTINCT src) AS BIGINT) AS n_paths,
       MIN(ts_ms)                          AS first_ms,
       MAX(ts_ms)                          AS last_ms,
       CAST(SUM(CASE WHEN cmd IN ('open', 'listStatus', 'fsck')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_reads
FROM audit
GROUP BY ugi, cmd
""",
    doc="Audit-log usage matrix (FSNamesystem.java:131-175; the audit "
    "stream carries the read verbs — open/listStatus/fsck — that never "
    "reach the edit log, so this is the per-principal access accounting "
    "the reference's auditLog.info stream exists for). Per (ugi, cmd): op "
    "count, distinct-path fan-out, activity span, read-op share. Scale: "
    "one groupBy whose post-shuffle frame is principals x 14 verbs; "
    "COUNT(DISTINCT src) runs as Spark's two-phase partial-distinct "
    "expand — no raw audit record crosses the shuffle more than once.",
)
def au_usage_matrix(e) -> DataFrame:
    return (
        e["audit"]
        .groupBy("ugi", "cmd")
        .agg(
            F.count("*").alias("n_ops"),
            F.countDistinct("src").alias("n_paths"),
            F.min("ts_ms").alias("first_ms"),
            F.max("ts_ms").alias("last_ms"),
            F.sum(
                F.when(
                    F.col("cmd").isin("open", "listStatus", "fsck"), 1
                ).otherwise(0)
            ).alias("n_reads"),
        )
    )


@register(
    "au_hot_paths",
    oracle="""
SELECT src,
       CAST(COUNT(*) AS BIGINT)            AS n_ops,
       CAST(COUNT(DISTINCT ugi) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN cmd IN ('open', 'listStatus', 'fsck')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_reads,
       MAX(ts_ms)                          AS last_ms
FROM audit
GROUP BY src
ORDER BY n_ops DESC, src
LIMIT 25
""",
    doc="Hot-path report from the audit stream: top-25 namespace paths by "
    "RPC traffic with their principal fan-out and read share — the "
    "'which directories are hammered' question an operator asks the audit "
    "log before a balancer or quota decision. Scale: per-path partial "
    "counts map-side, then TakeOrderedAndProject carries only 25 rows per "
    "partition to the driver — no global sort of the path universe ever "
    "materializes.",
)
def au_hot_paths(e) -> DataFrame:
    agg = (
        e["audit"]
        .groupBy("src")
        .agg(
            F.count("*").alias("n_ops"),
            F.countDistinct("ugi").alias("n_users"),
            F.sum(
                F.when(
                    F.col("cmd").isin("open", "listStatus", "fsck"), 1
                ).otherwise(0)
            ).alias("n_reads"),
            F.max("ts_ms").alias("last_ms"),
        )
    )
    return agg.orderBy(F.col("n_ops").desc(), "src").limit(25)
