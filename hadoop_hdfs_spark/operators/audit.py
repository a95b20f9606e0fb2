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


@register(
    "au_rate_anomaly",
    oracle="""
WITH au_per_hour AS (
  SELECT ugi, ts_ms // 3600000 AS hour_bucket,
         CAST(COUNT(*) AS BIGINT) AS n_ops
  FROM audit GROUP BY ugi, ts_ms // 3600000
),
au_prof AS (
  SELECT ugi,
         CAST(MAX(n_ops) AS BIGINT)   AS peak_ops,
         CAST(SUM(n_ops) AS BIGINT)   AS total_ops,
         CAST(COUNT(*)  AS BIGINT)    AS n_active_hours
  FROM au_per_hour GROUP BY ugi
),
au_peak AS (
  SELECT p.ugi, CAST(MIN(p.hour_bucket) AS BIGINT) AS peak_hour
  FROM au_per_hour p JOIN au_prof a
    ON a.ugi = p.ugi AND p.n_ops = a.peak_ops
  GROUP BY p.ugi
)
SELECT a.ugi,
       k.peak_hour,
       a.peak_ops,
       a.total_ops,
       a.n_active_hours,
       a.peak_ops * 1000000 * a.n_active_hours // a.total_ops
         AS peak_over_mean_e6,
       a.peak_ops * a.n_active_hours > 3 * a.total_ops AS is_spike
FROM au_prof a JOIN au_peak k ON k.ugi = a.ugi
""",
    doc="Per-principal rate-anomaly profile over the audit stream: bucket "
    "each ugi's RPC traffic by hour, then report the peak hour (earliest "
    "on ties), its op count, the activity-wide total/active-hour "
    "baseline, the integer-exact peak-over-mean ratio (e6 fixed-point "
    "via floor division — no float crosses an engine boundary), and a "
    "3x-mean spike flag. This is the screen an operator runs when a "
    "runaway client is hammering the namenode: the reference's audit "
    "stream (FSNamesystem.java:131-175) exists precisely to attribute "
    "such load to a principal. Scale: the raw audit stream is collapsed "
    "map-side to (ugi, hour) partials — the only record-scale shuffle — "
    "and every later step (per-ugi rollup, tie-broken peak-hour argmin, "
    "final join) runs on the principals x wall-clock-hours frame, which "
    "is dimension-bounded at any traffic volume.",
)
def au_rate_anomaly(e) -> DataFrame:
    per_hour = (
        e["audit"]
        .groupBy(
            "ugi",
            (F.col("ts_ms") / 3600000).cast("long").alias("hour_bucket"),
        )
        .agg(F.count("*").alias("n_ops"))
    )
    prof = per_hour.groupBy("ugi").agg(
        F.max("n_ops").alias("peak_ops"),
        F.sum("n_ops").alias("total_ops"),
        F.count("*").alias("n_active_hours"),
    )
    peaks_only = prof.select(
        F.col("ugi").alias("p_ugi"), F.col("peak_ops").alias("p_ops")
    )
    peak = (
        per_hour.join(
            peaks_only,
            on=[
                F.col("ugi") == F.col("p_ugi"),
                F.col("n_ops") == F.col("p_ops"),
            ],
        )
        .select("ugi", "hour_bucket")
        .groupBy("ugi")
        .agg(F.min("hour_bucket").alias("peak_hour"))
    )
    return prof.join(peak, "ugi").select(
        "ugi",
        "peak_hour",
        "peak_ops",
        F.col("total_ops").cast("long").alias("total_ops"),
        "n_active_hours",
        F.expr(
            "peak_ops * 1000000L * n_active_hours div total_ops"
        ).alias("peak_over_mean_e6"),
        (F.col("peak_ops") * F.col("n_active_hours")
         > 3 * F.col("total_ops")).alias("is_spike"),
    )


@register(
    "au_ip_profile",
    oracle="""
WITH au_per_ip AS (
  SELECT ugi, ip, CAST(COUNT(*) AS BIGINT) AS n
  FROM audit GROUP BY ugi, ip
),
au_top_ip AS (
  SELECT ugi, ip AS top_ip, n AS top_ip_ops FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY ugi
                                 ORDER BY n DESC, ip) AS rk
    FROM au_per_ip
  ) t WHERE rk = 1
),
au_tot AS (
  SELECT ugi, CAST(SUM(n) AS BIGINT) AS n_ops,
         CAST(COUNT(*) AS BIGINT) AS n_ips
  FROM au_per_ip GROUP BY ugi
)
SELECT t.ugi, t.n_ops, t.n_ips, p.top_ip, p.top_ip_ops,
       CAST(p.top_ip_ops * 1000 // t.n_ops AS BIGINT)
         AS top_ip_share_permille,
       (t.n_ips >= 2 AND p.top_ip_ops * 1000 // t.n_ops < 800) AS dispersed
FROM au_tot t JOIN au_top_ip p ON p.ugi = t.ugi
""",
    doc="Per-principal IP-dispersion profile over the audit stream: op "
    "count, distinct client IPs, the dominant IP (ties to the "
    "lexicographically lowest) with its op count and integer permille "
    "share, and a 'dispersed' flag (2+ IPs and the dominant one under "
    "80%) — the shared-credential / NAT-detection screen a security "
    "review runs against the reference's audit records, which carry the "
    "client address on every successful RPC (FSNamesystem.java:131-175, "
    "the Server.getRemoteIp() field). Scale: the only record-scale "
    "shuffle is the map-side-combined (ugi, ip) count; the argmax runs "
    "as a single min-of-struct aggregate on that bounded frame — no "
    "window, and the output is principal-bounded.",
)
def au_ip_profile(e) -> DataFrame:
    per_ip = e["audit"].groupBy("ugi", "ip").agg(F.count("*").alias("n"))
    # argmax with lowest-ip tiebreak as ONE aggregate: min of
    # struct(-n, ip) is (largest n, then lexicographically lowest ip)
    return (
        per_ip.groupBy("ugi")
        .agg(
            F.sum("n").cast("long").alias("n_ops"),
            F.count("*").cast("long").alias("n_ips"),
            F.min(
                F.struct((-F.col("n")).alias("neg_n"), F.col("ip").alias("ip"))
            ).alias("s"),
        )
        .select(
            "ugi",
            "n_ops",
            "n_ips",
            F.col("s.ip").alias("top_ip"),
            (-F.col("s.neg_n")).cast("long").alias("top_ip_ops"),
            F.expr("CAST((-s.neg_n) * 1000 DIV n_ops AS BIGINT)").alias(
                "top_ip_share_permille"
            ),
        )
        # derive the flag FROM the staged share so the threshold and the
        # reported number cannot drift apart
        .withColumn(
            "dispersed",
            (F.col("n_ips") >= 2) & (F.col("top_ip_share_permille") < 800),
        )
    )
