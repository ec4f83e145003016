"""Report suite (M2): the reference's 9-reporter ``report`` tool
(report/ReportRunner.java:35-43, ReportBuilder.java:33-47) as declarative
event queries — SURVEY.md §2 IDs A6-A8, F8/F9, X8-X10, W5, J8/J9.

Each reporter emits standardized event rows (object, problem, severity,
resolution) exactly like the reference's REPORT mode renders findings +
fix scripts instead of executing them (report/FullReport.java:38-67).

Scale: every reporter is a groupBy/filter over a metadata relation whose
aggregated cardinality is O(servers + tables), so the plans are map-side
partial agg + tiny shuffles; the event union is a metadata-sized result
no matter the cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Model
from ..functions.exprs import fround
from ..model import EVENTS_AS_OF, EVENTS_AS_OF_LIT, ORDERS_AS_OF, ORDERS_AS_OF_LIT
from ..registry import query


# ---------------------------------------------------------------------------
# A6 — regions-per-server distribution with severity bands
# (report/reports/MetaRSDistributionReporter.java:24-47)
# ---------------------------------------------------------------------------

@query(
    "report_rs_distribution",
    oracle="""
SELECT c.server,
       c.regions,
       floor(a.avg_regions * 10000.0 + 0.5) / 10000.0 AS avg_regions,
       CASE WHEN c.regions > a.avg_regions * 2   THEN 'CRITICAL_OVER'
            WHEN c.regions < a.avg_regions * 0.3 THEN 'CRITICAL_UNDER'
            WHEN c.regions > a.avg_regions * 1.3 THEN 'WARN_OVER'
            ELSE 'OK' END AS severity
FROM (
  SELECT s.server, coalesce(cnt.regions, 0) AS regions
  FROM servers s
  LEFT JOIN (SELECT server, count(*) AS regions FROM meta_regions GROUP BY 1) cnt
    ON s.server = cnt.server
) c
CROSS JOIN (
  SELECT (SELECT count(*) FROM meta_regions) * 1.0 / (SELECT count(*) FROM servers)
         AS avg_regions
) a
""",
    views=["meta_regions", "servers"],
)
def report_rs_distribution(m: Model) -> DataFrame:
    """A6/J8 — per-server region count densified vs live servers, global
    average, severity banding (x2 / x1.3 / x0.3 vs avg)."""
    counts = m.meta_regions.groupBy("server").agg(F.count(F.lit(1)).alias("regions"))
    densified = (
        m.servers.join(counts, "server", "left")
        .withColumn("regions", F.coalesce(F.col("regions"), F.lit(0)))
    )
    total = m.meta_regions.agg(F.count(F.lit(1)).alias("t"))
    nserv = m.servers.agg(F.count(F.lit(1)).alias("s"))
    avg = total.crossJoin(nserv).select(
        (F.col("t") * 1.0 / F.col("s")).alias("avg_regions")
    )
    return (
        densified.crossJoin(F.broadcast(avg))
        .select(
            "server",
            "regions",
            fround(F.col("avg_regions"), 4).alias("avg_regions"),
            F.when(F.col("regions") > F.col("avg_regions") * 2, "CRITICAL_OVER")
            .when(F.col("regions") < F.col("avg_regions") * 0.3, "CRITICAL_UNDER")
            .when(F.col("regions") > F.col("avg_regions") * 1.3, "WARN_OVER")
            .otherwise("OK")
            .alias("severity"),
        )
        .orderBy("server")
    )


# ---------------------------------------------------------------------------
# A7/F9 — snapshot reports (report/reports/SnapshotsReport.java:22-49)
# ---------------------------------------------------------------------------

@query(
    "report_snapshots_stale",
    oracle=f"""
SELECT table_name,
       snapshot_name,
       datediff('day', CAST(created_ts AS DATE), CAST({ORDERS_AS_OF} AS DATE)) AS age_days,
       CASE WHEN datediff('day', CAST(created_ts AS DATE), CAST({ORDERS_AS_OF} AS DATE)) >= 30
            THEN 'CRITICAL' ELSE 'NORMAL' END AS severity,
       concat('delete_snapshot ', snapshot_name) AS resolution
FROM snapshots
WHERE datediff('day', CAST(created_ts AS DATE), CAST({ORDERS_AS_OF} AS DATE)) >= 10
""",
    views=["snapshots"],
)
def report_snapshots_stale(m: Model) -> DataFrame:
    """F9/X6/X8 — snapshots older than 10 days, CRITICAL at 30+
    (SnapshotsReport.java:36-42)."""
    age = F.datediff(F.lit(ORDERS_AS_OF_LIT).cast("date"), F.col("created_ts").cast("date"))
    return (
        m.snapshots.withColumn("age_days", age)
        .filter(F.col("age_days") >= 10)
        .select(
            "table_name",
            "snapshot_name",
            "age_days",
            F.when(F.col("age_days") >= 30, "CRITICAL").otherwise("NORMAL").alias("severity"),
            F.concat(F.lit("delete_snapshot "), F.col("snapshot_name")).alias("resolution"),
        )
    )


@query(
    "report_snapshots_toomany",
    oracle="""
SELECT table_name, count(*) AS snapshots
FROM snapshots
GROUP BY table_name
HAVING count(*) >= 5
""",
    views=["snapshots"],
)
def report_snapshots_toomany(m: Model) -> DataFrame:
    """A7 — tables with >= 5 snapshots (SnapshotsReport.java:34-49)."""
    return (
        m.snapshots.groupBy("table_name")
        .agg(F.count(F.lit(1)).alias("snapshots"))
        .filter(F.col("snapshots") >= 5)
    )


# ---------------------------------------------------------------------------
# F8/X9 — heap pressure (report/reports/RegionHeapSizeReporter.java:25-28)
# ---------------------------------------------------------------------------

@query(
    "report_heap_pressure",
    oracle="""
SELECT server,
       floor(used_heap_mb / max_heap_mb * 100 * 100.0 + 0.5) / 100.0 AS heap_pct,
       'CRITICAL' AS severity
FROM server_metrics
WHERE used_heap_mb / max_heap_mb > 0.8
""",
    views=["server_metrics"],
)
def report_heap_pressure(m: Model) -> DataFrame:
    """F8 — servers above 80% heap."""
    return (
        m.server_metrics.filter(F.col("used_heap_mb") / F.col("max_heap_mb") > 0.8)
        .select(
            "server",
            fround(F.col("used_heap_mb") / F.col("max_heap_mb") * 100, 2).alias("heap_pct"),
            F.lit("CRITICAL").alias("severity"),
        )
    )


# ---------------------------------------------------------------------------
# F9/X6 — regions in transition
# (report/reports/RegionInTransitionReporter.java:26-37)
# ---------------------------------------------------------------------------

@query(
    "report_rit_stuck",
    oracle=f"""
SELECT region_id, state,
       CAST(floor((floor(epoch({EVENTS_AS_OF})) - floor(epoch(stamp_ts))) / 60.0) AS BIGINT)
         AS minutes_in_transition
FROM rit
WHERE (floor(epoch({EVENTS_AS_OF})) - floor(epoch(stamp_ts))) / 60.0 > 1
""",
    views=["rit"],
)
def report_rit_stuck(m: Model) -> DataFrame:
    """F9 — regions in transition for more than a minute."""
    now_s = F.unix_timestamp(F.lit(EVENTS_AS_OF_LIT).cast("timestamp"))
    age_min = (now_s - F.unix_timestamp(F.col("stamp_ts"))) / 60.0
    return (
        m.rit.withColumn("minutes_in_transition", F.floor(age_min).cast("bigint"))
        .filter(age_min > 1)
        .select("region_id", "state", "minutes_in_transition")
    )


# ---------------------------------------------------------------------------
# F1/A8/X8 — biggest regions
# (report/reports/BiggestRegionsReporter.java:34-79,142-158)
# ---------------------------------------------------------------------------

_BIGGEST_SQL = """
SELECT region_id, table_name, server,
       round(size_mb, 4) AS size_mb,
       CASE WHEN size_mb > 2048 THEN 'CRITICAL' ELSE 'NORMAL' END AS severity,
       concat('split_region ', table_name, ':', CAST(region_id AS {STR})) AS resolution
FROM region_metrics
WHERE size_mb > 1024
"""


@query(
    "report_biggest_regions",
    oracle=_BIGGEST_SQL.format(STR="VARCHAR"),
    views=["region_metrics"],
)
def report_biggest_regions(m: Model) -> DataFrame:
    """F1 — oversized regions with severity + split resolution."""
    return (
        m.region_metrics.filter(F.col("size_mb") > 1024)
        .select(
            "region_id",
            "table_name",
            "server",
            F.round("size_mb", 4).alias("size_mb"),
            F.when(F.col("size_mb") > 2048, "CRITICAL").otherwise("NORMAL").alias("severity"),
            F.concat(
                F.lit("split_region "),
                F.col("table_name"),
                F.lit(":"),
                F.col("region_id").cast("string"),
            ).alias("resolution"),
        )
    )


@query(
    "report_biggest_rollup",
    oracle=f"""
SELECT table_name,
       CAST(sum(CASE WHEN severity = 'CRITICAL' THEN 1 ELSE 0 END) AS BIGINT) AS critical,
       CAST(sum(CASE WHEN severity = 'NORMAL' THEN 1 ELSE 0 END) AS BIGINT)   AS normal,
       CAST(sum(CASE WHEN severity = 'CRITICAL' THEN 10 ELSE 1 END) AS BIGINT) AS weight
FROM ({_BIGGEST_SQL.format(STR="VARCHAR")}) ev
GROUP BY table_name
""",
    views=["region_metrics"],
)
def report_biggest_rollup(m: Model) -> DataFrame:
    """A8 — weighted severity counts per table:
    weight = 10*critical + normal (BiggestRegionsReporter.java:142-158)."""
    ev = report_biggest_regions(m)
    crit = F.when(F.col("severity") == "CRITICAL", 1).otherwise(0)
    return ev.groupBy("table_name").agg(
        F.sum(crit).alias("critical"),
        F.sum(1 - crit).alias("normal"),
        F.sum(F.when(F.col("severity") == "CRITICAL", 10).otherwise(1)).alias("weight"),
    )


# ---------------------------------------------------------------------------
# X10 — severity tier cascades over server gauges
# (report/reports/CompactionsReporter.java:66-68, RSLocalityReporter.java:71-73)
# ---------------------------------------------------------------------------

@query(
    "report_compaction_queues",
    oracle="""
SELECT server, compaction_queue, flush_queue,
       CASE WHEN compaction_queue > 15 THEN 'CRITICAL'
            WHEN compaction_queue > 10 THEN 'NORMAL'
            WHEN compaction_queue > 5  THEN 'LOW'
            ELSE 'OK' END AS compaction_severity,
       CASE WHEN flush_queue > 31 THEN 'CRITICAL'
            WHEN flush_queue > 15 THEN 'NORMAL'
            ELSE 'OK' END AS flush_severity
FROM server_metrics
""",
    views=["server_metrics"],
)
def report_compaction_queues(m: Model) -> DataFrame:
    """X10 — tiered severity on JMX queue gauges."""
    return m.server_metrics.select(
        "server",
        "compaction_queue",
        "flush_queue",
        F.when(F.col("compaction_queue") > 15, "CRITICAL")
        .when(F.col("compaction_queue") > 10, "NORMAL")
        .when(F.col("compaction_queue") > 5, "LOW")
        .otherwise("OK")
        .alias("compaction_severity"),
        F.when(F.col("flush_queue") > 31, "CRITICAL")
        .when(F.col("flush_queue") > 15, "NORMAL")
        .otherwise("OK")
        .alias("flush_severity"),
    ).orderBy("server")


@query(
    "report_locality",
    oracle="""
SELECT server,
       floor(avg(locality) * 100 * 10000.0 + 0.5) / 10000.0 AS locality_pct,
       CASE WHEN avg(locality) * 100 < 65 THEN 'CRITICAL'
            WHEN avg(locality) * 100 < 85 THEN 'NORMAL'
            WHEN avg(locality) * 100 < 95 THEN 'LOW'
            ELSE 'OK' END AS severity
FROM region_metrics
GROUP BY server
""",
    views=["region_metrics"],
)
def report_locality(m: Model) -> DataFrame:
    """X10 — per-server locality with the reference's <65/<85/<95 tiers
    (RSLocalityReporter.java:71-73)."""
    pct = F.avg("locality") * 100
    return (
        m.region_metrics.groupBy("server")
        .agg(
            fround(pct, 4).alias("locality_pct"),
            F.when(pct < 65, "CRITICAL")
            .when(pct < 85, "NORMAL")
            .when(pct < 95, "LOW")
            .otherwise("OK")
            .alias("severity"),
        )
        .orderBy("server")
    )


# ---------------------------------------------------------------------------
# A8 — ComplexReport global roll-up (report/ComplexReport.java:14-31)
# ---------------------------------------------------------------------------

_EVENTS_UNION_SQL = f"""
SELECT severity FROM ({_BIGGEST_SQL.format(STR="VARCHAR")}) b
UNION ALL
SELECT 'CRITICAL' AS severity FROM server_metrics WHERE used_heap_mb / max_heap_mb > 0.8
UNION ALL
SELECT 'NORMAL' AS severity FROM rit
WHERE (floor(epoch({EVENTS_AS_OF})) - floor(epoch(stamp_ts))) / 60.0 > 1
"""


@query(
    "report_complex_rollup",
    oracle=f"""
SELECT
  CAST(sum(CASE WHEN severity = 'CRITICAL' THEN 1 ELSE 0 END) AS BIGINT) AS critical,
  CAST(sum(CASE WHEN severity = 'NORMAL' THEN 1 ELSE 0 END) AS BIGINT)   AS normal,
  CAST(sum(CASE WHEN severity NOT IN ('CRITICAL','NORMAL') THEN 1 ELSE 0 END) AS BIGINT) AS low,
  CAST(sum(CASE WHEN severity = 'CRITICAL' THEN 9
           WHEN severity = 'NORMAL' THEN 3 ELSE 1 END) AS BIGINT)   AS weight,
  CASE WHEN sum(CASE WHEN severity = 'CRITICAL' THEN 9
                     WHEN severity = 'NORMAL' THEN 3 ELSE 1 END) > 100 THEN 'CRITICAL'
       WHEN sum(CASE WHEN severity = 'CRITICAL' THEN 9
                     WHEN severity = 'NORMAL' THEN 3 ELSE 1 END) > 30 THEN 'WARNING'
       ELSE 'OK' END AS cluster_state
FROM ({_EVENTS_UNION_SQL}) ev
""",
    views=["region_metrics", "server_metrics", "rit"],
)
def report_complex_rollup(m: Model) -> DataFrame:
    """A8 — cluster state: 9*critical + 3*normal + low over the union of
    report events (ComplexReport.java:14-31)."""
    big = report_biggest_regions(m).select("severity")
    heap = report_heap_pressure(m).select("severity")
    rit = report_rit_stuck(m).select(F.lit("NORMAL").alias("severity"))
    ev = big.unionAll(heap).unionAll(rit)
    w = (
        F.when(F.col("severity") == "CRITICAL", 9)
        .when(F.col("severity") == "NORMAL", 3)
        .otherwise(1)
    )
    agg = ev.agg(
        F.sum(F.when(F.col("severity") == "CRITICAL", 1).otherwise(0)).alias("critical"),
        F.sum(F.when(F.col("severity") == "NORMAL", 1).otherwise(0)).alias("normal"),
        F.sum(
            F.when(~F.col("severity").isin("CRITICAL", "NORMAL"), 1).otherwise(0)
        ).alias("low"),
        F.sum(w).alias("weight"),
    )
    return agg.select(
        "critical",
        "normal",
        "low",
        "weight",
        F.when(F.col("weight") > 100, "CRITICAL")
        .when(F.col("weight") > 30, "WARNING")
        .otherwise("OK")
        .alias("cluster_state"),
    )


# ---------------------------------------------------------------------------
# W5 — PARTIAL-report truncation (report/PartialReport.java:16,23-28)
# ---------------------------------------------------------------------------

@query(
    "report_partial_top15",
    oracle=f"""
SELECT table_name, region_id, size_mb, severity, rn AS event_rank
FROM (
  SELECT table_name, region_id, size_mb, severity,
         row_number() OVER (PARTITION BY table_name ORDER BY size_mb DESC, region_id) AS rn
  FROM ({_BIGGEST_SQL.format(STR="VARCHAR")}) ev
) t
WHERE rn <= 15
""",
    views=["region_metrics"],
)
def report_partial_top15(m: Model) -> DataFrame:
    """W5 — keep the first 15 events per report, ordered by severity key."""
    ev = report_biggest_regions(m)
    w = Window.partitionBy("table_name").orderBy(F.desc("size_mb"), F.asc("region_id"))
    return (
        ev.withColumn("event_rank", F.row_number().over(w))
        .filter(F.col("event_rank") <= 15)
        .select("table_name", "region_id", "size_mb", "severity", "event_rank")
    )
