"""Join-family operators (M4/M5 support): SURVEY.md §2 IDs J1, J2, J5,
J8 (in planners), SC3, F6.

Scale notes: J1 joins two region-cardinality relations on region_id —
both sides shuffle-partition on the join key (or co-bucket in storage);
J5 broadcasts the region dimension (meta is O(regions), small relative
to probe streams and naturally broadcastable per table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Model
from ..registry import query


@query(
    "region_health_join",
    oracle="""
SELECT mr.region_id, mr.table_name, mr.server,
       coalesce(rm.size_mb, 0.0)      AS size_mb,
       coalesce(rm.file_count, 0)     AS file_count,
       (rm.region_id IS NOT NULL)     AS has_metrics
FROM meta_regions mr
LEFT JOIN region_metrics rm ON mr.region_id = rm.region_id
""",
    views=["meta_regions", "region_metrics"],
)
def region_health_join(m: Model) -> DataFrame:
    """J1 — region-info ⋈ region-metrics with moved-region tolerance: a
    missing metrics row means the region moved between the meta scan and
    the metrics fetch (analyze/TableAnalyzer.java:174-203); left join +
    has_metrics flag instead of dropping."""
    rm = m.region_metrics.select("region_id", "size_mb", "file_count")
    return m.meta_regions.join(rm, "region_id", "left").select(
        "region_id",
        "table_name",
        "server",
        F.coalesce(F.col("size_mb"), F.lit(0.0)).alias("size_mb"),
        F.coalesce(F.col("file_count"), F.lit(0)).alias("file_count"),
        F.col("size_mb").isNotNull().alias("has_metrics"),
    )


@query(
    "moved_regions_audit",
    oracle="""
SELECT mr.region_id, mr.table_name, mr.server
FROM meta_regions mr
LEFT JOIN region_metrics rm ON mr.region_id = rm.region_id
WHERE rm.region_id IS NULL
""",
    views=["meta_regions", "region_metrics"],
)
def moved_regions_audit(m: Model) -> DataFrame:
    """J1-audit — regions in meta with no metrics ('moved region' log in
    the reference, compactor/CompactorServer.java:194-208)."""
    return m.meta_regions.join(
        m.region_metrics.select("region_id"), "region_id", "left_anti"
    ).select("region_id", "table_name", "server")


@query(
    "metrics_semi_join",
    oracle="""
SELECT rm.region_id, rm.server, rm.size_mb, rm.file_count
FROM region_metrics rm
SEMI JOIN (SELECT region_id FROM meta_regions WHERE table_name = 't3') t
  ON rm.region_id = t.region_id
""",
    views=["meta_regions", "region_metrics"],
)
def metrics_semi_join(m: Model) -> DataFrame:
    """J2 — restrict cluster-wide metrics to one table's region set
    (splitter/TableSplitter.java:150-174)."""
    t3 = m.meta_regions.filter(F.col("table_name") == "t3").select("region_id")
    return m.region_metrics.join(t3, "region_id", "semi").select(
        "region_id", "server", "size_mb", "file_count"
    )


_GRID_BLOCK = 10000  # key units per grid cell


@query(
    "range_lookup",
    oracle="""
SELECT c.c_custkey,
       lpad(CAST(c.c_custkey * 10 AS VARCHAR), 12, '0') AS probe_key,
       mr.region_id
FROM customer c
JOIN (SELECT * FROM meta_regions WHERE table_name = 't0') mr
  ON lpad(CAST(c.c_custkey * 10 AS VARCHAR), 12, '0') >= mr.start_key
 AND (mr.end_key = '' OR lpad(CAST(c.c_custkey * 10 AS VARCHAR), 12, '0') < mr.end_key)
""",
    views=["meta_regions"],
)
def range_lookup(m: Model) -> DataFrame:
    """J5 — point-in-range lookup: locate the region whose [start,end)
    contains each probe key (common/KeyFinder.java:24-46).

    Grid range join: regions explode into the fixed-width key blocks
    they overlap (the grid is broadcast — blocks ≈ keyspace/B +
    regions, tiny for a dim table), probes compute their block and
    equi-join on it, and the exact [start,end) predicate filters the
    1-2 candidates per probe.  This replaces the |probes| x |regions|
    broadcast nested-loop with a codegen'd hash join — the probe side
    still never shuffles.  The unbounded-end region (at most one per
    table) is handled by a separate single-row broadcast join.  (Two
    rejected alternatives, both measured slower: plain broadcast-NL —
    28M predicate evaluations; a boundary-array floor join — 20x worse
    because higher-order array functions are interpreted.)"""
    probes = m.customer.select(
        "c_custkey",
        F.lpad((F.col("c_custkey") * 10).cast("string"), 12, "0").alias("probe_key"),
    ).withColumn(
        "block", (F.col("probe_key").cast("long") / _GRID_BLOCK).cast("long")
    )
    regions = (
        m.meta_regions.filter(F.col("table_name") == "t0")
        .select("region_id", "start_key", "end_key")
    )
    bounded = regions.filter(F.col("end_key") != "")
    grid = bounded.select(
        "region_id",
        "start_key",
        "end_key",
        F.explode(
            F.sequence(
                (F.col("start_key").cast("long") / _GRID_BLOCK).cast("long"),
                (F.col("end_key").cast("long") / _GRID_BLOCK).cast("long"),
            )
        ).alias("block"),
    )
    in_range = (F.col("probe_key") >= F.col("start_key")) & (
        F.col("probe_key") < F.col("end_key")
    )
    hits_bounded = (
        probes.join(F.broadcast(grid), "block")
        .filter(in_range)
        .select("c_custkey", "probe_key", "region_id")
    )
    unbounded = regions.filter(F.col("end_key") == "")
    hits_unbounded = (
        probes.join(
            F.broadcast(unbounded), F.col("probe_key") >= F.col("start_key")
        )
        .select("c_custkey", "probe_key", "region_id")
    )
    return hits_bounded.unionByName(hits_unbounded)


@query(
    "region_bounds",
    oracle="""
SELECT table_name,
       min(start_key) AS first_key,
       max(start_key) AS last_key,
       count(*)       AS regions
FROM meta_regions
GROUP BY table_name
""",
    views=["meta_regions"],
)
def region_bounds(m: Model) -> DataFrame:
    """SC3 — first/last key probe per table: the reference's limit-1
    forward + reversed scans (common/HBaseRegionChecker.java:44-71)
    collapse to min/max aggregates (no physical reverse scan needed)."""
    return (
        m.meta_regions.groupBy("table_name")
        .agg(
            F.min("start_key").alias("first_key"),
            F.max("start_key").alias("last_key"),
            F.count(F.lit(1)).alias("regions"),
        )
    )


@query(
    "server_prefix_resolve",
    oracle="""
SELECT prefix,
       CAST(count(*) AS BIGINT) AS matches,
       min(server) AS resolved_server,
       (count(*) = 1) AS unambiguous
FROM (
  SELECT p.prefix, s.server
  FROM (SELECT 's1' AS prefix UNION ALL SELECT 's2' UNION ALL SELECT 's') p
  JOIN servers s ON starts_with(s.server, p.prefix)
) j
GROUP BY prefix
""",
    views=["servers"],
)
def server_prefix_resolve(m: Model) -> DataFrame:
    """F6 — resolve servers by host:port prefix; exactly one match is
    required (HBaseToolsHelper.java:54-94).  Emits match counts + the
    unambiguous flag instead of throwing."""
    prefixes = m.spark.createDataFrame([("s1",), ("s2",), ("s",)], ["prefix"])
    joined = prefixes.join(
        m.servers, F.col("server").startswith(F.col("prefix"))
    )
    return joined.groupBy("prefix").agg(
        F.count(F.lit(1)).alias("matches"),
        F.min("server").alias("resolved_server"),
        (F.count(F.lit(1)) == 1).alias("unambiguous"),
    )


@query(
    "region_edge_rows",
    oracle="""
SELECT table_name,
       min(start_key) AS first_key,
       min_by(region_id, start_key) AS first_region,
       min_by(server, start_key) AS first_server,
       max(start_key) AS last_key,
       max_by(region_id, start_key) AS last_region,
       max_by(server, start_key) AS last_server
FROM meta_regions
GROUP BY table_name
""",
    views=["meta_regions"],
)
def region_edge_rows(m: Model) -> DataFrame:
    """SC3 full-row form — the reference's first/last-row probes return
    whole rows, not just keys (forward scan limit 1 + reversed scan,
    common/HBaseRegionChecker.java:44-71); ``min_by``/``max_by`` fetch
    the complete edge rows in ONE aggregation pass, replacing the
    reference's physical reversed scan (SURVEY §4: no reverse scan
    needed under an aggregate)."""
    return m.meta_regions.groupBy("table_name").agg(
        F.min("start_key").alias("first_key"),
        F.min_by("region_id", "start_key").alias("first_region"),
        F.min_by("server", "start_key").alias("first_server"),
        F.max("start_key").alias("last_key"),
        F.max_by("region_id", "start_key").alias("last_region"),
        F.max_by("server", "start_key").alias("last_server"),
    )
