"""Temporal topology operators (M4): the technical-meta history —
SURVEY.md §2 IDs SC4, J3/SET2, J7, S8, F5/X7.

The reference persists hourly topology snapshots as rows with
``server_<epochMillis>`` qualifiers (meta/TechnicalMeta.java:160-186),
rebuilds a NavigableMap of topologies (:130-158) and answers as-of
queries via floorEntry (:156).  Spark model: an append-only
``topology(snapshot_ts, region_id, server)`` relation partitioned by
snapshot_ts; as-of = max-ts<=t aggregation; TTL = partition retention.

Scale: diffs and as-of are per-region aggregations/joins keyed on
region_id — shuffle-partitioned by the natural high-cardinality key; the
snapshot filter prunes partitions before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Model
from ..registry import query

ASOF_T = "2024-01-15 12:30:00"
RETENTION_CUTOFF = "2024-01-24 00:00:00"  # EVENTS_AS_OF - 7 days (S8 TTL)


@query(
    "topology_diff",
    oracle="""
SELECT server, region_id, diff_type
FROM (
  SELECT cur.server, cur.region_id, 'IN' AS diff_type
  FROM (SELECT * FROM topology
        WHERE snapshot_ts = (SELECT max(snapshot_ts) FROM topology)) cur
  LEFT JOIN (SELECT * FROM topology
             WHERE snapshot_ts = (SELECT min(snapshot_ts) FROM topology)) prev
    ON cur.server = prev.server AND cur.region_id = prev.region_id
  WHERE prev.region_id IS NULL
  UNION ALL
  SELECT prev.server, prev.region_id, 'OUT' AS diff_type
  FROM (SELECT * FROM topology
        WHERE snapshot_ts = (SELECT min(snapshot_ts) FROM topology)) prev
  LEFT JOIN (SELECT * FROM topology
             WHERE snapshot_ts = (SELECT max(snapshot_ts) FROM topology)) cur
    ON cur.server = prev.server AND cur.region_id = prev.region_id
  WHERE cur.region_id IS NULL
) d
""",
    views=["topology"],
)
def topology_diff(m: Model) -> DataFrame:
    """J3/SET2 — typed IN/OUT delta between the earliest and latest
    topology snapshots (meta/ClusterTopology.java:45-71): (server,region)
    pairs present now but not before are IN, vice versa OUT."""
    topo = m.topology
    bounds = topo.agg(
        F.min("snapshot_ts").alias("first_ts"), F.max("snapshot_ts").alias("last_ts")
    )
    cur = topo.join(
        F.broadcast(bounds), topo.snapshot_ts == bounds.last_ts
    ).select("server", "region_id")
    prev = topo.join(
        F.broadcast(bounds), topo.snapshot_ts == bounds.first_ts
    ).select("server", "region_id")
    ins = cur.join(prev, ["server", "region_id"], "left_anti").withColumn(
        "diff_type", F.lit("IN")
    )
    outs = prev.join(cur, ["server", "region_id"], "left_anti").withColumn(
        "diff_type", F.lit("OUT")
    )
    return ins.unionAll(outs)


@query(
    "topology_asof",
    oracle=f"""
SELECT region_id,
       arg_max(server, snapshot_ts)                          AS server,
       CAST(floor(epoch(max(snapshot_ts))) AS BIGINT)        AS asof_epoch
FROM topology
WHERE snapshot_ts <= TIMESTAMP '{ASOF_T}'
GROUP BY region_id
""",
    views=["topology"],
)
def topology_asof(m: Model) -> DataFrame:
    """J7 — per-region as-of lookup: the assignment effective at time t is
    the snapshot with the greatest ts <= t (floorEntry semantics,
    meta/TechnicalMeta.java:156).  max_by keeps it one aggregation — no
    self-join; at 100 TB this is the sort-merge-free as-of pattern."""
    return (
        m.topology.filter(F.col("snapshot_ts") <= F.lit(ASOF_T).cast("timestamp"))
        .groupBy("region_id")
        .agg(
            F.max_by("server", "snapshot_ts").alias("server"),
            F.unix_timestamp(F.max("snapshot_ts")).alias("asof_epoch"),
        )
    )


@query(
    "topology_parse",
    oracle="""
SELECT region_id,
       CAST(split_part(qualifier, '_', 2) AS BIGINT) AS snapshot_epoch,
       server
FROM (
  SELECT region_id, server,
         concat('server_', CAST(CAST(floor(epoch(snapshot_ts)) AS BIGINT) AS VARCHAR))
           AS qualifier
  FROM topology
) q
WHERE starts_with(qualifier, 'server_')
""",
    views=["topology"],
)
def topology_parse(m: Model) -> DataFrame:
    """SC4+F5+X7 — round-trip the reference's dynamic-qualifier encoding:
    build ``server_<epoch>`` qualifiers, prefix-filter, parse the epoch
    back out (meta/TechnicalMeta.java:142-146)."""
    withq = m.topology.select(
        "region_id",
        "server",
        F.concat(
            F.lit("server_"), F.unix_timestamp("snapshot_ts").cast("string")
        ).alias("qualifier"),
    )
    return withq.filter(F.col("qualifier").startswith("server_")).select(
        "region_id",
        F.split("qualifier", "_").getItem(1).cast("bigint").alias("snapshot_epoch"),
        "server",
    )


@query(
    "topology_retention",
    oracle=f"""
SELECT CAST(floor(epoch(snapshot_ts)) AS BIGINT) AS snapshot_epoch,
       count(*) AS assignments
FROM topology
WHERE snapshot_ts >= TIMESTAMP '{RETENTION_CUTOFF}'
GROUP BY 1
""",
    views=["topology"],
)
def topology_retention(m: Model) -> DataFrame:
    """S8 — retention filter: keep snapshots inside the 7-day TTL window
    (technical.meta.table.record.ttl.millis=604800000); at scale this is
    a partition-prune + delete of expired snapshot_ts partitions."""
    return (
        m.topology.filter(
            F.col("snapshot_ts") >= F.lit(RETENTION_CUTOFF).cast("timestamp")
        )
        .groupBy(F.unix_timestamp("snapshot_ts").alias("snapshot_epoch"))
        .agg(F.count(F.lit(1)).alias("assignments"))
    )
