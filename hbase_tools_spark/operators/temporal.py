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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Generic sorted as-of join (the operator behind floorEntry,
    meta/TechnicalMeta.java:156, generalized to a probe RELATION):
    each left row is matched to the right row with the greatest
    right_ts <= left_ts for its key.

    Spark-first shape: union both sides tagged, one window pass
    partitioned by key and ordered by (ts, right-first-on-tie), carry
    the last seen right row forward with ``last(ignorenulls)``, keep
    left rows.  One shuffle on the join key, no per-row subquery, no
    range join — the plan scales like a groupBy, and a hot key is
    still a single partition's sort (salt the key upstream if one key
    dominates).  Right columns come back nested under ``__r``.
    Left rows before any right row are dropped (inner as-of)."""
    from pyspark.sql.window import Window

    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns if c != key]
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__r_side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*rcols).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__r_side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*rcols).alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__r_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_tag.unionByName(r_tag)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter((F.col("__r_side") == 0) & F.col("__match").isNotNull())
        .select("__l.*", F.col("__match").alias("__r"))
    )


@query(
    "events_asof_assignment",
    oracle="""
SELECT event_id,
       CAST(floor(epoch(e_ts)) AS BIGINT) AS event_ts,
       region_id,
       server,
       CAST(floor(epoch(t_ts)) AS BIGINT) AS snapshot_ts
FROM (
  SELECT e.event_id, e.ts AS e_ts, t.region_id, t.server, t.snapshot_ts AS t_ts
  FROM (SELECT event_id, ts, event_id % 500 AS region_id FROM events) e
  ASOF JOIN topology t
    ON e.region_id = t.region_id AND t.snapshot_ts <= e.ts
) j
""",
    views=["topology"],
)
def events_asof_assignment(m: Model) -> DataFrame:
    """J7 generalized — as-of join of the event stream to the topology
    history: which server hosted each event's region at event time.
    DuckDB's native ASOF JOIN is the oracle; the Spark side is the
    union+window sorted as-of (no per-row subquery, one shuffle)."""
    probes = m.events.select(
        "event_id", "ts", (F.col("event_id") % 500).alias("region_id")
    )
    topo = m.topology.select("region_id", "snapshot_ts", "server")
    joined = asof_join(probes, topo, key="region_id", left_ts="ts", right_ts="snapshot_ts")
    return joined.select(
        "event_id",
        F.unix_timestamp("ts").alias("event_ts"),
        "region_id",
        F.col("__r.server").alias("server"),
        F.unix_timestamp("__r.snapshot_ts").alias("snapshot_ts"),
    )
