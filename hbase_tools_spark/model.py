"""Shared data model: derive the reference's metadata relations from the
TPC-H-ish fixture tables (FIXTURES.md mapping).

The reference (NorsaG/hbase-tools) computes over cluster-metadata
relations -- ``hbase:meta`` regions (meta/MetaTableInfoService.java:54-72),
per-region load metrics (analyze/TableAnalyzer.java:174-203), per-server
gauges (jmx/JMXRegionServerMetrics.java:38-48), snapshot lists
(report/reports/SnapshotsReport.java:31-46), regions-in-transition
(report/reports/RegionInTransitionReporter.java:26-37) and topology
history (meta/TechnicalMeta.java:130-158).  We model each as a DataFrame
derived deterministically from the driver fixtures.

Every derivation is written ONCE, in a SQL dialect common to Spark SQL
and DuckDB, so the Spark engine and the DuckDB oracle compute the same
relations by construction.  Dialect differences are handled with the
``{STR}`` placeholder (STRING vs VARCHAR).

Cross-engine float-safety rules used throughout this repo:
  * sums of doubles go through per-row ``CAST(.. AS DECIMAL)`` so the sum
    is exact in both engines regardless of partial-aggregation order;
  * ``floor()`` results are explicitly ``CAST(.. AS BIGINT)`` (Spark's
    floor returns BIGINT, DuckDB's returns DOUBLE, and double->int casts
    round differently between the engines);
  * timestamps are emitted as epoch-second BIGINTs in query outputs
    (session-timezone independent in both engines).
"""

from __future__ import annotations

BASE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Fixed "now" instants so staleness predicates are deterministic across
# engines and runs (orders span 1995..2001-08, events span 2024-01).
ORDERS_AS_OF_LIT = "2001-09-01 00:00:00"
EVENTS_AS_OF_LIT = "2024-01-31 00:00:00"
ORDERS_AS_OF = f"TIMESTAMP '{ORDERS_AS_OF_LIT}'"
EVENTS_AS_OF = f"TIMESTAMP '{EVENTS_AS_OF_LIT}'"

# ---------------------------------------------------------------------------
# Derived relation definitions (common Spark-SQL / DuckDB dialect).
# ---------------------------------------------------------------------------

VIEW_DEFS: dict[str, str] = {
    # region_metrics: one row per region with load facts.
    # Mirrors RegionMetrics fields used by analyze/TableAnalyzer.java:174-203
    # and compactor/CompactionWeight.java:9-12 (size, file count, locality,
    # memstore, max storefile size).  lineitem aggregated per order.
    "region_metrics": """
SELECT
  l_orderkey                                                         AS region_id,
  concat('t', CAST(l_orderkey % 8 AS {STR}))                         AS table_name,
  concat('s', CAST(l_orderkey % 10 AS {STR}))                        AS server,
  -- exact sums via scaled BIGINT (values have <= 4/0 decimals); the
  -- int sum is order-independent and < 2^53, so the final double is
  -- bit-identical in both engines.  (DECIMAL sums are equally exact
  -- but each decimal aggregate costs ~0.25 s of codegen per plan.)
  CAST(sum(CAST(floor(l_extendedprice / 100.0 * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 1000000.0                                                      AS size_mb,
  count(*)                                                           AS file_count,
  max(l_discount) * 10.0                                             AS locality,
  CAST(sum(CAST(floor(l_quantity * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 10000.0                                                        AS memstore_mb,
  max(l_extendedprice) / 100.0                                       AS max_file_mb
FROM lineitem
GROUP BY 1, 2, 3
""",
    # meta_regions: the hbase:meta catalog -- region id, table, hosting
    # server, [start_key, end_key) range; ranges are contiguous per table
    # (end = next region's start, '' for the last region), matching HBase
    # region semantics (common/HBaseRegionChecker.java:61-71).
    "meta_regions": """
SELECT region_id, table_name, server, start_key,
       coalesce(lead(start_key) OVER (PARTITION BY table_name ORDER BY start_key), '') AS end_key
FROM (
  SELECT o_orderkey                                  AS region_id,
         concat('t', CAST(o_orderkey % 8 AS {STR}))  AS table_name,
         concat('s', CAST(o_custkey % 10 AS {STR}))  AS server,
         lpad(CAST(o_orderkey AS {STR}), 12, '0')    AS start_key
  FROM orders
) base
""",
    # server_metrics: per-server gauges (ServerLoad + JMX):
    # report/reports/RegionHeapSizeReporter.java:25-28,
    # jmx/JMXRegionServerMetrics.java:38-48.
    "server_metrics": """
SELECT
  concat('s', CAST(s_suppkey % 10 AS {STR}))                 AS server,
  max(abs(s_acctbal))                                        AS used_heap_mb,
  CAST(10000.0 AS DOUBLE)                                    AS max_heap_mb,
  CAST(floor(max(abs(s_acctbal)) % 20) AS BIGINT)            AS compaction_queue,
  CAST(floor(max(abs(s_acctbal)) % 40) AS BIGINT)            AS flush_queue,
  round(max(abs(s_acctbal)) / 100.0, 4)                      AS pct_files_local
FROM supplier
GROUP BY 1
""",
    # snapshots: admin.listSnapshots() rows
    # (report/reports/SnapshotsReport.java:31-46).  Sparse: only some
    # tables have snapshots so the J9 guard is non-trivial.
    "snapshots": """
SELECT concat('t', CAST(o_custkey % 8 AS {STR}))   AS table_name,
       concat('snp_', CAST(o_orderkey AS {STR}))   AS snapshot_name,
       o_orderdate                                 AS created_ts
FROM orders
WHERE o_orderkey % 7 = 0 AND o_custkey % 8 < 5
""",
    # rit: regions-in-transition with state + stamp
    # (report/reports/RegionInTransitionReporter.java:26-37).
    "rit": """
SELECT event_id % 1000 AS region_id,
       CASE WHEN event_id % 3 = 0 THEN 'OPENING'
            WHEN event_id % 3 = 1 THEN 'CLOSING'
            ELSE 'FAILED_OPEN' END                AS state,
       ts                                         AS stamp_ts
FROM events
WHERE event_type = 'error'
""",
    # topology: time-series of (snapshot_ts, region -> server) assignments,
    # the Spark analog of the technical-meta topology history
    # (meta/TechnicalMeta.java:130-158).
    "topology": """
SELECT date_trunc('hour', ts)                        AS snapshot_ts,
       event_id % 500                                AS region_id,
       concat('s', CAST(max(user_id) % 10 AS {STR})) AS server
FROM events
GROUP BY 1, 2
""",
    # mutations: write-path log for SC11 last-write-wins dedup
    # (SequenceBufferedMutator.java:201-300): rowkey, qualifier, sequence,
    # value, delete-tombstone flag.
    "mutations": """
SELECT user_id                    AS row_key,
       event_type                 AS qualifier,
       event_id                   AS seq,
       round(value, 4)            AS val,
       (event_id % 11 = 0)        AS is_delete
FROM events
""",
    # servers: live-server dimension (ClusterMetrics.getLiveServerMetrics).
    "servers": """
SELECT DISTINCT concat('s', CAST(s_suppkey % 10 AS {STR})) AS server FROM supplier
""",
    # tables_dim: known-tables dimension (admin.listTableNames).
    "tables_dim": """
SELECT DISTINCT concat('t', CAST(o_orderkey % 8 AS {STR})) AS table_name FROM orders
""",
}

DERIVED_VIEWS = list(VIEW_DEFS)


def view_sql(name: str, dialect: str) -> str:
    """Render a derived-view definition for 'spark' or 'duckdb'."""
    if dialect == "spark":
        return VIEW_DEFS[name].format(STR="STRING").strip()
    if dialect == "duckdb":
        return VIEW_DEFS[name].format(STR="VARCHAR").strip()
    raise ValueError(f"unknown dialect {dialect!r}")


def oracle_with_views(sql: str, views: list[str] | None = None) -> str:
    """Prefix a DuckDB oracle query with CTEs for the derived views it
    uses (base fixture tables are pre-registered by the driver)."""
    names = views if views is not None else DERIVED_VIEWS
    if not names:
        return sql
    ctes = ",\n".join(f"{n} AS (\n{view_sql(n, 'duckdb')}\n)" for n in names)
    return f"WITH {ctes}\n{sql.strip()}"
