"""Flagship scan->filter->aggregate query (TPC-H Q1 shape).

This is the engine's "pricing summary" headline: a single wide scan with
grouped decimal-exact aggregation.  It is the smallest query that
exercises the whole execution path the reference's table_analyzer tool
walks (analyze/TableAnalyzer.java:51-70: fetch -> join -> aggregate ->
sort), expressed as one declarative plan so Catalyst gives us pushdown,
pruning and whole-stage codegen for free.

Scale notes (100 TB): pure map-side scan + partial aggregation into a
4-group final agg — no shuffle besides the tiny final exchange; parquet
scan prunes to the 7 referenced columns (verify via
``df.explain('formatted')`` → ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Model
from ..registry import query

_CUTOFF = "1998-09-02 00:00:00"


@query(
    "pricing_summary",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
  count(*)                                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
    views=[],
)
def pricing_summary(m: Model) -> DataFrame:
    """Grouped pricing summary over lineitem (scan, filter, agg, sort).

    Sums are exact via scaled-BIGINT accumulation (inputs have <= 2
    decimals; products rounded to the 1e-6 grid identically in both
    engines): order-independent integer sums, with int->double and the
    final division deterministic IEEE ops.  Chosen over DECIMAL sums,
    which are equally exact but cost ~0.25 s of codegen per aggregate
    per plan."""
    li = m.lineitem.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp"))

    def ssum(col, scale):
        return (
            F.sum(F.floor(col * scale + 0.5).cast("bigint")).cast("double") / scale
        )

    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            ssum(F.col("l_quantity"), 100.0).alias("sum_qty"),
            ssum(F.col("l_extendedprice"), 100.0).alias("sum_base_price"),
            ssum(disc, 1000000.0).alias("sum_disc_price"),
            ssum(charge, 1000000.0).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
