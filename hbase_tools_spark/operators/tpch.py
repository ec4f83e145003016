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
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE)            AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE)       AS sum_base_price,
  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))), 4) AS DOUBLE) AS sum_disc_price,
  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,8))), 4) AS DOUBLE) AS sum_charge,
  count(*)                                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
    views=[],
)
def pricing_summary(m: Model) -> DataFrame:
    """Grouped pricing summary over lineitem (scan, filter, agg, sort)."""
    li = m.lineitem.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp"))
    dec = lambda c, p, s: c.cast(f"decimal({p},{s})")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # decimal-exact sums; round-4 before the double cast keeps the
            # unscaled value < 2^53 so decimal->double is bit-identical
            # between Spark and DuckDB (1-ULP divergence otherwise)
            F.round(F.sum(dec(F.col("l_quantity"), 18, 4)), 4).cast("double").alias("sum_qty"),
            F.round(F.sum(dec(F.col("l_extendedprice"), 18, 4)), 4).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 22, 6)), 4
            ).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(
                    dec(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * (1 + F.col("l_tax")),
                        22,
                        8,
                    )
                ),
                4,
            ).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
