"""Key-tool operators (M5): SURVEY.md §2 IDs X1/X2/X4 — the byte-level
UDF surface.  No SQL oracle exists for these (DuckDB has no CRC32);
they are rows-only checked by the driver and golden/property-tested in
tests/test_keys.py against independent ports of the reference logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Model
from ..functions.keys import midpoint_key_hex, salted_key_hex, salted_key_printable
from ..registry import query


@query("salted_keys", oracle=None)
def salted_keys(m: Model) -> DataFrame:
    """X1+X2 — salted probe keys for customer names
    (common/KeyGenerator.java:27-49, KeyGeneratorRunner.java:8-15):
    CRC32-derived 4-byte salt + swapped-tail layout, rendered as hex and
    HBase printable forms.  Arrow-batched pandas UDF — the vectorized
    Python path; at 100 TB this stays fully data-parallel (pure per-row
    function, no shuffle)."""
    return m.customer.select(
        "c_custkey",
        F.col("c_name").alias("row_key"),
        salted_key_hex(F.col("c_name")).alias("salted_hex"),
        salted_key_printable(F.col("c_name")).alias("salted_printable"),
    )


@query("split_points", oracle=None)
def split_points(m: Model) -> DataFrame:
    """X4+W3 — split points for the biggest region per table: midpoint of
    [start_key, end_key) as big-endian unsigned integers with the
    reference's 8x0xFF unbounded-end default
    (splitter/TableSplitter.java:95-112)."""
    sized = m.meta_regions.join(
        m.region_metrics.select("region_id", "size_mb"), "region_id", "left"
    ).withColumn("size_mb", F.coalesce(F.col("size_mb"), F.lit(0.0)))
    w = Window.partitionBy("table_name").orderBy(F.desc("size_mb"), F.asc("region_id"))
    biggest = sized.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return biggest.select(
        "table_name",
        "region_id",
        "start_key",
        "end_key",
        midpoint_key_hex(F.col("start_key"), F.col("end_key")).alias("split_point_hex"),
    )
