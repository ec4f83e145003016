"""Key-tool operators (M5): SURVEY.md §2 IDs X1/X2/X4 — the byte-level
UDF surface, hash-verified against DuckDB despite DuckDB lacking CRC32:

* ``salted_keys`` restricts itself to the deterministic key set
  ``c_custkey < 100`` (present at every scale factor; TPC-H names are
  ``Customer#%09d``), so the oracle is a golden VALUES relation
  precomputed at import time by the same pure functions the golden
  vectors in tests/test_keys.py certify against the reference port
  (common/KeyGenerator.java:27-49).  The oracle still JOINs the real
  ``customer`` table, so the row set comes from the data on both sides.
* ``split_points`` midpoints are plain big-integer math
  (splitter/TableSplitter.java:95-112), which DuckDB can compute
  exactly in HUGEINT (keys are 12-byte ASCII, so values < 2^96):
  Horner-fold the bytes, average, render hex — a fully computed
  oracle, not a golden table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Model
from ..functions.keys import (
    midpoint_key_hex,
    salt_key_bytes,
    salted_key_hex,
    salted_key_printable,
    to_string_binary,
)
from ..registry import query

_N_SALT_KEYS = 100  # c_custkey < 100 exists at every fixture SF


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _salted_golden_values() -> str:
    """Golden VALUES rows for the deterministic TPC-H key set, computed
    by the same pure functions the property tests certify."""
    rows = []
    for ck in range(_N_SALT_KEYS):
        name = f"Customer#{ck:09d}"
        raw = salt_key_bytes(name.encode("utf-8"))
        rows.append(
            f"({ck}, {_sql_quote(raw.hex())}, "
            f"{_sql_quote(to_string_binary(raw))})"
        )
    return ",\n".join(rows)


@query(
    "salted_keys",
    oracle=f"""
SELECT c.c_custkey, c.c_name AS row_key, v.salted_hex, v.salted_printable
FROM customer c
JOIN (VALUES
{_salted_golden_values()}
) v(ck, salted_hex, salted_printable) ON v.ck = c.c_custkey
WHERE c.c_custkey < {_N_SALT_KEYS}
""",
    views=[],
)
def salted_keys(m: Model) -> DataFrame:
    """X1+X2 — salted probe keys for customer names
    (common/KeyGenerator.java:27-49, KeyGeneratorRunner.java:8-15):
    CRC32-derived 4-byte salt + swapped-tail layout, rendered as hex and
    HBase printable forms.  Arrow-batched pandas UDF — the vectorized
    Python path; at 100 TB this stays fully data-parallel (pure per-row
    function, no shuffle).  Deterministic key subset so the golden
    VALUES oracle hash-matches."""
    return m.customer.filter(F.col("c_custkey") < _N_SALT_KEYS).select(
        "c_custkey",
        F.col("c_name").alias("row_key"),
        salted_key_hex(F.col("c_name")).alias("salted_hex"),
        salted_key_printable(F.col("c_name")).alias("salted_printable"),
    )


# Big-endian byte value of a 12-char ASCII key as HUGEINT (Horner fold —
# exact integer math, no floating 256^i), and the unbounded-end default
# 8 x 0xFF = (2^64 - 1) << 32 at the common 12-byte width.
_KEY_INT = (
    "list_reduce(list_transform(range(1, 13), "
    "i -> CAST(ascii(substring({k}, i, 1)) AS HUGEINT)), (a, b) -> a * 256 + b)"
)
_FF8_PADDED = "CAST(18446744073709551615 AS HUGEINT) * 4294967296"
_POW48 = 281474976710656  # 2^48: split the 96-bit midpoint for to_hex


@query(
    "split_points",
    oracle=f"""
SELECT table_name, region_id, start_key, end_key,
       lpad(lower(to_hex(CAST(mid // {_POW48} AS BIGINT))), 12, '0') ||
       lpad(lower(to_hex(CAST(mid % {_POW48} AS BIGINT))), 12, '0')
         AS split_point_hex
FROM (
  SELECT table_name, region_id, start_key, end_key,
         ({_KEY_INT.format(k='start_key')} +
          CASE WHEN end_key = '' THEN {_FF8_PADDED}
               ELSE {_KEY_INT.format(k='end_key')} END) // 2 AS mid,
         row_number() OVER (
           PARTITION BY table_name
           ORDER BY size_mb DESC, region_id
         ) AS rn
  FROM (
    SELECT mr.table_name, mr.region_id, mr.start_key, mr.end_key,
           coalesce(rm.size_mb, 0.0) AS size_mb
    FROM meta_regions mr
    LEFT JOIN region_metrics rm ON rm.region_id = mr.region_id
  ) sized
) t
WHERE rn = 1
""",
    views=["meta_regions", "region_metrics"],
)
def split_points(m: Model) -> DataFrame:
    """X4+W3 — split points for the biggest region per table: midpoint of
    [start_key, end_key) as big-endian unsigned integers with the
    reference's 8x0xFF unbounded-end default
    (splitter/TableSplitter.java:95-112).  Oracle computes the same
    midpoint in exact HUGEINT arithmetic."""
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
