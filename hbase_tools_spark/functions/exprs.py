"""Cross-engine-safe column expressions shared by the operators.

Each helper has a fixed DuckDB-SQL counterpart documented here; queries
must use these pairs so Spark results and DuckDB oracles match bit-for-
bit (see model.py float-safety rules).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_bigint(col: Column) -> Column:
    """Epoch seconds as BIGINT (floored).

    DuckDB counterpart: ``CAST(floor(epoch(col)) AS BIGINT)``.
    Requires the session timezone pinned to UTC (done by load_model).
    """
    return F.unix_timestamp(col)


def dsum(col: Column, precision: int = 18, scale: int = 4, out_round: int = 4) -> Column:
    """Order-independent exact sum of a double column.

    Per-row cast to DECIMAL makes the aggregation exact in both engines;
    round before the final double cast keeps the unscaled value < 2^53 so
    decimal->double conversion is bit-identical.

    DuckDB counterpart:
    ``CAST(round(sum(CAST(col AS DECIMAL(p,s))), r) AS DOUBLE)``.
    """
    return F.round(F.sum(col.cast(f"decimal({precision},{scale})")), out_round).cast(
        "double"
    )


def fround(col: Column, n: int) -> Column:
    """Cross-engine-identical rounding of an *arbitrary* double.

    Engine-native round() disagrees between Spark (exact-decimal HALF_UP
    of the binary value) and DuckDB (scale-multiply-round) in the last
    digit for values off the decimal grid.  ``floor(x*10^n + 0.5)/10^n``
    is the same IEEE op sequence in both engines, so results are
    bit-identical.  Use native round() only for decimal-backed values
    already on the rounding grid.

    DuckDB counterpart: ``floor(x * 1e{n} + 0.5) / 1e{n}``.
    """
    scale = float(10**n)
    return F.floor(col * scale + 0.5) / scale


def fround_sql(expr: str, n: int) -> str:
    """DuckDB/Spark-SQL fragment matching :func:`fround`."""
    scale = float(10**n)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def compaction_weight(
    size_mb: Column, max_file_mb: Column, file_count: Column, locality: Column
) -> Column:
    """X11 — the reference's compaction weight
    (compactor/CompactionWeight.java:39-44):
    ``(1-locality)*115 + ((size - maxStoreFile)/1024) * (fileCount*1.33)``,
    0 when size < 10 MB.

    DuckDB counterpart (inline SQL)::

        CASE WHEN size_mb < 10 THEN 0.0
             ELSE (1 - locality) * 115
                  + ((size_mb - max_file_mb) / 1024.0) * (file_count * 1.33)
        END
    """
    return F.when(size_mb < 10, F.lit(0.0)).otherwise(
        (1 - locality) * 115 + ((size_mb - max_file_mb) / 1024.0) * (file_count * 1.33)
    )


# SQL fragment used by oracle bodies for the weight formula (keep in sync
# with compaction_weight above).
COMPACTION_WEIGHT_SQL = """CASE WHEN size_mb < 10 THEN 0.0
     ELSE (1 - locality) * 115
          + ((size_mb - max_file_mb) / 1024.0) * (file_count * 1.33)
END"""


#: Lazy libm UDF singletons — pandas_udf parses its DDL type at
#: definition (needs an active session) and cloudpickles per created
#: object, so build once on first use and share across operators.  The
#: JVM's Math.log/exp differ from libm (and DuckDB) in the last ulp;
#: these run ln/exp in Python/libm over JVM-computed double args.
_LIBM_UDFS: dict = {}


def _libm(name: str):
    if name not in _LIBM_UDFS:
        import math

        import pandas as pd

        # pandas_udf resolves the 'pd.Series' hints via this module's
        # globals; inject lazily so importing the package (every CLI
        # tool) doesn't pay the pandas import when no libm UDF runs.
        globals()["pd"] = pd

        @F.pandas_udf("double")
        def pln(x: pd.Series) -> pd.Series:
            return pd.Series([math.log(v) for v in x])

        @F.pandas_udf("double")
        def pexp(x: pd.Series) -> pd.Series:
            return pd.Series([math.exp(v) for v in x])

        _LIBM_UDFS.update({"ln": pln, "exp": pexp})
    return _LIBM_UDFS[name]


#: WeakSet, not id()-keyed: a garbage-collected session can be
#: followed by a new one allocated at the same address, and an id set
#: would false-hit (skipping registration — later ``spark.sql`` texts
#: fail analysis on undefined ``libm_ln``) while also growing
#: unboundedly across sessions.  Weak references key on the live
#: object and vacate with it.
_LIBM_SQL_SESSIONS: "weakref.WeakSet" = None  # type: ignore[assignment]


def register_libm_sql(spark) -> None:
    """Expose the libm UDFs to ``spark.sql`` texts as ``libm_ln`` /
    ``libm_exp`` (idempotent per session).  SQL-text plans need them
    for cross-engine-identical ln/exp — the JVM's Math.log can differ
    from libm in the last ULP, which survives a 6-decimal round often
    enough to break hash certification."""
    global _LIBM_SQL_SESSIONS
    if _LIBM_SQL_SESSIONS is None:
        import weakref

        _LIBM_SQL_SESSIONS = weakref.WeakSet()
    if spark in _LIBM_SQL_SESSIONS:
        return
    spark.udf.register("libm_ln", _libm("ln"))
    spark.udf.register("libm_exp", _libm("exp"))
    _LIBM_SQL_SESSIONS.add(spark)


def pln(col: Column) -> Column:
    """libm ln.  DuckDB counterpart: ``ln(x)`` (libm, bit-identical)."""
    return _libm("ln")(col)


def pexp(col: Column) -> Column:
    """libm exp.  DuckDB counterpart: ``exp(x)``."""
    return _libm("exp")(col)
