"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (CORRECTNESS gate at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import hbase_tools_spark.operators  # noqa: F401 — registers queries
import hbase_tools_spark.llm  # noqa: F401
import hbase_tools_spark.streaming  # noqa: F401
from hbase_tools_spark.catalog import load_model
from hbase_tools_spark.registry import QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    model = load_model(spark, SF0001)
    return QUERIES["pricing_summary"].fn(model)


def _make(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return QUERIES[name].fn(load_model(spark, sf_dir))

    run.__name__ = name
    run.__doc__ = QUERIES[name].doc
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _make(name) for name in QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
