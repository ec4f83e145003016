"""Shared test harness: one SparkSession per run + a DuckDB differential
comparator that mirrors the driver's t2 gate (row count + column names +
order-insensitive exact value match)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from hbase_tools_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hbase-tools-spark-tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ducksql():
    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        # Spark-written tables (derived scale fixtures) are parquet
        # DIRECTORIES; DuckDB needs the part-file glob.
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    yield lambda sql: con.sql(sql).fetchdf()
    con.close()


def _norm_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # exact float identity is the contract; repr round-trips it
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    try:
        import numpy as np

        if isinstance(v, (np.integer,)):
            return ("i", int(v))
        if isinstance(v, (np.floating,)):
            return _norm_cell(float(v))
        if isinstance(v, np.bool_):
            return ("b", bool(v))
    except ImportError:
        pass
    import decimal

    if isinstance(v, decimal.Decimal):
        return ("f", repr(float(v)))
    if isinstance(v, (int,)):
        return ("i", v)
    return ("s", str(v))


def normalize(df) -> list[tuple]:
    """pandas DataFrame -> sorted list of normalized row tuples with
    columns sorted by name (mirrors the driver's order-insensitive
    value-hash)."""
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def assert_query_matches_oracle(spark, ducksql, name: str):
    from hbase_tools_spark.catalog import load_model
    from hbase_tools_spark.registry import QUERIES

    q = QUERIES[name]
    sdf = q.fn(load_model(spark, SF_DIR)).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only contract; detailed tests elsewhere
        return
    ddf = ducksql(q.oracle)
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), f"{name}: row count spark={len(sdf)} duck={len(ddf)}"
    srows, drows = normalize(sdf), normalize(ddf)
    mism = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b][:5]
    assert srows == drows, (
        f"{name}: value mismatch at sorted rows {mism}; "
        f"spark sample={[srows[i] for i in mism]}, duck sample={[drows[i] for i in mism]}"
    )
