"""CLI surface tests: every reference tool name dispatches, its queries
exist in the registry, and the lifecycle tools perform their catalog
ops."""

from __future__ import annotations

import os

import pytest

import hbase_tools_spark.llm  # noqa: F401
import hbase_tools_spark.operators  # noqa: F401
import hbase_tools_spark.streaming  # noqa: F401
from hbase_tools_spark.__main__ import LIFECYCLE_TOOLS, TOOL_QUERIES, main
from hbase_tools_spark.registry import QUERIES
from tests.conftest import SF_DIR


_REFERENCE_TOOLS = {
    "table_analyzer", "report", "compactor", "compaction_cleaner",
    "distributor", "flusher", "merger", "splitter", "key_generator",
    "key_finder", "health_check", "meta", "table_checker",
    "table_copy", "table_replace",
}


def test_all_15_reference_tools_covered():
    # Tool.java:18-341 lists 15 tools; every one must dispatch here
    # (plus the llm_* extension tools beyond the reference surface).
    assert _REFERENCE_TOOLS <= set(TOOL_QUERIES) | LIFECYCLE_TOOLS
    assert len(_REFERENCE_TOOLS) == 15
    extras = set(TOOL_QUERIES) - _REFERENCE_TOOLS
    assert all(
        t.startswith("llm_")
        or t in ("events_analyzer", "sketches", "search", "corpus_ops")
        for t in extras
    )


def test_cli_generic_query_runner(capsys):
    rc = main(["query", "--name", "analyzer_table_size", "--sf-dir", SF_DIR,
               "--rows", "3"])
    assert rc == 0
    assert "table_name" in capsys.readouterr().out


def test_tool_queries_all_registered():
    missing = {
        q for names in TOOL_QUERIES.values() for q in names if q not in QUERIES
    }
    assert not missing, f"tools reference unregistered queries: {missing}"


@pytest.mark.parametrize("tool", ["table_checker", "flusher"])
def test_cli_runs_tool(tool, capsys):
    rc = main([tool, "--sf-dir", SF_DIR, "--rows", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    for q in TOOL_QUERIES[tool]:
        assert f"=== {q} ===" in out


def test_cli_table_copy(tmp_path, spark, capsys):
    from hbase_tools_spark.catalog import load_model

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    load_model(spark, SF_DIR).nation.write.parquet(src)
    rc = main(["table_copy", "--src", src, "--dst", dst])
    assert rc == 0
    assert os.path.exists(dst)
    assert spark.read.parquet(dst).count() == spark.read.parquet(src).count()


def test_cli_explain_renders_physical_plan(capsys):
    rc = main(["splitter", "--sf-dir", SF_DIR, "--explain"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "== Physical Plan ==" in out
    assert "=== split_points ===" in out


def test_cli_key_generator_full_surface(capsys):
    """key_generator must salt the WHOLE table, not just the
    oracle-gated c_custkey<100 demo subset."""
    rc = main(["key_generator", "--sf-dir", SF_DIR, "--rows", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "=== salted_keys ===" in out
    assert "=== salted_keys_full ===" in out


def test_salted_keys_full_covers_all_customers(spark):
    from hbase_tools_spark.catalog import load_model
    from hbase_tools_spark.operators.keyspace import salted_keys_full

    m = load_model(spark, SF_DIR)
    assert salted_keys_full(m).count() == m.customer.count()
