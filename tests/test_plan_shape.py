"""Physical-plan regression guards (SCALE.md audit, frozen as tests):
losing a broadcast, gaining a sort-merge join, or dropping parquet
pushdown is a scale regression even when results stay correct."""

from __future__ import annotations

import pytest

import hbase_tools_spark.llm  # noqa: F401
import hbase_tools_spark.operators  # noqa: F401
from hbase_tools_spark.catalog import load_model
from hbase_tools_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(load_model(spark, SF_DIR))
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    ["region_health_join", "compaction_plan", "merge_plan", "range_lookup",
     "embedding_topk", "health_check_eligible"],
)
def test_dimension_joins_are_broadcast_not_smj(spark, name):
    plan = _plan(spark, name)
    assert "SortMergeJoin" not in plan, f"{name} regressed to sort-merge join"
    assert "Broadcast" in plan, f"{name} lost its broadcast"


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]
    # 7 referenced columns only — a full-width scan is a regression
    read = plan.split("ReadSchema", 1)[1][:400]
    assert "l_comment" not in read and "l_partkey" not in read


@pytest.mark.parametrize("name", ["text_stats", "lang_id_heuristic", "doc_fingerprints"])
def test_narrow_text_ops_have_no_exchange(spark, name):
    plan = _plan(spark, name)
    assert "Exchange" not in plan, f"{name} gained a shuffle"


def test_embedding_topk_pushes_probe_filter_to_scan(spark):
    plan = _plan(spark, "embedding_topk")
    assert "LessThan(vec_id" in plan, "probe filter no longer pushed to parquet"
