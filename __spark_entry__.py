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

# The driver checks at most ~50 queries per round (time/count budget),
# in the order this module emits them.  Priority: (1) queries with NO
# green row ever (round-3 debuts + the formerly error/no_oracle
# multimodal rows) go FIRST, (2) the round-1-only certificates —
# stale after the round-2 refactors — next (cheapest families first so
# the budget covers as many as possible), (3) the freshest
# (round-2-verified) set last.
_STALE_R1 = [
    # analyzer + health + joins — sub-0.3 s each
    "analyzer_table_size", "analyzer_size_hist", "analyzer_locality_hist",
    "analyzer_filecount_hist", "analyzer_distribution_hist",
    "analyzer_weight_stats", "events_user_cardinality",
    "health_check_eligible", "health_probe_plan", "regions_by_server",
    "table_mask_selection", "region_health_join", "moved_regions_audit",
    "metrics_semi_join", "range_lookup", "region_bounds",
    "server_prefix_resolve", "region_edge_rows", "salted_keys",
    "split_points",
    # planners + reports
    "compaction_plan", "flush_plan", "split_plan",
    "merge_plan", "mergeable_region_count", "merged_span_recovery",
    "snapshot_merge_guard", "distribution_weight",
    "distribution_candidates", "busiest_emptiest",
    "report_rs_distribution", "report_snapshots_stale",
    "report_snapshots_toomany", "report_heap_pressure",
    "report_rit_stuck", "report_biggest_regions",
    "report_biggest_rollup", "report_compaction_queues",
    "report_locality", "report_complex_rollup", "report_partial_top15",
    # temporal + write-path + flagship
    "topology_diff", "topology_asof", "topology_parse",
    "topology_retention", "events_asof_assignment", "pricing_summary",
    "upsert_dedup", "mutation_replay_counts", "ngram_jaccard_pairs",
]


def _ordered_names() -> list[str]:
    stale = [n for n in _STALE_R1 if n in QUERIES]
    new = [n for n in QUERIES if n not in stale and n not in _R2_VERIFIED]
    rest = [n for n in QUERIES if n in _R2_VERIFIED and n not in stale]
    return new + stale + rest


# Green rows dated r2 (CORRECTNESS_r02.json) — freshest certificates,
# so they queue last.
_R2_VERIFIED = frozenset(
    {
        "docs_prefix_dedup", "docs_exact_dedup", "doc_fingerprints",
        "docs_dedup_canonical", "token_count_hist", "corpus_stats_by_lang",
        "lang_id_heuristic", "docs_quality_filter", "text_stats",
        "simhash_fingerprints", "embedding_lsh_topk",
        "embedding_neardup_pairs", "embedding_topk", "embedding_ivf_topk",
        # multimodal_* deliberately NOT here: their r02 rows were
        # error/no_oracle and round 3 gave them oracles — debut checks
        "stream_dedup_keys", "stream_tumbling_counts", "stream_sliding_counts",
        "stream_membership_in", "stream_enriched_server_load",
        "stream_session_stats", "minhash_band_pairs",
        "doc_winnow_fingerprints", "neardup_clusters",
        "merge_plan_multipass", "split_plan_multipass",
        "neardup_clusters_converged", "docs_split_assign",
        "docs_stratified_sample", "docs_repetition_ratio",
        "ngram_contamination", "lsh_band_sweep",
    }
)


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
    return {name: _make(name) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
