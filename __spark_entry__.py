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
# green row ever (this round's debuts) go FIRST, (2) the 39 queries
# whose newest certificate is dated round 2 (everything NOT re-checked
# in CORRECTNESS_r03.json — round 3 edited several of their source
# files, and round 4 rewrote doc_winnow_fingerprints /
# ngram_contamination / embedding_ivf_* outright), (3) the 50
# round-3-certified queries last.
_R2_DATED = [
    # Ordered by re-certification urgency under the driver's ~50-query
    # budget (debuts go even earlier): queries whose SOURCE FILES the
    # late-round-4 session edited first — similarity.py (int8/PQ memo +
    # probe collects), pipeline.py (Bloom/memo/spread), dedup.py
    # (novelty additions), corpus.py (LM/libm refactor) — then the
    # streaming set, then rarely-touched planner/topology queries last:
    # if the budget cuts the tail, it cuts the queries least likely to
    # have moved.
    "embedding_topk", "embedding_lsh_topk", "embedding_neardup_pairs",
    "embedding_ivf_topk", "ngram_contamination",
    "minhash_band_pairs", "ngram_jaccard_pairs", "neardup_clusters",
    "neardup_clusters_converged", "docs_split_assign",
    "docs_stratified_sample", "docs_repetition_ratio", "lsh_band_sweep",
    "doc_winnow_fingerprints", "docs_exact_dedup",
    "docs_prefix_dedup", "docs_dedup_canonical", "simhash_fingerprints",
    "doc_fingerprints", "text_stats", "lang_id_heuristic",
    "docs_quality_filter", "token_count_hist", "corpus_stats_by_lang",
    "stream_tumbling_counts", "stream_sliding_counts",
    "stream_session_stats", "stream_dedup_keys",
    "stream_enriched_server_load", "stream_membership_in",
    "merge_plan_multipass", "split_plan_multipass", "upsert_dedup",
    "mutation_replay_counts", "events_asof_assignment",
    "topology_asof", "topology_parse", "topology_retention",
    "pricing_summary",
]


def _ordered_names() -> list[str]:
    stale = [n for n in _R2_DATED if n in QUERIES]
    new = [n for n in QUERIES if n not in stale and n not in _R3_VERIFIED]
    rest = [n for n in QUERIES if n in _R3_VERIFIED and n not in stale]
    return new + stale + rest


# Green rows dated r3 (CORRECTNESS_r03.json) — freshest certificates,
# so they queue last.
_R3_VERIFIED = frozenset(
    {
        "events_salted_rollup", "lsh_bucket_stats", "multimodal_features",
        "multimodal_resize", "multimodal_decode_headers",
        "multimodal_frame_sample", "training_set_assembly",
        "embedding_ivf_kmeans_topk", "analyzer_table_size",
        "analyzer_size_hist", "analyzer_locality_hist",
        "analyzer_filecount_hist", "analyzer_distribution_hist",
        "analyzer_weight_stats", "events_user_cardinality",
        "health_check_eligible", "health_probe_plan", "regions_by_server",
        "table_mask_selection", "region_health_join",
        "moved_regions_audit", "metrics_semi_join", "range_lookup",
        "region_bounds", "server_prefix_resolve", "region_edge_rows",
        "salted_keys", "split_points", "compaction_plan", "flush_plan",
        "split_plan", "merge_plan", "mergeable_region_count",
        "merged_span_recovery", "snapshot_merge_guard",
        "distribution_weight", "distribution_candidates",
        "busiest_emptiest", "report_rs_distribution",
        "report_snapshots_stale", "report_snapshots_toomany",
        "report_heap_pressure", "report_rit_stuck",
        "report_biggest_regions", "report_biggest_rollup",
        "report_compaction_queues", "report_locality",
        "report_complex_rollup", "report_partial_top15", "topology_diff",
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
