"""BM25 retrieval + persisted inverted index: derived-term sanity,
served-vs-direct bit equality, and partition pruning of the serving
reads.  (The DuckDB differential gate for ``docs_bm25_topk`` itself
runs in tests/test_contract.py like every registered query.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from hbase_tools_spark.catalog import load_model
from hbase_tools_spark.llm.search import (
    _QTERM_HI,
    _QTERM_LO,
    bm25_topk_from_index,
    docs_bm25_topk,
    materialize_inverted_index,
)


def _query_terms(spark) -> list[str]:
    """The corpus-derived query terms (vocab Zipf ranks 11-13) the
    certified query scores — recomputed here independently."""
    m = load_model(spark, SF_DIR)
    wc = (
        m.documents.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .groupBy("doc_id", "word")
        .count()
    )
    vocab = wc.groupBy("word").agg(F.sum("count").alias("n"))
    rows = vocab.orderBy(F.desc("n"), "word").limit(_QTERM_HI).collect()
    return [r["word"] for r in rows[_QTERM_LO - 1 : _QTERM_HI]]


def test_bm25_scores_rank_and_match_terms(spark):
    m = load_model(spark, SF_DIR)
    rows = docs_bm25_topk(m).collect()
    assert 0 < len(rows) <= 20
    by_rank = sorted(rows, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == list(range(1, len(rows) + 1))
    # scores non-increasing with rank; every doc matched >= 1 query term
    scores = [r["score"] for r in by_rank]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    assert all(1 <= r["n_terms"] <= (_QTERM_HI - _QTERM_LO + 1) for r in rows)
    assert all(r["score"] > 0 for r in rows)


def test_bm25_index_serving_equals_direct_and_prunes(spark, tmp_path):
    """The persisted-index path must reproduce the direct corpus-scan
    BM25 exactly (doc_id, n_terms, score, rank), and both its postings
    and dictionary reads must prune to the query terms' hash buckets
    (static PartitionFilters — the corpus is never rescanned)."""
    m = load_model(spark, SF_DIR)
    idx = str(tmp_path / "inv_index")
    materialize_inverted_index(m.documents, idx)
    terms = _query_terms(spark)
    served = bm25_topk_from_index(spark, idx, terms)
    plan = served._jdf.queryExecution().executedPlan().toString()
    parts = plan.split("PartitionFilters: [")
    pruned = [p for p in parts[1:] if "bucket" in p[:160] and " IN " in p[:160]]
    assert len(pruned) >= 2, (
        "postings AND dictionary reads must prune on bucket: " + plan[:2000]
    )
    direct = {
        (r["doc_id"], r["n_terms"], r["score"], r["rank"])
        for r in docs_bm25_topk(m).collect()
    }
    got = {
        (r["doc_id"], r["n_terms"], r["score"], r["rank"])
        for r in served.collect()
    }
    assert got == direct


def test_bm25_index_prune_skips_unrelated_buckets(spark, tmp_path):
    """A single rare term's serving read touches only its bucket: the
    scanned postings rows are exactly that term's docs (observable
    partition pruning, not just a plan string)."""
    m = load_model(spark, SF_DIR)
    idx = str(tmp_path / "inv_index2")
    materialize_inverted_index(m.documents, idx)
    term = _query_terms(spark)[0]
    served = bm25_topk_from_index(spark, idx, [term], k=5)
    rows = served.collect()
    assert 0 < len(rows) <= 5
    # every served doc really contains the term
    hits = {
        r["doc_id"]
        for r in m.documents.where(
            F.array_contains(F.split("text", " "), term)
        ).collect()
    }
    assert {r["doc_id"] for r in rows} <= hits
