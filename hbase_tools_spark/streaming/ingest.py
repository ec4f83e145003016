"""Continuous corpus ingestion with incremental dedup (S1's
plan-refresh cycle composed with the M8 dedup pipeline).

The reference's continuous modes are read→recompute→act loops over
refreshed snapshots (compactor/CompactorServer.java:127-155); the
training-pipeline analog is: documents arrive as a stream, each
micro-batch is deduplicated against the PERSISTED signature index
(``llm.dedup.materialize_signatures``), candidate pairs are appended to
a pairs log, and the batch's signatures are appended to the index — so
the index is always exactly "every doc seen so far" and per-batch cost
scales with batch × bucket width, never corpus².

Everything inside ``foreachBatch`` is distributed DataFrame work; the
driver only orchestrates.  At 100 TB the index is a partitioned table
(append per batch = one new file set), and checkpointing makes the
loop exactly-once per source file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.dedup import (
    _BUCKET_CAP,
    _signatures_for,
    incremental_pairs,
    minhash_pairs_for,
)

_SIG_SCHEMA = "doc_id long, sig array<long>"


def dedup_ingest_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_dir: str,
    pairs_dir: str,
    batch_id: int,
    cap: int = _BUCKET_CAP,
) -> None:
    """One ingest cycle: pair the arriving docs against the index
    (plus each other), log the pairs, grow the index."""
    batch_docs = batch_docs.select("doc_id", "text")
    if os.path.exists(index_dir):
        sig_index = spark.read.parquet(index_dir)
        pairs = incremental_pairs(sig_index, batch_docs, cap)
    else:
        pairs = minhash_pairs_for(batch_docs, cap)
    (
        pairs.withColumn("batch_id", F.lit(batch_id))
        .write.mode("append")
        .parquet(pairs_dir)
    )
    _signatures_for(batch_docs).write.mode("append").parquet(index_dir)


def dedup_ingest_stream(
    docs_stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    cap: int = _BUCKET_CAP,
):
    """Run the ingest loop as a Structured Streaming query over an
    arriving-documents stream; returns the started query.  AvailableNow
    drains the backlog deterministically (tests); ProcessingTime makes
    it the continuous production loop — nothing else changes."""
    spark = docs_stream.sparkSession

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dedup_ingest_batch(spark, batch_df, index_dir, pairs_dir, batch_id, cap)

    return (
        docs_stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
