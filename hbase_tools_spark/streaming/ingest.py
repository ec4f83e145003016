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
driver only orchestrates.  At 100 TB the index and the pairs log are
batch_id-partitioned tables (append per batch = one new partition).

Delivery semantics: ``foreachBatch`` replays a batch after a failure
(at-least-once), so BOTH sinks are written idempotently — each write
targets only its own ``batch_id=N`` partition via dynamic partition
overwrite, and the pairing step reads the index with ``batch_id <
current`` (partition-pruned), so a replay after a partial failure —
between the two writes, or after both but before the checkpoint
commit — recomputes the identical pair set against the identical
pre-batch index and overwrites the same partitions.  At-least-once
reprocessing + idempotent per-partition output = exactly-once OUTPUT
(the contract tests/test_streaming.py asserts by replaying batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.dedup import _BUCKET_CAP, _signatures_for, incremental_pairs

_SIG_SCHEMA = "doc_id long, sig array<long>"


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API — correct for
    HDFS/S3/ABFS index locations (the production posture), where a
    driver-local ``os.path.exists`` would always say no and silently
    degrade every batch to self-pairing."""
    p, fs = _hadoop_path(spark, path)
    return fs.exists(p)


def dedup_ingest_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_dir: str,
    pairs_dir: str,
    batch_id: int,
    cap: int = _BUCKET_CAP,
) -> None:
    """One idempotent ingest cycle: pair the arriving docs against the
    pre-batch index (plus each other), overwrite this batch's partition
    of the pairs log, overwrite this batch's partition of the index.

    The batch signatures are computed ONCE (``persist``) and feed both
    the pairing and the index append — the per-shingle md5 ×
    16-permutation signer is the expensive pass and used to run twice.
    ``unpersist`` in the ``finally`` releases the blocks the moment the
    batch commits: a continuous ingest runs thousands of batches per
    executor lifetime, and un-released per-batch blocks accumulate in
    the block manager until a driver GC — measured inflating unrelated
    queries sharing the executors (round-7 bench anomaly, NOTES.md).
    """
    batch_docs = batch_docs.select("doc_id", "text")
    new_sig = _signatures_for(batch_docs).persist()
    try:
        if _fs_exists(spark, index_dir):
            # batch_id < current: partition-pruned, and — critically for
            # replay idempotence — blind to this batch's own partition
            # if a prior attempt already wrote it.
            sig_index = (
                spark.read.parquet(index_dir)
                .filter(F.col("batch_id") < batch_id)
                .select("doc_id", "sig")
            )
        else:  # first batch: empty index, pairs = new×new only
            sig_index = spark.createDataFrame([], _SIG_SCHEMA)
        pairs = incremental_pairs(sig_index, None, cap, new_sig=new_sig)
        for df, out in (
            (pairs, pairs_dir),
            (new_sig, index_dir),
        ):
            (
                df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(out)
            )
    finally:
        new_sig.unpersist()


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


def compact_pairs_log(
    spark: SparkSession, pairs_dir: str, through_batch: int | None = None
) -> None:
    """Periodic maintenance for the pairs log: keep each (doc_a, doc_b)
    once, attributed to the earliest batch that discovered it.  The
    idempotent writes above keep REPLAYS from duplicating pairs, but a
    re-ingested document (same doc_id arriving in two source files)
    legitimately re-emits its pairs under a later batch_id — compaction
    folds those.

    Replay safety: only partitions with ``batch_id <= through_batch``
    are folded, and ``through_batch`` defaults to ``max(batch_id) - 1``
    — the newest batch is the ONLY one a foreachBatch restart can
    replay (earlier batches are checkpoint-committed), and rewriting it
    here would let that replay re-add folded pairs.  Its partition is
    carried through untouched; any duplicate it holds folds on the
    next compaction, once a newer batch exists.  A caller that KNOWS
    the stream is stopped (or has verified the checkpoint commit) may
    pass ``through_batch=max(batch_id)`` to fold everything.

    Swap discipline: compact into a staging directory, move the live
    log aside, rename staging into place, then drop the backup —
    renames are atomic on HDFS (an object store swaps a metastore
    pointer instead), every step's boolean result is checked, and at
    no point do zero copies of the log exist: a crash leaves either
    the live log or the ``.pre-compact`` backup on disk.  Idempotent:
    re-running on a compacted log is a no-op rewrite."""
    log = spark.read.parquet(pairs_dir)
    if through_batch is None:
        through_batch = log.agg(F.max("batch_id")).collect()[0][0] - 1
    compacted = (
        log.filter(F.col("batch_id") <= through_batch)
        .groupBy("doc_a", "doc_b")
        .agg(F.min("batch_id").alias("batch_id"))
        .unionByName(log.filter(F.col("batch_id") > through_batch))
    )
    stage_dir = pairs_dir.rstrip("/") + ".compacting"
    backup_dir = pairs_dir.rstrip("/") + ".pre-compact"
    (
        compacted.write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(stage_dir)
    )
    live, fs = _hadoop_path(spark, pairs_dir)
    stage, _ = _hadoop_path(spark, stage_dir)
    backup, _ = _hadoop_path(spark, backup_dir)
    fs.delete(backup, True)
    if not fs.rename(live, backup):
        raise IOError(f"compaction aborted: could not move {pairs_dir} aside")
    if not fs.rename(stage, live):
        fs.rename(backup, live)  # restore; log was never absent
        raise IOError(f"compaction failed: could not install {stage_dir}")
    fs.delete(backup, True)
