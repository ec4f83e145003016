"""M7 streaming tests: oracle parity of the run-to-completion streaming
queries, true multi-batch incremental execution (statefulness across
micro-batches), bounded-state dedup, and the foreachBatch plan-refresh
cycle (SURVEY.md §2.8 S1/S4/F11/S8)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import hbase_tools_spark.operators  # noqa: F401 — registers queries
import hbase_tools_spark.streaming  # noqa: F401
from tests.conftest import SF_DIR, assert_query_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "stream_tumbling_counts",
        "stream_sliding_counts",
        "stream_session_stats",
        "stream_dedup_keys",
    ],
)
def test_streaming_query_matches_oracle(spark, ducksql, name):
    assert_query_matches_oracle(spark, ducksql, name)


def _split_events(spark, tmp_path, n_files=3):
    """Write the events fixture as n separate files so the file source
    can deliver them as distinct micro-batches."""
    from hbase_tools_spark.catalog import load_model

    m = load_model(spark, SF_DIR)
    out = str(tmp_path / "events_parts")
    (
        m.events.repartitionByRange(n_files, "event_id")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_tumbling_agg_accumulates_across_batches(spark, tmp_path):
    """Complete-mode window aggregation must converge to the batch
    answer when the stream arrives as multiple micro-batches — this is
    the stateful path (state store carries partial window counts between
    batches), not a single-batch degenerate run."""
    src = _split_events(spark, tmp_path)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = stream.groupBy(F.window("ts", "1 hour")).agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.select(F.col("window.start").alias("ws"), "n")
        .writeStream.format("memory")
        .queryName("acc_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 2, "expected multiple micro-batches"
    got = {
        (r["ws"], r["n"]) for r in spark.table("acc_windows").collect()
    }
    expect = {
        (r["ws"], r["n"])
        for r in spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
        .collect()
    }
    assert got == expect


def test_dedup_within_watermark_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark — the analog of the reference's
    1-day-TTL dedup cache (compactor/CompactorServer.java:47-58): keys
    recurring *within* the watermark horizon are suppressed; state is
    evicted past it.  With a horizon covering the whole fixture the
    output keys equal the exact distinct set."""
    src = _split_events(spark, tmp_path)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    dedup = (
        stream.withWatermark("ts", "40 days")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["event_type"])
        for r in spark.table("dedup_wm").collect()
    }
    expect = {
        (r["user_id"], r["event_type"])
        for r in spark.read.parquet(src)
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == expect


def test_compaction_plan_stream_foreachbatch(spark):
    """S1 — the foreachBatch refresh cycle emits a full compaction plan
    per micro-batch, tagged with its batch id, and the plan rows equal
    the batch compaction_plan query."""
    from hbase_tools_spark.catalog import load_model
    from hbase_tools_spark.registry import QUERIES
    from hbase_tools_spark.streaming.jobs import compaction_plan_stream

    out = compaction_plan_stream(spark, SF_DIR)
    batch_ids = {r["batch_id"] for r in out.select("batch_id").distinct().collect()}
    assert batch_ids, "no micro-batches ran"
    one = out.filter(F.col("batch_id") == min(batch_ids)).drop("batch_id")
    expect = QUERIES["compaction_plan"].fn(load_model(spark, SF_DIR))
    got_rows = sorted(map(tuple, one.collect()))
    exp_rows = sorted(map(tuple, expect.collect()))
    assert got_rows == exp_rows
