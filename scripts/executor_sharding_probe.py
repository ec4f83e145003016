#!/usr/bin/env python
"""Round-9 verdict task 3: DEMONSTRATE (not assert) that the stateful
stream-drain bottleneck shards with executor count.

Round 8 decomposed the `stream_funnel_stage` / `stream_attribution`
one-shot drain cost at 10x events: ~80% of wall is per-user Python
group overhead funneled through ONE executor's GIL-bound worker pool
(~2 active python workers, 30 cores idle) — `local[n]` has a single
executor, so `spark.sql.execution.arrow.maxRecordsPerBatch` / state
partitions can't help.  The claimed cluster story is that executors
each own a python worker pool, so drain time should fall with
executor count at constant total cores.

Spark's `local-cluster[N, C, M]` master launches N REAL executor JVMs
with C cores and M MB each inside one machine — the mechanism Spark's
own tests use — giving a true multi-executor run without a cluster
manager.  This probe runs each drain query at constant total cores
(SPARK_GRAFT_PROBE_CORES, default 16) under 1, 2, and 4 executors and
prints per-config drain seconds as one JSON line per query.

Usage::

    python scripts/executor_sharding_probe.py \
        --sf-dir .scratch/ev10 --runs 2 --cores 16

Results land in SCALE.md (round-9 section).
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["stream_funnel_stage", "stream_attribution"]


def _session(master: str, cores: int):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(master)
        .appName("executor-sharding-probe")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.cleaner.periodicGC.interval", "20s")
    )
    if master.startswith("local-cluster"):
        # executor JVMs need the python package tree on their PYTHONPATH
        b = b.config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    else:
        b = b.config("spark.driver.memory", "8g")
    return b.getOrCreate()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".scratch/ev10")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--mem-mb", type=int, default=4096)
    args = ap.parse_args()
    sf_dir = os.path.abspath(args.sf_dir)
    C = args.cores

    configs = [
        ("1 executor (local)", f"local[{C}]"),
        ("2 executors", f"local-cluster[2,{C // 2},{args.mem_mb}]"),
        ("4 executors", f"local-cluster[4,{C // 4},{args.mem_mb}]"),
    ]
    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for label, master in configs:
        spark = _session(master, C)
        spark.sparkContext.setLogLevel("ERROR")
        import hbase_tools_spark.llm  # noqa: F401
        import hbase_tools_spark.operators  # noqa: F401
        import hbase_tools_spark.streaming  # noqa: F401
        from hbase_tools_spark.catalog import load_model
        from hbase_tools_spark.registry import QUERIES as REG

        m = load_model(spark, sf_dir)
        for q in QUERIES:
            times = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                REG[q].fn(m).toPandas()
                times.append(time.perf_counter() - t0)
                gc.collect()
            results[q][label] = round(statistics.median(times), 2)
            print(
                f"# {q} @ {label} ({master}): {results[q][label]} s",
                file=sys.stderr,
            )
        spark.stop()
        # a fresh app per config — executor JVMs die with the session
        time.sleep(2)
    for q in QUERIES:
        print(json.dumps({"query": q, "cores": C, "drains": results[q]}))


if __name__ == "__main__":
    main()
