#!/usr/bin/env python
"""Quick A/B timing of named queries in the bench posture (warm tables,
AQE off, 4 shuffle partitions): median + best of N runs after one
untimed warm-up.  For optimization iteration only — the committed
numbers come from bench.py.

Usage:
    python scripts/ab.py --queries a,b,c [--runs 5] [--cpus 32]
"""

from __future__ import annotations

import argparse
import gc
import os
import statistics
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import SparkSession

    import hbase_tools_spark.operators  # noqa: F401
    import hbase_tools_spark.llm  # noqa: F401
    import hbase_tools_spark.streaming  # noqa: F401
    from hbase_tools_spark.catalog import load_model
    from hbase_tools_spark.registry import QUERIES
    from hbase_tools_spark.functions.cache import release_stage_caches

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("ab")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.cleaner.periodicGC.interval", "20s")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    m = load_model(spark, args.sf_dir)

    from hbase_tools_spark.model import DERIVED_VIEWS

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        spark.catalog.cacheTable(t)
        spark.table(t).count()
    for t in DERIVED_VIEWS:
        spark.table(t).localCheckpoint(eager=True).createOrReplaceTempView(t)
    m = load_model(spark, args.sf_dir)

    import json

    out = {}
    for name in args.queries.split(","):
        QUERIES[name].fn(m).toPandas()  # warm-up / artifact build
        release_stage_caches()
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[name].fn(m).toPandas()
            times.append(time.perf_counter() - t0)
            gc.collect()
        release_stage_caches()
        out[name] = {
            "median": round(statistics.median(times), 3),
            "best": round(min(times), 3),
        }
        print(name, json.dumps(out[name]), flush=True)


if __name__ == "__main__":
    main()
