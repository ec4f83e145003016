#!/usr/bin/env python
"""Full-surface differential certification at an arbitrary scale
fixture — the standalone mirror of the driver's t2 gate (row count +
column names + order-insensitive exact value match), runnable against
the derived sf1/sf10 fixtures where the per-round driver only probes
sf0.01.  Reuses tests/conftest.py's normalization so "green" here
means exactly what the pytest differential gate means.

Writes a JSON artifact: per-query {rows, match | rows_only | err} plus
the aggregate counts (the committed CORRECTNESS_SF1.json shape).

Usage::

    python scripts/certify_scale.py --sf-dir .scratch/sf1 \
        --out CORRECTNESS_SF1.json [--cpus 32] [--only q1,q2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--only", default=None, help="comma-sep query subset")
    args = ap.parse_args()
    sf_dir = os.path.abspath(args.sf_dir)

    # conftest reads the fixture dir from the env at import time.
    os.environ["SPARK_GRAFT_TEST_SF_DIR"] = sf_dir

    import duckdb

    from conftest import normalize  # the pytest gate's normalization

    from hbase_tools_spark.session import get_spark
    import hbase_tools_spark.operators  # noqa: F401
    import hbase_tools_spark.llm  # noqa: F401
    import hbase_tools_spark.streaming  # noqa: F401
    from hbase_tools_spark.catalog import load_model
    from hbase_tools_spark.registry import QUERIES
    from hbase_tools_spark.functions.cache import release_stage_caches

    spark = get_spark("hbase-tools-spark-certify", cpus=args.cpus)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    names = sorted(QUERIES)
    if args.only:
        requested = [n for n in args.only.split(",") if n]
        unknown = [n for n in requested if n not in QUERIES]
        if unknown:
            # A typo must not silently shrink the sweep and still
            # report green with a smaller n_queries.
            raise SystemExit(
                f"--only: not in the registry: {', '.join(unknown)}"
            )
        names = requested
    m = load_model(spark, sf_dir)
    results: dict[str, dict] = {}
    n_match = n_rows_only = n_err = 0
    t_start = time.time()
    for name in names:
        q = QUERIES[name]
        try:
            sdf = q.fn(m).toPandas()
            if q.oracle is None:
                results[name] = {"rows": len(sdf), "rows_only": True}
                n_rows_only += 1
            else:
                ddf = con.sql(q.oracle).fetchdf()
                ok = (
                    sorted(sdf.columns) == sorted(ddf.columns)
                    and len(sdf) == len(ddf)
                    and normalize(sdf) == normalize(ddf)
                )
                results[name] = {"rows": len(sdf), "match": bool(ok)}
                n_match += ok
                if not ok:
                    n_err += 1
        except Exception as exc:  # keep certifying the rest
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
            n_err += 1
        finally:
            release_stage_caches()
            # free py4j refs so ContextCleaner CAN drop checkpoint
            # blocks between queries (the bench.py discipline; without
            # it a 100x sweep accumulates blocks until the heap dies)
            import gc

            gc.collect()
        print(name, results[name], flush=True)
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(names),
        "n_match": n_match,
        "n_rows_only": n_rows_only,
        "n_fail": n_err,
        "wall_sec": round(time.time() - t_start, 1),
        "queries": results,
    }
    if args.out:
        with open(os.path.join(ROOT, args.out), "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in out if k != "queries"}))


if __name__ == "__main__":
    main()
