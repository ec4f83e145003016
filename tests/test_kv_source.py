"""KV source adapter: the connector-shaped (rowkey, cf, qualifier, ts,
value) cell form must rebuild meta_regions/topology EXACTLY — including
last-write-wins versioning and delete tombstones — and every registered
query must stay oracle-green on the rebuilt model."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, normalize

import hbase_tools_spark.operators  # noqa: F401 — registers queries
import hbase_tools_spark.llm  # noqa: F401
from hbase_tools_spark.catalog import load_model
from hbase_tools_spark.registry import QUERIES
from hbase_tools_spark.sources import kv as kvmod


def _with_noise(spark, kv, tmp_path, name):
    """stale older versions + a fully-deleted ghost row, written to
    parquet and read back (prove the cell schema survives storage)."""
    stale = kv.withColumn("ts", F.col("ts") - 1).withColumn(
        "value", F.lit("BOGUS")
    )
    ghost_put = spark.createDataFrame(
        [("zzz,ghostkey,999999", kvmod.META_CF, "server", 5, "sghost"),
         ("999999", kvmod.TECH_CF, "server_1700000000000", 5, "sghost")],
        kvmod.KV_COLUMNS,
    )
    ghost_del = ghost_put.withColumn("ts", F.lit(6)).withColumn(
        "value", F.lit(None).cast("string")
    )
    noisy = kv.unionByName(stale).unionByName(ghost_put).unionByName(ghost_del)
    path = str(tmp_path / f"{name}.parquet")
    noisy.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_meta_regions_roundtrip_exact(spark, tmp_path):
    m = load_model(spark, SF_DIR)
    want = m.meta_regions.toPandas()
    kv = kvmod.meta_regions_to_kv(m.meta_regions, ts=100)
    got = kvmod.kv_meta_regions(
        _with_noise(spark, kv, tmp_path, "meta")
    ).toPandas()
    assert sorted(got.columns) == sorted(want.columns)
    assert normalize(got) == normalize(want)


def test_topology_roundtrip_exact(spark, tmp_path):
    m = load_model(spark, SF_DIR)
    want = m.topology.toPandas()
    kv = kvmod.topology_to_kv(m.topology)
    got = kvmod.kv_topology(
        _with_noise(spark, kv, tmp_path, "topo")
    ).toPandas()
    assert sorted(got.columns) == sorted(want.columns)
    assert normalize(got) == normalize(want)


@pytest.mark.parametrize(
    "name",
    ["region_bounds", "region_health_join", "range_lookup", "merge_plan",
     "topology_asof", "topology_diff", "events_asof_assignment",
     "report_rs_distribution"],
)
def test_queries_green_on_kv_model(spark, ducksql, tmp_path, name):
    m = load_model(spark, SF_DIR)
    meta_kv = _with_noise(
        spark, kvmod.meta_regions_to_kv(m.meta_regions), tmp_path, "meta"
    )
    topo_kv = _with_noise(
        spark, kvmod.topology_to_kv(m.topology), tmp_path, "topo"
    )
    mk = kvmod.load_model_from_kv(spark, SF_DIR, meta_kv, topo_kv)
    q = QUERIES[name]
    try:
        sdf = q.fn(mk).toPandas()
    finally:
        load_model(spark, SF_DIR)  # restore fixture views for other tests
    ddf = ducksql(q.oracle)
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert normalize(sdf) == normalize(ddf)
