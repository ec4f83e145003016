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


def test_kv_locks_last_write_wins_and_tombstone(spark):
    """TableLock semantics as data: the newest LOCKED_BY/LOCK cells win
    per process, and a tombstoned LOCKED_BY removes the lock row."""
    kv = spark.createDataFrame(
        [
            ("proc_a", "cf", "LOCKED_BY", 1, "11"),
            ("proc_a", "cf", "LOCK", 1, "res_1"),
            ("proc_a", "cf", "LOCKED_BY", 5, "22"),   # newer attempt wins
            ("proc_a", "cf", "LOCK", 5, "res_2"),
            ("proc_b", "cf", "LOCKED_BY", 3, "33"),
            ("proc_b", "cf", "LOCK", 3, "res_3"),
            ("proc_b", "cf", "LOCKED_BY", 9, None),   # tombstone: released
        ],
        "rowkey string, cf string, qualifier string, ts long, value string",
    )
    rows = {r["process"]: r for r in kvmod.kv_locks(kv).collect()}
    assert rows["proc_a"]["pid"] == "22"
    assert rows["proc_a"]["resource"] == "res_2"
    assert rows["proc_a"]["lock_seq"] == 5
    assert "proc_b" not in rows  # tombstoned LOCKED_BY drops the lock


def test_kv_health_probes_salt_parse(spark):
    """The salted rowkey parses back to (start_key, salt); LWW keeps
    the newest check per probe row."""
    kv = spark.createDataFrame(
        [
            ("000000000001#0a1b2c3d", "cf", "REGION_CHECK_TIME", 7, "100"),
            ("000000000001#0a1b2c3d", "cf", "REGION_CHECK_TIME", 9, "200"),
            ("000000000002#ffee0011", "cf", "REGION_CHECK_TIME", 4, "300"),
        ],
        "rowkey string, cf string, qualifier string, ts long, value string",
    )
    rows = sorted(
        kvmod.kv_health_probes(kv).collect(), key=lambda r: r["start_key"]
    )
    assert [r["start_key"] for r in rows] == ["000000000001", "000000000002"]
    assert rows[0]["salt"] == "0a1b2c3d"
    assert rows[0]["check_time"] == "200" and rows[0]["probe_seq"] == 9
    assert rows[1]["check_time"] == "300"
