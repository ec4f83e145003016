"""Behavioral guarantees of the deterministic sketch family
(operators/sketches.py) beyond the differential gate: error bounds,
one-sided-ness, bounded state, and the plan shapes the 100 TB posture
depends on.  (Bit-parity with DuckDB is covered by test_contract.py.)
"""

from __future__ import annotations

import pytest

import hbase_tools_spark.operators  # noqa: F401
from hbase_tools_spark.catalog import load_model
from hbase_tools_spark.operators import sketches as sk
from hbase_tools_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _run(spark, name):
    return QUERIES[name].fn(load_model(spark, SF_DIR)).collect()


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(load_model(spark, SF_DIR))
    return df._jdf.queryExecution().executedPlan().toString()


def test_hll_error_within_sketch_bound(spark):
    """|rel_err| stays within ~3 standard errors of the p=8 sketch
    (rsd = 1.04/sqrt(256) = 6.5%); the linear-counting branch (small
    fixtures) is far tighter, so 0.2 holds across every SF."""
    rows = _run(spark, "events_hll_cardinality")
    assert rows, "no event types"
    for r in rows:
        assert r.n_exact > 0
        assert abs(r.rel_err) < 0.2, (r.event_type, r.rel_err)


def test_hll_register_relation_is_bounded(spark):
    """The sketch state is at most n_types x m registers regardless of
    event cardinality — the constant-memory claim, asserted on the
    actual register relation."""
    m = load_model(spark, SF_DIR)
    ev = m.events.select("event_type", sk._key_col().alias("k"))
    n_types = ev.select("event_type").distinct().count()
    hashed = ev.select(
        "event_type", sk._h48(ev["k"]).alias("h")
    )
    regs = (
        hashed.groupBy("event_type", (hashed["h"] % sk._HLL_M).alias("b"))
        .count()
        .count()
    )
    assert regs <= n_types * sk._HLL_M


def test_cms_estimate_is_one_sided(spark):
    """CMS never undercounts: estimate >= exact for every probed key,
    and the probe set is the exact top-N (<= N rows, ordered)."""
    rows = _run(spark, "events_cms_heavy_hitters")
    assert 0 < len(rows) <= sk._CMS_TOPN
    counts = [r.n_exact for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.cms_estimate >= r.n_exact, r
        assert r.overcount == r.cms_estimate - r.n_exact


def test_kmv_estimates_are_calibrated(spark):
    """Jaccard in [0,1]; the intersection estimate lands within a
    factor of 2 of truth whenever the true overlap is non-trivial
    (k=128 gives ~9% rse on the union size plus binomial noise on J —
    factor 2 is a loose, stable envelope at every fixture SF)."""
    rows = _run(spark, "events_kmv_overlap")
    assert rows
    for r in rows:
        assert 0.0 <= r.kmv_jaccard <= 1.0
        if r.n_exact_inter >= 50:
            assert 0.5 * r.n_exact_inter <= r.kmv_inter_est <= 2.0 * r.n_exact_inter, r


def test_kmv_never_globally_sorts_the_distinct_relation(spark):
    """The top-k windows must run on the threshold-filtered survivor
    relation: every Sort in the plan sits above a Filter on the
    boundary cell (no full per-type sort of all distinct hashes), and
    the boundary relation joins back as a broadcast."""
    plan = _plan(spark, "events_kmv_overlap")
    assert "BroadcastHashJoin" in plan
    # the survivor filter (isnull(bb) OR cell <= bb) guards the window
    assert "isnull" in plan.lower() and "bb" in plan


def test_cms_probe_joins_broadcast_counter_grid(spark):
    plan = _plan(spark, "events_cms_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hll_final_join_is_broadcast(spark):
    plan = _plan(spark, "events_hll_cardinality")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cms_counter_grid_is_constant_size(spark):
    """The counter relation is bounded by d*w cells no matter how many
    events flow in — the property that makes the sketch mergeable and
    broadcastable at any scale."""
    m = load_model(spark, SF_DIR)
    from pyspark.sql import functions as F

    ue = m.events.select(
        F.col("user_id").cast("string").alias("uk")
    )
    cells = ue.select(
        F.posexplode(F.array(*sk._cms_cols_spark())).alias("r", "c")
    )
    n_cells = cells.groupBy("r", "c").count().count()
    assert n_cells <= sk._CMS_D * sk._CMS_W


def test_stream_hll_matches_batch_exactly(spark):
    """Register max is batching-order-invariant, so the streaming drain
    must reproduce the batch estimate bit-for-bit — the mergeability
    property that lets partial sketches combine across partitions,
    micro-batches, and restarts."""
    import hbase_tools_spark.streaming  # noqa: F401 — registers stream twin

    batch = _run(spark, "events_hll_cardinality")
    stream = _run(spark, "stream_hll_cardinality")
    assert [tuple(r) for r in batch] == [tuple(r) for r in stream]


def test_stream_hll_state_is_bounded(spark):
    """The drained update log can only ever hold register-change rows:
    every (type, bucket) pair at most once per micro-batch, and the
    DISTINCT register set is <= n_types * m — the O(1)-state claim vs
    stream_dedup_keys' O(distinct-keys) store."""
    import hbase_tools_spark.streaming  # noqa: F401

    _run(spark, "stream_hll_cardinality")  # drains into the memory sink
    drained = spark.table("stream_hll_cardinality")
    n_types = drained.select("event_type").distinct().count()
    regs = drained.select("event_type", "b").distinct().count()
    assert regs <= n_types * sk._HLL_M


def test_quantile_sketch_error_within_bucket_bound(spark):
    """The HDR layout guarantees <= 6.25% relative bucket width (16
    sub-buckets per octave); with in-bucket interpolation the estimate
    must land inside that envelope at every SF."""
    rows = _run(spark, "docs_length_quantile_sketch")
    assert len(rows) == len(sk._QSK_QS)
    for r in rows:
        assert abs(r.rel_err) <= 0.0625, r


def test_quantile_sketch_histogram_is_bounded(spark):
    """Sketch state is the bucket histogram alone: at most 16 ids per
    octave across the 63 possible bigint octaves (plus the 16 exact
    small values) — mergeable by addition, broadcastable at any
    scale."""
    from pyspark.sql import functions as F

    m = load_model(spark, SF_DIR)
    n_buckets = (
        m.documents.groupBy(F.expr(sk._QSK_BID).alias("bid")).count().count()
    )
    assert n_buckets <= 16 * 64


def test_hll_registers_merge_associatively(spark):
    """Partial HLL sketches built per day and merged by register max
    equal the directly-built global sketch — the property that lets
    100 TB partials combine across files, partitions, and days without
    re-reading data."""
    from pyspark.sql import functions as F

    m = load_model(spark, SF_DIR)
    ev = m.events.select(
        "event_type",
        F.expr(f"unix_micros(ts) div {sk._US_PER_DAY}").alias("day"),
        sk.daily_key_col().alias("k"),
    )
    rho = sk.hll_rho_cols(ev.select("event_type", "k"))
    direct = (
        rho.groupBy("event_type", "b").agg(F.max("rho").alias("mr"))
    )
    rho_by_day = sk.hll_rho_cols(ev.select("event_type", "k")).join(
        ev.select("k", "day").distinct(), "k"
    )
    daily = rho_by_day.groupBy("event_type", "day", "b").agg(
        F.max("rho").alias("mr")
    )
    merged = daily.groupBy("event_type", "b").agg(F.max("mr").alias("mr"))
    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b


def test_stream_quantile_matches_batch_exactly(spark):
    """Bucket counts are additive and the drained running totals
    finalize by per-bucket max, so the streaming sketch's histogram —
    and therefore the shared quantile readout — must equal the batch
    query bit-for-bit."""
    import hbase_tools_spark.streaming  # noqa: F401

    batch = _run(spark, "docs_length_quantile_sketch")
    stream = _run(spark, "stream_length_quantile_sketch")
    assert [tuple(r) for r in batch] == [tuple(r) for r in stream]


def test_stream_quantile_state_is_bounded(spark):
    """The drained update log only ever holds bucket-count rows: the
    DISTINCT bucket set is bounded by the HDR layout (16 ids per octave
    across 64 octaves) — O(1) state for any corpus size."""
    import hbase_tools_spark.streaming  # noqa: F401

    _run(spark, "stream_length_quantile_sketch")
    drained = spark.table("stream_length_quantile_sketch")
    assert drained.select("bid").distinct().count() <= 16 * 64


def test_stream_cms_matches_batch_exactly(spark):
    """Counter counts are additive and the drained running totals
    finalize by per-cell max, so the streaming CMS probe must equal
    the batch query row-for-row (all-integer columns)."""
    import hbase_tools_spark.streaming  # noqa: F401

    batch = _run(spark, "events_cms_heavy_hitters")
    stream = _run(spark, "stream_cms_heavy_hitters")
    assert [tuple(r) for r in batch] == [tuple(r) for r in stream]


# ---------------------------------------------------------------------------
# Primitive property tests (DuckDB side only — the Spark twins are pinned
# to these same expressions by the differential gate, so validating the
# SQL against an independent Python reference covers both engines).
# ---------------------------------------------------------------------------


def test_qsk_bucket_layout_properties():
    """Every value lands inside its reconstructed [lo, lo+width) bucket,
    relative width is <= 1/16 above the exact range, and bucket ids are
    monotone in the value — over the full 48-bit domain."""
    import random

    import duckdb

    rng = random.Random(0xC0FFEE)
    xs = sorted(
        [rng.randrange(0, 16) for _ in range(50)]
        + [rng.randrange(16, 1 << 48) for _ in range(500)]
        + [0, 15, 16, 17, 31, 32, (1 << 48) - 1]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(n_chars BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    rows = con.execute(f"""
        WITH b AS (SELECT n_chars, {sk._QSK_BID_SQL} AS bid FROM t)
        SELECT n_chars, bid, {sk._QSK_LO_SQL} AS lo, {sk._QSK_W_SQL} AS w
        FROM b ORDER BY n_chars
    """).fetchall()
    prev_bid = -1
    for x, bid, lo, w in rows:
        assert lo <= x < lo + w, (x, bid, lo, w)
        if x >= 16:
            assert w * 16 <= lo, (x, lo, w)  # rel width <= 1/16
        assert bid >= prev_bid, (x, bid, prev_bid)
        prev_bid = bid


def test_hll_rho_matches_python_reference():
    """SQL rho (41 - length(bin(w)); 41 at w=0) == the leading-zero
    rank 41 - w.bit_length() over random 40-bit remainders."""
    import random

    import duckdb

    rng = random.Random(0xBEEF)
    ws = [0, 1, 2, 3, (1 << 40) - 1] + [
        rng.randrange(0, 1 << 40) for _ in range(500)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(w,) for w in ws])
    rows = con.execute(
        "SELECT w, CASE WHEN w = 0 THEN 41 ELSE 41 - length(bin(w)) END"
        " FROM t"
    ).fetchall()
    for w, rho in rows:
        assert rho == (41 if w == 0 else 41 - w.bit_length()), (w, rho)


def test_cms_hash_slices_match_python_md5():
    """The d=4 SQL cell coordinates == hashlib.md5 slice parses for the
    same keys — pins the shared hash contract to an independent
    implementation."""
    import hashlib

    import duckdb

    keys = [str(i) for i in range(200)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(uk VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
    rows = con.execute(f"""
        SELECT uk, r, {sk._CMS_COL_SQL} AS c
        FROM t CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) rows
    """).fetchall()
    for uk, r, c in rows:
        digest = hashlib.md5(uk.encode()).hexdigest()
        expect = int(digest[8 * r : 8 * r + 8], 16) % sk._CMS_W
        assert c == expect, (uk, r, c, expect)
