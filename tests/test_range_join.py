"""locate_in_ranges (J5) on ARBITRARY keys — the round-1 grid assumed
numeric-castable keys (silently empty otherwise); these tests pin the
byte-key-safe contract: unicode, shared prefixes, varying lengths,
entropy beyond the 7-byte proxy, unbounded first/last regions.

Expected values come from an independent pure-Python bisect oracle
(str comparison == code-point order == UTF-8 byte order, the same
total order Spark's string comparison and the hex proxy use).
"""

from __future__ import annotations

import bisect
import random

import pytest
from pyspark.sql import functions as F

from hbase_tools_spark.operators.joins import locate_in_ranges


def _regions_from_boundaries(bounds: list[str]):
    """[''] + sorted boundaries -> [start, end) rows, last end = ''."""
    starts = [""] + bounds
    ends = bounds + [""]
    return [(f"r{i:04d}", s, e) for i, (s, e) in enumerate(zip(starts, ends))]


def _expected(probes: list[str], bounds: list[str]):
    out = []
    for p in probes:
        i = bisect.bisect_right(bounds, p)  # regions: ['',b0), [b0,b1)...
        out.append((p, f"r{i:04d}"))
    return sorted(out)


def _run(spark, probes: list[str], bounds: list[str]):
    rdf = spark.createDataFrame(
        _regions_from_boundaries(bounds), ["region_id", "start_key", "end_key"]
    )
    pdf = spark.createDataFrame([(p,) for p in probes], ["probe_key"])
    got = (
        locate_in_ranges(pdf, rdf)
        .select("probe_key", "region_id")
        .collect()
    )
    assert len(got) == len(probes), "every probe must hit exactly one region"
    return sorted((r.probe_key, r.region_id) for r in got)


ALPHABET = list("09azAZ~!éß中") + [chr(0x10FFFF)]


def _rand_key(rng, maxlen=14):
    return "".join(rng.choice(ALPHABET) for _ in range(rng.randint(0, maxlen)))


def test_random_unicode_keys(spark):
    rng = random.Random(42)
    keys = sorted({_rand_key(rng) for _ in range(400)} - {""})
    bounds = sorted(rng.sample(keys, 37))
    probes = [rng.choice(keys) for _ in range(300)] + bounds[:5]
    assert _run(spark, probes, bounds) == _expected(probes, bounds)


def test_boundary_probes_hit_half_open_sides(spark):
    bounds = ["b", "m", "t"]
    # probe == a boundary belongs to the region STARTING there
    probes = ["", "a", "b", "m", "t", "zzz"]
    assert _run(spark, probes, bounds) == _expected(probes, bounds)


def test_long_shared_prefix_beyond_proxy(spark):
    # all boundaries identical in their first 16 bytes -> lcp skip must
    # move the 7-byte proxy window past the shared prefix
    pfx = "region/shard/00/"
    bounds = sorted(pfx + s for s in ["aaa", "dog", "mmm", "zebra"])
    probes = [pfx + s for s in ["", "abc", "cat", "dog", "yak", "zz"]] + ["a", "zzz"]
    assert _run(spark, probes, bounds) == _expected(probes, bounds)


def test_entropy_beyond_proxy_window_degrades_but_stays_correct(spark):
    # boundaries share lcp AND the next 7 bytes: cells collapse, the
    # exact predicate alone must disambiguate
    pfx = "P" * 3 + "Q" * 7  # lcp ends inside, proxy window all 'Q'
    bounds = sorted(pfx + s for s in ["b", "f", "p"])
    probes = [pfx + s for s in ["a", "b", "c", "f", "g", "q"]]
    assert _run(spark, probes, bounds) == _expected(probes, bounds)


def test_single_region_table(spark):
    # one region ['', ''): no non-empty start boundary at all
    rdf = spark.createDataFrame([("r0", "", "")], ["region_id", "start_key", "end_key"])
    pdf = spark.createDataFrame([("x",), ("",), ("中中",)], ["probe_key"])
    got = locate_in_ranges(pdf, rdf).select("probe_key", "region_id").collect()
    assert sorted(r.probe_key for r in got) == ["", "x", "中中"]
    assert {r.region_id for r in got} == {"r0"}


def test_numeric_fixture_shape_unchanged(spark):
    # the sf fixture's zero-padded keys keep working (regression vs r1)
    bounds = [f"{i*137:012d}" for i in range(1, 40)]
    probes = [f"{i*53:012d}" for i in range(100)]
    assert _run(spark, probes, bounds) == _expected(probes, bounds)


def test_plan_is_hash_join_not_smj(spark):
    bounds = [f"{i:04d}" for i in range(1, 32)]
    rdf = spark.createDataFrame(
        _regions_from_boundaries(bounds), ["region_id", "start_key", "end_key"]
    )
    pdf = spark.range(500).select(
        F.lpad((F.col("id") * 7 % 9999).cast("string"), 4, "0").alias("probe_key")
    )
    plan = (
        locate_in_ranges(pdf, rdf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
