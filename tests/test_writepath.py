"""SC11 write-path semantics vs a sequential-replay oracle (SURVEY.md
M6): replay every mutation in sequence order against an in-memory cell
store — the semantics the reference's buffered mutator implements
imperatively (SequenceBufferedMutator.java:201-300) — and require the
window-dedup query to produce the identical final state."""

from __future__ import annotations

import hbase_tools_spark.operators  # noqa: F401
from hbase_tools_spark.catalog import load_model
from hbase_tools_spark.registry import QUERIES
from tests.conftest import SF_DIR


def test_upsert_dedup_equals_sequential_replay(spark):
    m = load_model(spark, SF_DIR)
    muts = m.mutations.collect()

    # oracle: imperative replay in ascending sequence order
    store: dict = {}
    for r in sorted(muts, key=lambda r: r["seq"]):
        key = (r["row_key"], r["qualifier"])
        if r["is_delete"]:
            store.pop(key, None)
            store[key] = None  # tombstone masks prior values
        else:
            store[key] = (r["seq"], r["val"])
    expected = {
        k: v for k, v in store.items() if v is not None
    }

    got = {
        (r["row_key"], r["qualifier"]): (r["seq"], r["val"])
        for r in QUERIES["upsert_dedup"].fn(m).collect()
    }
    assert got == expected


def test_replay_counts_audit(spark):
    m = load_model(spark, SF_DIR)
    muts = m.mutations.collect()
    per_key: dict = {}
    for r in muts:
        c = per_key.setdefault(r["row_key"], [0, 0, -1])
        c[0] += 1
        c[1] += 1 if r["is_delete"] else 0
        c[2] = max(c[2], r["seq"])
    got = {
        r["row_key"]: [r["mutations"], r["deletes"], r["last_seq"]]
        for r in QUERIES["mutation_replay_counts"].fn(m).collect()
    }
    assert got == per_key
