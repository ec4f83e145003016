"""Targeted tests for the non-SQL-oracle LLM operators: simhash
(differential vs a pure-Python port) and multimodal plumbing (schema +
batch behavior)."""

from __future__ import annotations

import hashlib

from conftest import SF_DIR

from hbase_tools_spark.catalog import load_model


def _py_simhash16(text: str) -> int:
    counts = [0] * 16
    for w in text.split(" "):
        h = int(hashlib.md5(w.encode()).hexdigest()[:4], 16)
        for b in range(16):
            counts[b] += 1 if (h >> b) & 1 else -1
    v = 0
    for b in range(16):
        if counts[b] > 0:
            v |= 1 << b
    return v


def test_simhash_matches_python_port(spark):
    from hbase_tools_spark.llm.text import simhash_fingerprints

    m = load_model(spark, SF_DIR)
    got = {r["doc_id"]: r["simhash16"] for r in simhash_fingerprints(m).collect()}
    docs = {r["doc_id"]: r["text"] for r in m.documents.collect()}
    assert len(got) == len(docs)
    for doc_id, text in docs.items():
        assert got[doc_id] == _py_simhash16(text), doc_id


def test_multimodal_features_schema_and_values(spark):
    from hbase_tools_spark.llm.multimodal import media_table, multimodal_features

    m = load_model(spark, SF_DIR)
    df = multimodal_features(m)
    assert df.columns == ["doc_id", "media_type", "n_bytes", "width", "height", "feature"]
    rows = {r["doc_id"]: r for r in df.collect()}
    src = {r["doc_id"]: r for r in media_table(m).collect()}
    assert set(rows) == set(src)
    for doc_id, r in rows.items():
        payload = bytes(src[doc_id]["payload"])
        assert r["n_bytes"] == len(payload)
        assert r["width"] == len(payload) % 640
        assert len(r["feature"]) == 4
        assert r["feature"][0] == float(len(payload))


def test_multimodal_decode_stub_raises(spark):
    import pytest

    from hbase_tools_spark.llm.multimodal import _decode_and_featurize, media_table

    m = load_model(spark, SF_DIR)
    fn = _decode_and_featurize(decode_stub=False)
    import pandas as pd

    with pytest.raises(NotImplementedError):
        list(fn(iter([pd.DataFrame({"doc_id": [1], "media_type": ["image/png"], "payload": [b"x"]})])))
