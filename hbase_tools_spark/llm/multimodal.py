"""Multimodal column handling (M8): images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode/feature-extraction libraries (PIL/ffmpeg/torchaudio) are not
in this container, so the decode step is STUBBED behind
``decode_stub=True`` (deterministic fake features) /
``NotImplementedError`` otherwise — but the Spark-side plumbing is real
and tested: binary column + metadata struct schema, mapInPandas batch
iteration, output schema contract, partition-parallel execution.

Scale: mapInPandas streams Arrow batches — constant memory per task;
repartition by doc_id spreads decode cost; no shuffle after extraction
(narrow output aligned with input partitioning).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Model
from ..registry import query

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, feature array<double>"
)


def _decode_and_featurize(decode_stub: bool):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not in this container"
                )
            n = pdf["payload"].map(len)
            # deterministic fake decode: dims + an 4-dim byte-stat feature
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n.astype("int64"),
                    "width": (n % 640).astype("int32"),
                    "height": (n % 480).astype("int32"),
                    "feature": [
                        [float(len(p)), float(p[0]) if len(p) else 0.0,
                         float(p[-1]) if len(p) else 0.0, float(sum(p[:16]) % 256)]
                        for p in pdf["payload"]
                    ],
                }
            )

    return fn


def media_table(m: Model) -> DataFrame:
    """Synthesize the opaque-binary media table from documents: payload =
    UTF-8 bytes standing in for encoded image/audio bytes, plus typed
    metadata — the schema contract a real ingest would produce."""
    return m.documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


@query("multimodal_features", oracle=None)
def multimodal_features(m: Model) -> DataFrame:
    """Binary-column feature extraction via mapInPandas (stubbed decode,
    real plumbing).  Rows-only checked by the driver; batch-shape and
    schema asserted in tests/test_llm.py."""
    media = media_table(m)
    return media.mapInPandas(_decode_and_featurize(decode_stub=True), FEATURE_SCHEMA)
