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


RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, target_w int, target_h int, "
    "out_bytes bigint, resized binary"
)


def _resize(target_w: int, target_h: int, decode_stub: bool):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        budget = target_w * target_h // 64
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resize requires PIL; not in this container"
                )
            # deterministic fake resize: re-encode to a byte budget
            # proportional to the target resolution (truncate or tile)
            resized = [
                bytes(p[:budget]) if len(p) >= budget
                else bytes((p * (budget // max(len(p), 1) + 1))[:budget])
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "out_bytes": [len(r) for r in resized],
                    "resized": resized,
                }
            )

    return fn


@query("multimodal_resize", oracle=None)
def multimodal_resize(m: Model) -> DataFrame:
    """Image-resize plumbing via mapInPandas (stubbed decode): binary
    in, binary out, typed target metadata.  The Arrow batch never
    leaves the task, so at 100 TB this is a pure map stage whose cost
    scales with bytes, not rows."""
    media = media_table(m).filter(F.col("media_type") == "image/png")
    return media.mapInPandas(_resize(64, 64, decode_stub=True), RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_ts_ms bigint, frame binary"
)

_FRAME_BYTES = 32   # fake frame payload size
_SAMPLE_EVERY = 4   # keep every 4th frame
_FPS = 25


def _frame_sample(decode_stub: bool):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg; not in this container"
                )
            out = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(p) // _FRAME_BYTES, 1)
                for idx in range(0, n_frames, _SAMPLE_EVERY):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_ts_ms"].append(idx * 1000 // _FPS)
                    out["frame"].append(
                        bytes(p[idx * _FRAME_BYTES : (idx + 1) * _FRAME_BYTES])
                    )
            yield pd.DataFrame(out)

    return fn


@query("multimodal_frame_sample", oracle=None)
def multimodal_frame_sample(m: Model) -> DataFrame:
    """Video frame sampling via mapInPandas (stubbed decode): one input
    row fans out to its sampled frames — the UDTF-shaped multimodal op.
    Output rows stay in their input partition (no shuffle); downstream
    per-frame featurization chains another map stage."""
    media = media_table(m).filter(F.col("media_type") == "video/mp4")
    return media.mapInPandas(_frame_sample(decode_stub=True), FRAME_SCHEMA)
