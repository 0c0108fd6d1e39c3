"""Multimodal column plumbing: image/audio/video as opaque binary.

Model: a multimodal asset is a row with a ``binary`` payload column +
typed metadata (modality, mime, width/height/duration, …). The
Spark-side plumbing — schema, batching, partition-sized Arrow
transfer via ``mapInPandas`` — is real and tested; the actual codec
work (image decode, resample, frame extraction) is stubbed because
media libraries are not available in this environment. Each stub is a
deterministic fake keyed off the payload bytes so pipelines are
testable end-to-end; swap ``_decode_stub``/``_frame_sample_stub`` for
PIL/ffmpeg calls in production.

Scale notes: payloads ride in parquet binary columns; keep row groups
small enough that an Arrow batch of payloads fits executor memory
(``spark.sql.files.maxPartitionBytes`` and
``spark.sql.execution.arrow.maxRecordsPerBatch`` are the knobs).
Feature extraction is a mapInPandas pass — no shuffle; the expensive
bytes never leave their input partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

#: Canonical multimodal asset schema.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_s", DoubleType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_std", DoubleType()),
    ]
)


def _decode_stub(payload: bytes) -> "tuple[float, float]":
    """Deterministic fake decode: byte-value mean/std of the payload.

    Production implementation decodes the media (PIL / soundfile /
    ffmpeg) and computes features over pixels/samples; not available
    in this container (SURVEY-mandated stub). The byte stats run
    vectorized over ``np.frombuffer`` — zero-copy view of the payload,
    no per-byte Python — which is the template production decode
    kernels should follow.
    """
    if payload is None or len(payload) == 0:
        return (0.0, 0.0)
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return (float(arr.mean()), float(arr.std()))


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-asset feature extraction via mapInPandas (Arrow-batched).

    One pass, no shuffle; binary payloads stay partition-local.
    """
    import hashlib

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_md5": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feat_mean": [f[0] for f in feats],
                    "feat_std": [f[1] for f in feats],
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing; decode/resample stubbed.

    The stub truncates/pads the payload to width*height bytes so batch
    shapes and downstream schemas are exercised for real.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        target = width * height
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                (p[:target].ljust(target, b"\x00") if p is not None else None)
                for p in pdf["payload"]
            ]
            out["meta_width"] = width
            out["meta_height"] = height
            yield out

    return assets.where(F.col("modality") == "image").mapInPandas(run, ASSET_SCHEMA)


def sample_frames(assets: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame sampling plumbing (1 row per sampled frame).

    Real implementation seeks the container with ffmpeg; the stub
    emits one fake frame per ``every_s`` of metadata duration with a
    deterministic payload slice, preserving the fan-out shape
    (explode-like row multiplication inside mapInPandas).
    """
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_ts_s", DoubleType()),
            StructField("frame_payload", BinaryType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # vectorized fan-out: frame counts per asset, then one
            # np.repeat / concatenated-arange expansion — no iterrows.
            dur = pdf["meta_duration_s"].fillna(0.0).to_numpy(dtype=np.float64)
            n_frames = np.maximum((dur / every_s).astype(np.int64), 1)
            asset_ids = np.repeat(
                pdf["asset_id"].to_numpy(dtype=np.int64), n_frames
            )
            # per-frame index 0..n_frames[i]-1 for each asset, built
            # without a Python loop: global arange minus each frame
            # row's group-start offset.
            total = int(n_frames.sum())
            starts = np.repeat(np.cumsum(n_frames) - n_frames, n_frames)
            frame_idx = np.arange(total, dtype=np.int64) - starts
            payloads = np.repeat(
                pdf["payload"].apply(lambda p: p or b"").to_numpy(dtype=object),
                n_frames,
            )
            frame_payload = [
                bytes(p[i : i + 16]) for p, i in zip(payloads, frame_idx)
            ]
            yield pd.DataFrame(
                {
                    "asset_id": asset_ids,
                    "frame_idx": frame_idx.astype(np.int32),
                    "frame_ts_s": frame_idx * every_s,
                    "frame_payload": frame_payload,
                }
            )

    return assets.where(F.col("modality") == "video").mapInPandas(run, schema)
