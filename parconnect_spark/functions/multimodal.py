"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata.

The decode kernels themselves are STUBBED (the image/audio libraries are
not in this container): ``decode_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces deterministic fake features so the
Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested end-to-end. On a cluster with PIL/ffmpeg
available, only the marked kernel body changes.

Everything flows through ``mapInPandas`` (Arrow batches; numpy over the
binary buffers — no per-row Python beyond the iterator protocol).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, checksum long, "
    "feature array<float>"
)


def synth_media(spark: SparkSession, n: int = 64, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table: payload = splitmix64-derived bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            kinds = np.where(ids % 3 == 0, "image", np.where(ids % 3 == 1, "audio", "video"))
            payloads = []
            for i in ids:
                x = (np.arange(payload_bytes, dtype=np.uint64) + np.uint64(i) * np.uint64(0x9E3779B97F4A7C15))
                z = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                payloads.append((z & np.uint64(0xFF)).astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "payload": payloads,
                    "width": np.where(kinds == "image", 64, 0).astype("int32"),
                    "height": np.where(kinds == "image", 64, 0).astype("int32"),
                    "sample_rate": np.where(kinds == "audio", 16000, 0).astype("int32"),
                    "duration_ms": np.where(kinds != "image", 1000, 0).astype("int32"),
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, fake: bool = True, feat_dim: int = 8) -> DataFrame:
    """Decode + featurize each media row in Arrow batches.

    With ``fake=True``: checksum + byte-histogram-derived features (pure
    numpy, deterministic). With ``fake=False``: raises NotImplementedError —
    REAL DECODE STUB: replace this branch with PIL/torchaudio/ffmpeg decode
    on a cluster where those libs exist.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this environment; run with fake=True for plumbing"
                )
            feats = []
            checksums = []
            nbytes = []
            for buf in pdf["payload"]:
                arr = np.frombuffer(buf, dtype=np.uint8)
                nbytes.append(len(arr))
                checksums.append(int(arr.astype(np.uint64).sum()))
                hist = np.bincount(arr >> 5, minlength=feat_dim)[:feat_dim]
                feats.append((hist / max(len(arr), 1)).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "checksum": pd.Series(checksums, dtype="int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 250, fake: bool = True) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (decode stubbed like extract_features)."""
    if not fake:
        raise NotImplementedError("real frame decode not available here")
    frames = media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
    )
    return frames
