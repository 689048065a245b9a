"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches via ``mapInPandas``.

Real decode kernels, no external libs:

* images — PPM (P6) and uncompressed 24-bit BMP, decoded with pure numpy
  (``decode_image``), plus a vectorized nearest-neighbor ``resize``.
* audio — RIFF/WAV PCM16, decoded with the stdlib ``wave`` module +
  numpy (``decode_wav``).
* video — STUBBED: no codec exists in this container, so ``fake=False``
  raises NotImplementedError for video rows; the Spark-side plumbing
  (schema, Arrow batch shape, frame-timestamp explode) is real and tested.
  On a cluster with ffmpeg bindings, only the marked kernel body changes.

``synth_media`` generates deterministic VALID payloads (real PPM images,
real WAV audio), so the decode kernels run end-to-end in tests.
"""

from __future__ import annotations

import io
import struct
import wave
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


# --------------------------------------------------------------------------
# decode kernels (pure numpy / stdlib)
# --------------------------------------------------------------------------


def decode_image(buf: bytes) -> np.ndarray:
    """(H, W, 3) uint8 from a PPM (P6) or uncompressed 24-bit BMP buffer."""
    if buf[:2] == b"P6":
        # PPM: "P6\n<w> <h>\n<maxval>\n" then raw RGB
        parts = []
        pos = 2
        while len(parts) < 3:
            while pos < len(buf) and buf[pos : pos + 1].isspace():
                pos += 1
            if buf[pos : pos + 1] == b"#":  # comment line
                pos = buf.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(buf) and not buf[pos : pos + 1].isspace():
                pos += 1
            parts.append(int(buf[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = parts
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        raster = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
        return raster.reshape(h, w, 3)
    if buf[:2] == b"BM":
        # BMP: little-endian header; only BI_RGB 24bpp
        data_off = struct.unpack_from("<I", buf, 10)[0]
        w = struct.unpack_from("<i", buf, 18)[0]
        h = struct.unpack_from("<i", buf, 22)[0]
        bpp = struct.unpack_from("<H", buf, 28)[0]
        comp = struct.unpack_from("<I", buf, 30)[0]
        if bpp != 24 or comp != 0:
            raise ValueError("only uncompressed 24-bit BMP supported")
        flip = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            buf, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]  # BGR → RGB
        return rgb[::-1] if flip else rgb
    raise ValueError("unsupported image format (PPM P6 / 24-bit BMP only)")


def encode_ppm(arr: np.ndarray) -> bytes:
    """Inverse of decode_image for the PPM case (test/synthesis helper)."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (numpy fancy indexing)."""
    h, w = arr.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[yi][:, xi]


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """(samples float32 in [-1,1] mono-mixed, sample_rate) from WAV PCM16."""
    with wave.open(io.BytesIO(buf), "rb") as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        raw = wf.readframes(wf.getnframes())
    pcm = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1)
    return pcm, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Inverse of decode_wav (test/synthesis helper)."""
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return bio.getvalue()


def _image_features(arr: np.ndarray, feat_dim: int) -> np.ndarray:
    """Per-channel mean/std + coarse luma histogram, fixed feat_dim."""
    f = np.zeros(feat_dim, dtype=np.float32)
    means = arr.reshape(-1, 3).mean(axis=0) / 255.0
    stds = arr.reshape(-1, 3).std(axis=0) / 255.0
    base = np.concatenate([means, stds])
    luma = arr.reshape(-1, 3).astype(np.float32) @ np.array(
        [0.299, 0.587, 0.114], dtype=np.float32
    )
    nbins = max(feat_dim - 6, 1)
    hist = np.histogram(luma, bins=nbins, range=(0.0, 255.0))[0]
    rest = hist / max(luma.size, 1)
    f[: min(6, feat_dim)] = base[: min(6, feat_dim)]
    f[6 : 6 + nbins] = rest[: max(feat_dim - 6, 0)]
    return f


def _audio_features(samples: np.ndarray, feat_dim: int) -> np.ndarray:
    """RMS, zero-crossing rate, then coarse FFT band energies."""
    f = np.zeros(feat_dim, dtype=np.float32)
    if samples.size == 0:
        return f
    f[0] = float(np.sqrt(np.mean(samples**2)))
    f[1] = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8))))) if samples.size > 1 else 0.0
    nb = max(feat_dim - 2, 1)
    spec = np.abs(np.fft.rfft(samples))
    bands = np.array_split(spec, nb)
    energy = np.array([b.mean() if b.size else 0.0 for b in bands], dtype=np.float32)
    total = energy.sum() or 1.0
    f[2 : 2 + nb] = (energy / total)[: max(feat_dim - 2, 0)]
    return f


# --------------------------------------------------------------------------
# Spark operators
# --------------------------------------------------------------------------


def synth_media(spark: SparkSession, n: int = 64, payload_bytes: int = 256) -> DataFrame:
    """Deterministic media table with VALID payloads: PPM images, WAV PCM16
    audio; video rows carry splitmix64 opaque bytes (no in-container codec)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            kinds = np.where(ids % 3 == 0, "image", np.where(ids % 3 == 1, "audio", "video"))
            payloads = []
            for i, kind in zip(ids, kinds):
                x = (
                    np.arange(max(payload_bytes, 16 * 16 * 3), dtype=np.uint64)
                    + np.uint64(i) * np.uint64(0x9E3779B97F4A7C15)
                )
                z = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                noise = (z & np.uint64(0xFF)).astype(np.uint8)
                if kind == "image":
                    img = noise[: 16 * 16 * 3].reshape(16, 16, 3)
                    payloads.append(encode_ppm(img))
                elif kind == "audio":
                    t = np.arange(1600, dtype=np.float32)
                    freq = 100.0 + float(i % 17) * 50.0
                    wave_f = 0.5 * np.sin(2 * np.pi * freq * t / 16000.0)
                    payloads.append(encode_wav(wave_f, 16000))
                else:
                    payloads.append(noise[:payload_bytes].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "payload": payloads,
                    "width": np.where(kinds == "image", 16, 0).astype("int32"),
                    "height": np.where(kinds == "image", 16, 0).astype("int32"),
                    "sample_rate": np.where(kinds == "audio", 16000, 0).astype("int32"),
                    "duration_ms": np.where(kinds != "image", 100, 0).astype("int32"),
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, fake: bool = False, feat_dim: int = 8) -> DataFrame:
    """Decode + featurize each media row in Arrow batches.

    ``fake=False`` (default): REAL decode — PPM/BMP images and WAV audio via
    the numpy kernels above; video rows raise NotImplementedError (REAL
    VIDEO DECODE STUB — swap in ffmpeg bindings on a cluster that has them).
    ``fake=True``: checksum + byte-histogram features over the raw bytes for
    any kind (plumbing mode, also the only mode that accepts video rows).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            checksums = []
            nbytes = []
            for buf, kind in zip(pdf["payload"], pdf["kind"]):
                arr = np.frombuffer(buf, dtype=np.uint8)
                nbytes.append(len(arr))
                checksums.append(int(arr.astype(np.uint64).sum()))
                if fake:
                    hist = np.bincount(arr >> 5, minlength=feat_dim)[:feat_dim]
                    feats.append((hist / max(len(arr), 1)).astype(np.float32))
                elif kind == "image":
                    feats.append(_image_features(decode_image(bytes(buf)), feat_dim))
                elif kind == "audio":
                    samples, _ = decode_wav(bytes(buf))
                    feats.append(_audio_features(samples, feat_dim))
                else:
                    raise NotImplementedError(
                        "video decode requires codec libs not present in "
                        "this environment; run with fake=True for plumbing"
                    )
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


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Decode PPM/BMP rows, nearest-neighbor resize, re-encode as PPM —
    the standard image-normalization pass of a multimodal training
    pipeline, all inside one Arrow kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for buf in pdf["payload"]:
                img = decode_image(bytes(buf))
                out.append(encode_ppm(resize_nearest(img, out_w, out_h)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": pd.Series([out_w] * len(out), dtype="int32"),
                    "height": pd.Series([out_h] * len(out), dtype="int32"),
                }
            )

    imgs = media.where(F.col("kind") == "image")
    return imgs.mapInPandas(
        kernel, schema="media_id long, payload binary, width int, height int"
    )


def frame_sample(media: DataFrame, every_ms: int = 250, fake: bool = True) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (frame decode itself stubbed — see extract_features)."""
    if not fake:
        raise NotImplementedError("real frame decode not available here")
    frames = media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
    )
    return frames
