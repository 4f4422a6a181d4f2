"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata; the
Spark-side plumbing — schema, partition-preserving mapInPandas, Arrow
batch shapes, deterministic synthetic payloads — is real and tested.
Actual codec decode is STUBBED: the container has no image/audio
libraries, so `decode_image`/`decode_audio` raise NotImplementedError
unless the payload uses the engine's deterministic FAKE container format
(header-framed raw bytes), which exercises every other part of the path.

FAKE container formats:
  image: b"FIMG|" + w(le32) + h(le32) + c(le32) + w*h*c raw bytes
  audio: b"FAUD|" + sr(le32) + n(le32)  + n int16 samples (le)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hashing import hash_stream

IMAGE_MAGIC = b"FIMG|"
AUDIO_MAGIC = b"FAUD|"


def make_fake_image(idx: int, w: int = 16, h: int = 12, c: int = 3) -> bytes:
    px = (hash_stream(np.arange(w * h * c) + idx * 1_000_003, 77) % np.uint64(256)).astype(
        np.uint8
    )
    return IMAGE_MAGIC + struct.pack("<III", w, h, c) + px.tobytes()


def make_fake_audio(idx: int, sr: int = 8000, n: int = 1600) -> bytes:
    t = np.arange(n, dtype=np.float64)
    f = 100.0 + (idx % 40) * 10.0
    samples = (np.sin(2 * np.pi * f * t / sr) * 10000).astype("<i2")
    return AUDIO_MAGIC + struct.pack("<II", sr, n) + samples.tobytes()


def decode_image_bytes(payload: bytes) -> np.ndarray:
    """Decode a FAKE-container image to (h, w, c) uint8. Real codecs
    (JPEG/PNG/...) are intentionally unimplemented in this environment."""
    if payload is None:
        return None
    if not payload.startswith(IMAGE_MAGIC):
        raise NotImplementedError(
            "real image codecs unavailable in this container; expected FIMG fake format"
        )
    w, h, c = struct.unpack_from("<III", payload, len(IMAGE_MAGIC))
    off = len(IMAGE_MAGIC) + 12
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * c, offset=off).reshape(h, w, c)


def decode_audio_bytes(payload: bytes) -> tuple[int, np.ndarray]:
    if payload is None:
        return None
    if not payload.startswith(AUDIO_MAGIC):
        raise NotImplementedError(
            "real audio codecs unavailable in this container; expected FAUD fake format"
        )
    sr, n = struct.unpack_from("<II", payload, len(AUDIO_MAGIC))
    off = len(AUDIO_MAGIC) + 8
    return sr, np.frombuffer(payload, dtype="<i2", count=n, offset=off)


def media_table(spark, n: int = 1000) -> DataFrame:
    """Deterministic synthetic media table: (media_id, kind, payload,
    width, height, channels, sample_rate, n_samples)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                if i % 2 == 0:
                    rows.append((int(i), "image", make_fake_image(int(i)), 16, 12, 3, None, None))
                else:
                    rows.append((int(i), "audio", make_fake_audio(int(i)), None, None, None, 8000, 1600))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "channels", "sample_rate", "n_samples",
                ],
            )

    schema = (
        "media_id long, kind string, payload binary, width int, height int, "
        "channels int, sample_rate int, n_samples int"
    )
    return spark.range(0, n, numPartitions=8).mapInPandas(gen, schema=schema)


IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "mean_r double, mean_g double, mean_b double, brightness double"
)


def image_features(media: DataFrame) -> DataFrame:
    """Per-image channel means via mapInPandas (Arrow batches of binary).

    The decode step is the stub; batch shape, schema and partitioning are
    the production plumbing.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                im = decode_image_bytes(bytes(payload))
                means = im.reshape(-1, im.shape[2]).mean(axis=0)
                out.append(
                    (
                        int(mid), im.shape[1], im.shape[0], im.shape[2],
                        float(means[0]), float(means[1]), float(means[2]),
                        float(means.mean()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "channels",
                    "mean_r", "mean_g", "mean_b", "brightness",
                ],
            )

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        fn, schema=IMAGE_FEATURES_SCHEMA
    )


def _resize_nearest(im: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w, _ = im.shape
    yi = np.arange(out_h) * h // out_h
    xi = np.arange(out_w) * w // out_w
    return im[yi][:, xi]


def _resize_bilinear(im: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Pixel-center-aligned bilinear resample (the convention GDAL's
    bilinear warp uses): out center (i+0.5) maps to src (i+0.5)*scale-0.5,
    edges clamped. Fully vectorized gather + lerp; uint8 out rounds
    half-up like a 0.5 offset + truncate."""
    h, w, _ = im.shape
    fy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    fx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    a = im[y0][:, x0].astype(np.float64)
    b = im[y0][:, x1].astype(np.float64)
    c = im[y1][:, x0].astype(np.float64)
    d = im[y1][:, x1].astype(np.float64)
    top = a * (1.0 - wx) + b * wx
    bot = c * (1.0 - wx) + d * wx
    out = top * (1.0 - wy) + bot * wy
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def resize_images(media: DataFrame, out_w: int, out_h: int, mode: str = "nearest") -> DataFrame:
    """Resample images inside the fake container (S6 warp analog): the
    reference's warp_image_to_target switches gdal.Warp between bilinear
    (continuous bands) and nearest (masks / categorical) at
    SDS_download.py:903-964 (mode choice :934-940); this operator mirrors
    both modes. decode -> vectorized resample -> re-encode, one Arrow
    batch at a time."""
    if mode not in ("nearest", "bilinear"):
        raise ValueError(f"mode must be 'nearest' or 'bilinear', got {mode!r}")
    resample = _resize_nearest if mode == "nearest" else _resize_bilinear

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                im = decode_image_bytes(bytes(payload))
                c = im.shape[2]
                resized = resample(im, out_w, out_h)
                enc = IMAGE_MAGIC + struct.pack("<III", out_w, out_h, c) + resized.tobytes()
                rows.append((int(mid), enc, out_w, out_h))
            yield pd.DataFrame(rows, columns=["media_id", "payload", "width", "height"])

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        fn, schema="media_id long, payload binary, width int, height int"
    )


def audio_frame_samples(media: DataFrame, frame_ms: int = 25) -> DataFrame:
    """Frame-sample audio payloads: per-frame RMS energy rows (UDTF-shaped
    mapInPandas: one binary row -> many frame rows)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sr, samples = decode_audio_bytes(bytes(payload))
                flen = max(int(sr * frame_ms / 1000), 1)
                nf = len(samples) // flen
                x = samples[: nf * flen].astype(np.float64).reshape(nf, flen)
                rms = np.sqrt((x * x).mean(axis=1))
                rows.extend(
                    (int(mid), int(i), float(r)) for i, r in enumerate(rms)
                )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "rms"])

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        fn, schema="media_id long, frame_idx int, rms double"
    )
