"""Multimodal column processing over the image+caption table.

Images/audio/video are opaque BINARY columns plus typed metadata; all
processing runs as Arrow-batched pandas functions over ``mapInPandas``.
Per SURVEY.md §7, this container has no image/audio libraries, so:

  * image decode / resize / feature-extract are REAL (the raw/q8 codecs
    in images.py are plain numpy transforms);
  * audio decode and video frame-sampling are STUBS: the Spark-side
    plumbing (schema, batching, UDF signatures, partitioning) is real
    and tested, but the codec call raises NotImplementedError unless
    handed the deterministic fake codec used in tests.

Each per-row body is O(payload-size) numpy work, so the per-row Python
overhead is amortized by the array math (same regime as any image
pipeline); the batch boundary stays Arrow-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .images import decode, phash64

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), False),
    ]
)


def resize_images(images_df: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Nearest-neighbor resize of every image to (out_w, out_h); output
    payload is raw uint8 RGB."""

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for t in pdf.itertuples(index=False):
                px = decode(t.bytes, t.fmt, t.w, t.h)
                ri = (np.arange(out_h) * t.h // out_h).astype(np.int64)
                ci = (np.arange(out_w) * t.w // out_w).astype(np.int64)
                small = px[ri][:, ci, :]
                rows.append((t.image_id, out_w, out_h,
                             np.clip(small, 0, 255).astype(np.uint8).tobytes()))
            yield pd.DataFrame(rows, columns=["image_id", "out_w", "out_h", "bytes"])

    return images_df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(fn, RESIZE_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
        T.StructField("std_gray", T.DoubleType(), False),
        T.StructField("phash_check", T.LongType(), False),
    ]
)


def image_features(images_df: DataFrame) -> DataFrame:
    """Per-image channel means, gray stddev, and a recomputed phash
    (useful as an integrity check against the stored column)."""

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for t in pdf.itertuples(index=False):
                px = decode(t.bytes, t.fmt, t.w, t.h)
                m = px.mean(axis=(0, 1))
                gray = px.mean(axis=2)
                ph = phash64(np.clip(px, 0, 255).astype(np.uint8)) if t.fmt == "raw" else phash64(
                    np.clip(np.round(px), 0, 255).astype(np.uint8)
                )
                rows.append((t.image_id, float(m[0]), float(m[1]), float(m[2]),
                             float(gray.std()), ph))
            yield pd.DataFrame(
                rows,
                columns=["image_id", "mean_r", "mean_g", "mean_b", "std_gray", "phash_check"],
            )

    return images_df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(fn, FEATURE_SCHEMA)


# -- audio / video: stubbed codecs, real plumbing ------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
    ]
)


def decode_audio_stub(b: bytes, codec: str) -> np.ndarray:
    """STUB: no audio codecs in this container. ``codec='pcm16'`` is the
    deterministic fake used by tests (int16 little-endian mono)."""
    if codec == "pcm16":
        return np.frombuffer(b, dtype="<i2").astype(np.float64) / 32768.0
    raise NotImplementedError(
        f"audio codec {codec!r} requires an external decoder (not in this container)"
    )


def audio_features(clips_df: DataFrame, codec_col: str = "codec") -> DataFrame:
    """clips_df: (clip_id string, bytes binary, codec string)."""

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for t in pdf.itertuples(index=False):
                samples = decode_audio_stub(t.bytes, getattr(t, codec_col))
                rms = float(np.sqrt(np.mean(samples * samples))) if len(samples) else 0.0
                rows.append((t.clip_id, len(samples), rms))
            yield pd.DataFrame(rows, columns=["clip_id", "n_samples", "rms"])

    return clips_df.mapInPandas(fn, AUDIO_FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), False),
    ]
)


def sample_frames_stub(b: bytes, codec: str, w: int, h: int, n_frames: int, every: int):
    """STUB: 'rawv' = concatenated raw RGB frames (the deterministic
    fake); real containers would call a video decoder here."""
    if codec != "rawv":
        raise NotImplementedError(
            f"video codec {codec!r} requires an external decoder (not in this container)"
        )
    frame_bytes = w * h * 3
    for i in range(0, n_frames, every):
        yield i, b[i * frame_bytes : (i + 1) * frame_bytes]


def sample_frames(videos_df: DataFrame, every: int = 2) -> DataFrame:
    """videos_df: (video_id, bytes, codec, w, h, n_frames) -> one row per
    sampled frame (the flatMap shape a real frame sampler needs)."""

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for t in pdf.itertuples(index=False):
                for idx, fb in sample_frames_stub(t.bytes, t.codec, t.w, t.h, t.n_frames, every):
                    rows.append((t.video_id, idx, fb))
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "bytes"])

    return videos_df.mapInPandas(fn, FRAME_SCHEMA)
