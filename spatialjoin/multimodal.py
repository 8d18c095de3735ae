"""Multimodal column processing over the image+caption table.

Images/audio/video are opaque BINARY columns plus typed metadata; all
processing runs as Arrow-batched pandas functions over ``mapInPandas``.
Per SURVEY.md §7, this container has no image/audio libraries, so every
codec here is a REAL deterministic numpy transform (same pattern as the
raw/q8 image codecs in images.py):

  * image decode / resize / feature-extract (images.py raw/q8);
  * audio: pcm16 (lossless int16) and ulaw8 (ITU-T G.711 mu-law
    companding — the published standard formula, vectorized);
  * video: rawv (concatenated raw RGB8 frames) and rled (per-frame
    delta + run-length coding, lossless).

Swapping in an external decoder (libsndfile/ffmpeg) in a richer
container only replaces decode_audio/decode_video_frames — the
Spark-side plumbing (schema, batching, UDF signatures, flatMap shape)
is codec-agnostic. Each per-row body is O(payload-size) numpy work, so
the per-row Python overhead is amortized by the array math; the batch
boundary stays Arrow-sized.
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


# -- audio: real numpy codecs --------------------------------------------------
#
# pcm16  : int16 little-endian mono (lossless; decode = frombuffer).
# ulaw8  : ITU-T G.711 mu-law companding, 8 bits/sample — the published
#          standard formula (BIAS 0x84, CLIP 32635), implemented as
#          vectorized integer math; one byte per sample, bijective on
#          its 255 canonical codes.

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def encode_pcm16(samples: np.ndarray) -> bytes:
    """float samples in [-1, 1) -> int16 LE bytes (round-half-even)."""
    x = np.clip(np.rint(np.asarray(samples, dtype=np.float64) * 32768.0),
                -32768, 32767)
    return x.astype("<i2").tobytes()


def encode_ulaw8(samples_i16: np.ndarray) -> bytes:
    """int16 samples -> G.711 mu-law bytes."""
    x = np.asarray(samples_i16, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    # segment number: floor(log2(mag)) - 7 in 0..7 (mag is 132..32767,
    # exactly representable in float64, so the floor is exact)
    exponent = np.floor(np.log2(mag)).astype(np.int64) - 7
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return ((~(sign | (exponent << 4) | mantissa)) & 0xFF).astype(np.uint8).tobytes()


def decode_ulaw8(b: bytes) -> np.ndarray:
    """G.711 mu-law bytes -> int16 samples."""
    u = (~np.frombuffer(b, dtype=np.uint8).astype(np.int64)) & 0xFF
    e = (u >> 4) & 0x07
    m = u & 0x0F
    mag = (((m << 3) + _ULAW_BIAS) << e) - _ULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def decode_audio(b: bytes, codec: str) -> np.ndarray:
    """Decoded mono samples as float64 in [-1, 1)."""
    if codec == "pcm16":
        return np.frombuffer(b, dtype="<i2").astype(np.float64) / 32768.0
    if codec == "ulaw8":
        return decode_ulaw8(b).astype(np.float64) / 32768.0
    raise ValueError(f"unknown audio codec {codec!r} (supported: pcm16, ulaw8)")


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
    ]
)


def audio_features(clips_df: DataFrame, codec_col: str = "codec") -> DataFrame:
    """clips_df: (clip_id string, bytes binary, codec string)."""

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for t in pdf.itertuples(index=False):
                samples = decode_audio(t.bytes, getattr(t, codec_col))
                rms = float(np.sqrt(np.mean(samples * samples))) if len(samples) else 0.0
                rows.append((t.clip_id, len(samples), rms))
            yield pd.DataFrame(rows, columns=["clip_id", "n_samples", "rms"])

    return clips_df.mapInPandas(fn, AUDIO_FEATURE_SCHEMA)


# -- video: real numpy codecs --------------------------------------------------
#
# rawv : concatenated raw RGB8 frames (w*h*3 bytes each; lossless).
# rled : per-frame DELTA vs the previous frame (mod-256), run-length
#        encoded as (count:uint8 1..255, value:uint8) pairs, each frame
#        prefixed with a uint32-LE payload length. Lossless, and small
#        for the static-background content video corpora are full of.


def _rle_encode(a: np.ndarray) -> bytes:
    a = np.ascontiguousarray(a, dtype=np.uint8).ravel()
    n = len(a)
    if n == 0:
        return b""
    bounds = np.flatnonzero(np.diff(a)) + 1
    starts = np.concatenate([[0], bounds])
    lens = np.diff(np.concatenate([starts, [n]]))
    reps = -(-lens // 255)  # chunks per run (runs > 255 split)
    values = np.repeat(a[starts], reps)
    counts = np.full(int(reps.sum()), 255, dtype=np.int64)
    counts[np.cumsum(reps) - 1] = lens - (reps - 1) * 255
    out = np.empty(2 * len(counts), dtype=np.uint8)
    out[0::2] = counts
    out[1::2] = values
    return out.tobytes()


def _rle_decode(b: bytes) -> np.ndarray:
    arr = np.frombuffer(b, dtype=np.uint8)
    return np.repeat(arr[1::2], arr[0::2].astype(np.int64))


def encode_rled(frames) -> bytes:
    """frames: iterable of (h, w, 3) uint8 arrays -> rled bytes."""
    import struct

    chunks = []
    prev = None
    for f in frames:
        cur = np.ascontiguousarray(f, dtype=np.uint8).ravel()
        delta = cur if prev is None else (cur.astype(np.int16) - prev.astype(np.int16)) % 256
        payload = _rle_encode(delta.astype(np.uint8))
        chunks.append(struct.pack("<I", len(payload)) + payload)
        prev = cur
    return b"".join(chunks)


def decode_video_frames(b: bytes, codec: str, w: int, h: int, n_frames: int):
    """Yield (frame_idx, raw RGB8 bytes) for every frame, in order."""
    frame_bytes = w * h * 3
    if codec == "rawv":
        for i in range(n_frames):
            yield i, b[i * frame_bytes : (i + 1) * frame_bytes]
        return
    if codec != "rled":
        raise ValueError(f"unknown video codec {codec!r} (supported: rawv, rled)")
    import struct

    pos = 0
    prev = np.zeros(frame_bytes, dtype=np.uint8)
    for i in range(n_frames):
        (plen,) = struct.unpack_from("<I", b, pos)
        pos += 4
        delta = _rle_decode(b[pos : pos + plen])
        pos += plen
        prev = ((prev.astype(np.int16) + delta.astype(np.int16)) % 256).astype(np.uint8) \
            if i else delta
        yield i, prev.tobytes()


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), False),
    ]
)


def sample_frames(videos_df: DataFrame, every: int = 2) -> DataFrame:
    """videos_df: (video_id, bytes, codec, w, h, n_frames) -> one row per
    sampled frame (the flatMap shape a real frame sampler needs).
    Delta-coded streams decode sequentially; sampling keeps every
    ``every``-th frame."""

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for t in pdf.itertuples(index=False):
                for idx, fb in decode_video_frames(t.bytes, t.codec, t.w, t.h, t.n_frames):
                    if idx % every == 0:
                        rows.append((t.video_id, idx, fb))
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "bytes"])

    return videos_df.mapInPandas(fn, FRAME_SCHEMA)
