"""Synthetic image+caption table (the BASELINE.json input_hint shape)
plus the codecs and geometry derivations the engine queries use.

Schema: (image_id:string, bytes:binary, w:int, h:int, fmt:string,
caption:string, phash:long) — generated deterministically (seeded by
row index only, so any subset/partitioning yields identical rows).

Codecs are real numpy transforms (no external image libs in this
environment, per SURVEY.md §7):
  fmt='raw': RGB8 array .tobytes(); decode = frombuffer + reshape.
  fmt='q8' : lossy 32-levels-per-channel quantization; decode
             reconstructs bin centers; PSNR vs the source pixels is
             ~40.9 dB >= the north rule's 40 dB bar.

Geometry derivations (both vectorized, engine-side JVM where possible):
  footprint quad — convex rhombus centered at (lon, lat) = f(phash),
  half-sizes from (w, h); the indexed 'small' side.
  caption point — (lon, lat) parsed back out of the caption text with
  built-in regexp functions (pure JVM); the probe 'big' side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

_W_CHOICES = np.array([16, 32, 64])
_H_CHOICES = np.array([16, 32, 48])
_MIX = np.int64(2654435761)
_MIX2 = np.int64(40503)
_MOD = np.int64(1_000_000)


def _pixels_for(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic per-index pixel field (counter-based, no RNG state)."""
    n = w * h * 3
    base = (np.int64(i) * _MIX) & np.int64(0x7FFFFFFF)
    vals = (base + np.arange(n, dtype=np.int64) * np.int64(2246822519)) % 256
    return vals.astype(np.uint8).reshape(h, w, 3)


def quantize_q8(pixels: np.ndarray) -> bytes:
    """Lossy codec: 5-bit codes per channel (values 0..31), one byte each."""
    return (pixels >> 3).astype(np.uint8).tobytes()


def decode(b: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decoded pixels as float64 (h, w, 3)."""
    arr = np.frombuffer(b, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "raw":
        return arr.astype(np.float64)
    if fmt == "q8":
        return arr.astype(np.float64) * 8.0 + 3.5
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def phash64(pixels: np.ndarray) -> int:
    """Average-hash: mean-pool the gray image to 8x8, threshold at the
    mean, pack 64 bits (deterministic, pure numpy).

    Exact INTEGER arithmetic (r5): with equal-size blocks,
    blockmean(gray) > mean(gray)  <=>  64 * blocksum > totalsum over
    integer channel sums — the same bits as the float form in exact
    math, but bit-reproducible in any engine with int64 (the DuckDB
    oracle of q_phash_near_dup re-derives it in pure SQL), and free of
    float-rounding ambiguity at exact ties."""
    s3 = np.asarray(pixels).astype(np.int64).sum(axis=2)
    h, w = s3.shape
    # integer-block sum-pool to 8x8 (trim to multiples of 8)
    bh, bw = h // 8, w // 8
    B = s3[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).sum(axis=(1, 3))
    bits = (64 * B > B.sum()).ravel()
    # packbits is MSB-first per byte; big-endian byte order makes this
    # identical to the sequential (v << 1) | bit fold
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    # interpret as signed int64
    return v - (1 << 64) if v >= (1 << 63) else v


def lonlat_for(i, extent=(-10.0, -10.0, 10.0, 10.0)):
    """Deterministic center from the row index (same integer-hash scheme
    the SQL-oracle queries use; exact in both engines)."""
    x0, y0, x1, y1 = extent
    i = np.asarray(i, dtype=np.int64)
    lon = ((i * _MIX) % _MOD) / 1_000_000.0 * (x1 - x0) + x0
    lat = ((i * _MIX2) % _MOD) / 1_000_000.0 * (y1 - y0) + y0
    return lon, lat


def synth_images(spark: SparkSession, n: int, extent=(-10.0, -10.0, 10.0, 10.0),
                 partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation over spark.range(n)."""

    def gen(iterator):
        for pdf in iterator:
            idx = pdf["id"].to_numpy()
            ws = _W_CHOICES[idx % 3]
            hs = _H_CHOICES[idx % 3]
            lon, lat = lonlat_for(idx, extent)
            is_q8 = ((idx * int(_MIX)) % 100) < 10
            rows = []
            for j in range(len(idx)):
                i = int(idx[j])
                w, h = int(ws[j]), int(hs[j])
                px = _pixels_for(i, w, h)
                ph = phash64(px)
                if is_q8[j]:
                    fmt, b = "q8", quantize_q8(px)
                else:
                    fmt, b = "raw", px.tobytes()
                rows.append(
                    (
                        f"img{i:012d}", b, w, h, fmt,
                        f"caption of img{i:012d} at {lon[j]:.6f},{lat[j]:.6f}",
                        ph,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    rng = spark.range(n, numPartitions=partitions)
    return rng.mapInPandas(gen, IMAGE_SCHEMA)


# -- geometry derivations (JVM-side; no Python) -------------------------------


def footprints(images_df: DataFrame, extent=(-10.0, -10.0, 10.0, 10.0)) -> DataFrame:
    """Convex quad (rhombus) footprint per image; id = numeric image index.
    Pure Column expressions — derivation math matches lonlat_for bit-for-bit."""
    x0, y0, x1, y1 = extent
    i = F.substring("image_id", 4, 12).cast("long")
    lon = (i * F.lit(int(_MIX))) % F.lit(int(_MOD)) / F.lit(1_000_000.0) * F.lit(x1 - x0) + F.lit(x0)
    lat = (i * F.lit(int(_MIX2))) % F.lit(int(_MOD)) / F.lit(1_000_000.0) * F.lit(y1 - y0) + F.lit(y0)
    hx = F.col("w").cast("double") / F.lit(64.0) * F.lit(0.3)
    hy = F.col("h").cast("double") / F.lit(64.0) * F.lit(0.3)
    coords = F.array(
        lon + hx, lat, lon, lat + hy, lon - hx, lat, lon, lat - hy, lon + hx, lat
    )
    return images_df.select(
        i.alias("id"),
        F.lit(3).alias("kind"),  # POLYGON
        coords.alias("coords"),
        F.array(F.lit(0)).alias("rings"),
    )


def caption_points(images_df: DataFrame) -> DataFrame:
    """Parse (lon, lat) back out of the caption — built-in regexp, no UDF."""
    i = F.substring("image_id", 4, 12).cast("long")
    lon = F.regexp_extract("caption", r"at (-?[0-9.]+),(-?[0-9.]+)$", 1).cast("double")
    lat = F.regexp_extract("caption", r"at (-?[0-9.]+),(-?[0-9.]+)$", 2).cast("double")
    return images_df.select(
        i.alias("id"),
        F.lit(0).alias("kind"),  # POINT
        F.array(lon, lat).alias("coords"),
        F.lit(None).cast("array<int>").alias("rings"),
    )
