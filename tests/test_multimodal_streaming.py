"""Multimodal ops (real image transforms, stubbed a/v codecs with real
plumbing) and Structured Streaming windowed cell counts."""

from __future__ import annotations

import time

import numpy as np
import pytest

from spatialjoin.grid import Grid
from spatialjoin.images import decode, synth_images, _pixels_for
from spatialjoin.multimodal import (
    audio_features,
    decode_audio_stub,
    image_features,
    resize_images,
    sample_frames,
)


def test_resize_images_nearest(spark):
    imgs = synth_images(spark, 12).persist()
    out = {r.image_id: r for r in resize_images(imgs, 8, 8).collect()}
    for r0 in imgs.collect():
        r = out[r0.image_id]
        got = np.frombuffer(r.bytes, dtype=np.uint8).reshape(8, 8, 3)
        px = decode(r0.bytes, r0.fmt, r0.w, r0.h)
        ri = (np.arange(8) * r0.h // 8)
        ci = (np.arange(8) * r0.w // 8)
        want = np.clip(px[ri][:, ci, :], 0, 255).astype(np.uint8)
        assert (got == want).all()
    imgs.unpersist()


def test_image_features_phash_integrity(spark):
    imgs = synth_images(spark, 20).persist()
    feats = {r.image_id: r for r in image_features(imgs).collect()}
    for r in imgs.collect():
        f = feats[r.image_id]
        assert 0 <= f.mean_r <= 255 and f.std_gray >= 0
        if r.fmt == "raw":
            assert f.phash_check == r.phash  # lossless payload: exact match
    imgs.unpersist()


def test_audio_stub_plumbing(spark):
    sig = (np.sin(np.linspace(0, 20, 4000)) * 20000).astype("<i2")
    rows = [("clip0", sig.tobytes(), "pcm16"), ("clip1", b"", "pcm16")]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    out = {r.clip_id: r for r in audio_features(df).collect()}
    assert out["clip0"].n_samples == 4000
    want = float(np.sqrt(np.mean((sig.astype(np.float64) / 32768.0) ** 2)))
    assert abs(out["clip0"].rms - want) < 1e-12
    assert out["clip1"].n_samples == 0
    # unknown codec must raise (stub boundary is explicit)
    bad = spark.createDataFrame([("c", b"x", "mp3")], "clip_id string, bytes binary, codec string")
    with pytest.raises(Exception, match="NotImplementedError|external decoder"):
        audio_features(bad).collect()


def test_video_frame_sampling_stub(spark):
    w = h = 4
    frames = [np.full((h, w, 3), i, dtype=np.uint8) for i in range(6)]
    blob = b"".join(f.tobytes() for f in frames)
    df = spark.createDataFrame(
        [("v0", blob, "rawv", w, h, 6)],
        "video_id string, bytes binary, codec string, w int, h int, n_frames int",
    )
    out = sorted((r.frame_idx, r.bytes) for r in sample_frames(df, every=2).collect())
    assert [i for i, _ in out] == [0, 2, 4]
    for i, b in out:
        assert np.frombuffer(b, dtype=np.uint8).reshape(h, w, 3).max() == i


def test_streaming_windowed_cell_counts(spark, tmp_path):
    from spatialjoin.streaming import windowed_cell_counts

    src = str(tmp_path / "stream_in")
    out_tbl = "stream_cells_out"
    grid = Grid((-10.0, -10.0, 10.0, 10.0))
    rows1 = [(i, f"2026-01-01 00:00:{i % 50:02d}", -5.0 + i, 3.0, float(i)) for i in range(5)]
    df1 = spark.createDataFrame(rows1, "event_id long, ts string, x double, y double, value double") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "x", "y", "value")
    df1.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df1.schema).parquet(src)
    agg = windowed_cell_counts(stream, grid, res=4, window="10 seconds")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName(out_tbl)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; push the watermark forward
    rows2 = [(100, "2026-01-01 00:05:00", 0.0, 0.0, 1.0)]
    df2 = spark.createDataFrame(rows2, "event_id long, ts string, x double, y double, value double") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "x", "y", "value")
    df2.write.mode("append").parquet(src)
    q2 = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName(out_tbl + "2")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    got = spark.sql(f"SELECT * FROM {out_tbl}2").collect()
    assert got, "expected closed windows after watermark advance"
    total = sum(r.n_events for r in got)
    assert total == 5  # the first five events; the watermark-pusher window stays open
    assert all(r.n_events >= 1 and r.sum_value is not None for r in got)


def test_stateful_cell_sketch_matches_batch(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): the per-cell
    bottom-k sketch after streaming in two chunks must equal the batch
    computation over all events — the KMV construction is order- and
    batching-independent by design."""
    import numpy as np

    from spatialjoin.streaming import stateful_cell_sketch

    src = str(tmp_path / "sketch_in")
    grid = Grid((-10.0, -10.0, 10.0, 10.0))
    schema = "event_id long, ts string, x double, y double, value double"

    def mk(rows):
        return spark.createDataFrame(rows, schema).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) ts", "x", "y", "value"
        )

    rows = [
        (i, "2026-01-01 00:00:00", -9.0 + (i % 40) * 0.45, -9.0 + (i % 7) * 2.5,
         float((i * 37) % 101))
        for i in range(400)
    ]
    mk(rows[:250]).write.mode("overwrite").parquet(src)
    mk(rows[250:]).write.mode("append").parquet(src)

    stream = spark.readStream.schema(mk(rows[:1]).schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    out = stateful_cell_sketch(stream, grid, res=3, k=16)
    q = (
        out.writeStream.outputMode("update")
        .format("memory").queryName("sketch_out")
        .option("checkpointLocation", str(tmp_path / "sketch_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.sql("SELECT * FROM sketch_out").collect()
    assert emitted
    # final emission per cell = the row with the largest running total
    final = {}
    for r in emitted:
        if r.cell not in final or r.n_total > final[r.cell].n_total:
            final[r.cell] = r

    # batch twin: same cells, same hash rule, same bottom-k + quantiles
    from pyspark.sql import functions as F
    from spatialjoin.streaming import with_event_cells

    batch = with_event_cells(mk(rows), grid, 3).withColumn(
        "__h", F.xxhash64("event_id")
    ).select("cell", "__h", "value").collect()
    per_cell = {}
    for r in batch:
        per_cell.setdefault(r.cell, []).append((r["__h"], r.value))
    assert set(final) == set(per_cell)
    for cell, pairs in per_cell.items():
        pairs.sort()
        vals = np.sort(np.array([v for _, v in pairs[:16]]))
        got = final[cell]
        assert got.n_total == len(pairs)
        assert got.sample_size == len(vals)
        assert got.q50 == float(vals[int(0.5 * (len(vals) - 1))])
        assert got.q90 == float(vals[int(0.9 * (len(vals) - 1))])
