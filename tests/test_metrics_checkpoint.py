"""Metrics aggregations + checkpoint/resume idempotence."""

from __future__ import annotations

import json
import random

import pytest

from spatialjoin.checkpoint import ResumableRun
from spatialjoin.geom import POINT, RECT
from spatialjoin.index import SpatialIndex
from spatialjoin.metrics import cell_histogram, job_metrics_json, partition_metrics, skew_stats
from spatialjoin.sparkutil import geoms_to_df


def _rows(rng, n):
    out = []
    for _ in range(n):
        cx, cy = rng.uniform(-5, 5), rng.uniform(-5, 5)
        if rng.random() < 0.5:
            out.append((POINT, [cx, cy]))
        else:
            out.append((RECT, [cx - 0.2, cy - 0.2, cx + 0.2, cy + 0.2]))
    return out


def test_partition_and_skew_metrics(spark):
    rng = random.Random(5)
    small = geoms_to_df(spark, _rows(rng, 100))
    idx = SpatialIndex.build(spark, small, validate=False)
    pm = partition_metrics(idx.small_cells).collect()
    assert sum(r.rows for r in pm) == idx.small_cells.count()
    assert all(r.approx_bytes > 0 for r in pm)
    st = skew_stats(idx.small_cells)
    assert st["total_rows"] == idx.small_cells.count()
    assert 0 < st["top_cell_share"] <= 1
    hist = cell_histogram(idx.small_cells).collect()
    assert sum(r.rows for r in hist) == st["total_rows"]
    blob = json.loads(job_metrics_json(idx.small_cells, idx.small_cells))
    assert blob["rows"] == st["total_rows"]
    idx.unpersist()


def test_checkpoint_resume_idempotent(spark, tmp_path):
    rng = random.Random(6)
    small = geoms_to_df(spark, _rows(rng, 80))
    big = geoms_to_df(spark, _rows(rng, 120))
    idx = SpatialIndex.build(spark, small, validate=False)

    def factory():
        return idx.spatial_join(big, how="intersects", validate=False)

    want = sorted((r.big_id, r.small_id) for r in factory().collect())

    out = str(tmp_path / "ckpt")
    run = ResumableRun(out, n_buckets=8, lineage={"test": "resume"})
    with pytest.raises(RuntimeError, match="injected failure"):
        run.run(factory, fail_after=3)
    assert len(run.done_buckets()) == 3

    run2 = ResumableRun(out, n_buckets=8)
    computed = run2.run(factory)
    assert len(computed) == 5  # only the remaining buckets
    assert run2.done_buckets() == set(range(8))

    got = sorted((r.big_id, r.small_id) for r in run2.read(spark).select("big_id", "small_id").collect())
    assert got == want

    # third run is a no-op
    assert ResumableRun(out, n_buckets=8).run(factory) == []
    m = json.load(open(f"{out}/_manifests/bucket-0.json"))
    assert m["lineage"] == {"test": "resume"} and m["n_buckets"] == 8
    # manifests carry exact per-bucket row counts summing to the output
    total_rows = sum(
        json.load(open(f"{out}/_manifests/bucket-{i}.json"))["rows"] for i in range(8)
    )
    assert total_rows == len(want)
    idx.unpersist()


def test_checkpoint_all_buckets_empty_read(spark, tmp_path):
    """Empty buckets publish schema-bearing empty parquet, so read()
    infers the schema even when EVERY bucket is empty."""
    rng = random.Random(7)
    small = geoms_to_df(spark, _rows(rng, 10))
    idx = SpatialIndex.build(spark, small, validate=False)

    def factory():
        # join that matches nothing: probes far outside the extent
        far = geoms_to_df(spark, [(POINT, [1e6 + i, 1e6]) for i in range(5)])
        return idx.spatial_join(far, how="intersects", validate=False)

    out = str(tmp_path / "ckpt_empty")
    run = ResumableRun(out, n_buckets=4)
    assert len(run.run(factory)) == 4
    got = run.read(spark)
    assert got.count() == 0
    assert {"big_id", "small_id"} <= set(got.columns)
    idx.unpersist()


def test_checkpoint_single_upstream_pass(spark, tmp_path):
    """The upstream DataFrame must execute exactly ONCE per run() call
    (not once per bucket): counted with an accumulator inside a
    passthrough mapInPandas stage."""
    rng = random.Random(7)
    small = geoms_to_df(spark, _rows(rng, 60))
    big = geoms_to_df(spark, _rows(rng, 90))
    idx = SpatialIndex.build(spark, small, validate=False)
    acc = spark.sparkContext.accumulator(0)
    base = idx.spatial_join(big, how="intersects", validate=False)
    n_out = base.count()

    def factory():
        def passthrough(it):
            for pdf in it:
                acc.add(len(pdf))
                yield pdf

        return idx.spatial_join(big, how="intersects", validate=False).mapInPandas(
            passthrough, base.schema
        )

    out = str(tmp_path / "ckpt1pass")
    run = ResumableRun(out, n_buckets=16)
    computed = run.run(factory)
    assert len(computed) == 16
    assert acc.value == n_out, f"upstream ran {acc.value / max(n_out, 1):.1f}x"
    assert run.read(spark).count() == n_out
    idx.unpersist()
