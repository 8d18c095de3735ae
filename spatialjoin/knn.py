"""Distributed kNN join via expanding k-ring cell search.

North-rule addition (BASELINE.json): the reference crate only supports
distance-THRESHOLD joins (proximity_map, src/index.rs:422-447); kNN is
built on the same cell grid + kernels:

round r:  candidates = big covering expanded by Chebyshev ring r
          (pure-JVM sequence/explode of dx/dy offsets) equi-joined to
          the small cell index, refined to exact distances (kernels),
          then windowed top-k per probe with deterministic tie-break
          (distance, small_id).
done:     a probe is finished when it has >= k neighbors AND its k-th
          distance <= r * min(cell_w, cell_h): any geometry not yet a
          candidate has every covered cell at Chebyshev cell-distance
          > r from the probe's covering, hence Euclidean distance
          >= r * min(cell_w, cell_h) — it cannot beat the current k-th.
loop:     unfinished probes escalate with ring *= 4 (driver-side loop,
          anti-joining finished probes); terminates when the ring spans
          the grid.

Output: DF[big_id, small_id, distance, rank] with rank 1..k
(row_number — exactly k rows per probe when the small side has >= k
rows, fewer otherwise). Deterministic regardless of parallelism.
"""

from __future__ import annotations

import warnings

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import kernels
from .geom import GeomBatch
from .grid import Grid
from .index import (
    SpatialIndex,
    _point_batch,
    _prefixed,
    _refine_sides,
    validate_geoms,
    with_bbox,
    with_cells,
)

_WARNED_CKPT_CLEANUP: list = []  # once-per-process reliable-ckpt warning


def _ring_expand(df: DataFrame, r: int, n: int, res: int) -> DataFrame:
    """Expand each (cx, cy) covering cell by Chebyshev ring r — JVM only.
    Output rows carry (cx, cy, cell) of the RING cell."""
    if r <= 0:
        return df
    df = df.withColumn("dx", F.explode(F.sequence(F.lit(-r), F.lit(r))))
    df = df.withColumn("dy", F.explode(F.sequence(F.lit(-r), F.lit(r))))
    df = df.withColumn("ncx", F.col("cx") + F.col("dx")).withColumn("ncy", F.col("cy") + F.col("dy"))
    df = df.where((F.col("ncx") >= 0) & (F.col("ncx") < n) & (F.col("ncy") >= 0) & (F.col("ncy") < n))
    df = df.drop("cell", "dx", "dy", "cx", "cy")
    df = df.withColumnRenamed("ncx", "cx").withColumnRenamed("ncy", "cy")
    return df.withColumn(
        "cell",
        F.lit(res << 58).cast("long")
        .bitwiseOR(F.shiftleft(F.col("cx"), 29))
        .bitwiseOR(F.col("cy")),
    )


def knn_join(
    spark: SparkSession,
    small_df: DataFrame,
    big_df: DataFrame,
    k: int,
    extent=None,
    resolution: int | None = None,
    broadcast: bool | str = "auto",
    validate: bool = True,
    initial_ring: int | None = None,
    max_rounds: int = 12,
    hot_threshold: int | None = None,
    split_steps: int = 2,
    big_kinds=None,
) -> DataFrame:
    """k nearest small geometries for every big geometry.

    ``hot_threshold`` enables the same hot-cell splitting spatial_join
    uses: the ring search probes cold cells at the base resolution and
    expands hot parents to ALL their fine subcells, so kNN composes
    with skew handling (results are invariant to the split).

    Fault tolerance: the result is materialized via an eager
    checkpoint. With ``spark.sparkContext.setCheckpointDir(...)``
    configured (recommended on multi-executor clusters) this is a
    RELIABLE checkpoint that survives executor loss; without one it
    falls back to ``localCheckpoint``, whose unreplicated blocks make
    the result irrecoverable if an executor dies after the call."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # kNN wants DENSITY ~k/2 per cell (the join default picks a much
    # finer grid sized to geometry extents): ring 1 then holds ~4-5k
    # candidates, probes finish in one round, and the ring explode
    # stays at 9 cells/probe instead of (2r+1)^2 with r ~ 10
    idx = SpatialIndex.build(
        spark, small_df, max_distance=0.0, extent=extent, resolution=resolution,
        broadcast=broadcast, validate=validate,
        hot_threshold=hot_threshold, split_steps=split_steps,
        cell_target_rows=max(k, 1) / 2.0,
    )
    return _knn_with_index(spark, idx, big_df, k, validate, initial_ring,
                           max_rounds, big_kinds=big_kinds)


def _auto_initial_ring(idx: SpatialIndex, k: int) -> int:
    # size ring 0 so the expected candidate count per probe is ~2k:
    # ring r scans (2r+1)^2 cells at density n_small / 4^res. The row
    # count comes from the build stats job (no extra driver actions on
    # the query path); direct-constructed indexes fall back to a count.
    # INTENTIONAL (r4): density uses the GEOMETRY-row count, not the
    # per-cell covering-row count used before the build-stats change —
    # for small sides whose geometries span multiple cells this
    # underestimates density and sizes ring 0 slightly larger (extra
    # round-0 candidates, one fewer expansion round); results are
    # identical either way since ring expansion converges.
    n_cells = float(4 ** idx.resolution)
    n_small = idx.n_small_rows
    if n_small is None:
        n_small = idx.small_cells.count()
        if idx.small_fine is not None:
            n_small += idx.small_fine.count()
    density = max(n_small / n_cells, 1e-12)
    return int(np.clip(np.ceil((np.sqrt(2.0 * k / density) - 1.0) / 2.0),
                       1, 1 << idx.resolution))


def _knn_with_index(spark, idx: SpatialIndex, big_df, k, validate, initial_ring,
                    max_rounds, big_kinds=None):
    from .geom import POINT as KP

    if k < 1:
        raise ValueError("k must be >= 1")
    if initial_ring is None:
        initial_ring = _auto_initial_ring(idx, k)

    point_probe = big_kinds is not None and set(big_kinds) == {KP}
    grid, res = idx.grid, idx.resolution
    n = 1 << res
    cw, ch = grid.cell_size(res)
    min_dim = min(cw, ch)
    if validate:
        validate_geoms(big_df)
    b = _prefixed(big_df, "b", "big_id")
    from .index import ensure_parallelism

    b = ensure_parallelism(b)
    b = with_bbox(b, "b", buffer=0.0, points=point_probe)
    b_base = b.persist()

    small = idx.small_cells
    small_fine = idx.small_fine
    bc = idx.small_geo_bc
    if bc is not None:
        small = small.drop("s_kind", "s_coords", "s_rings")
        if small_fine is not None:
            small_fine = small_fine.drop("s_kind", "s_coords", "s_rings")
    out_schema = T.StructType(
        [
            T.StructField("big_id", T.LongType(), False),
            T.StructField("small_id", T.LongType(), False),
            T.StructField("distance", T.DoubleType(), False),
        ]
    )
    topk_schema = T.StructType(out_schema.fields + [
        T.StructField("rank", T.IntegerType(), False),
    ])

    def brute_force_topk(iterator):
        """Straggler sweep: exact kNN of each pending probe against the
        ENTIRE broadcast small side — replaces up to log4(grid) ring
        escalations when only a handful of probes remain. One batched
        kernels.distance call per probe-chunk (chunks bound the pair
        matrix at ~4M entries); row-wise lexsort keeps the exact
        (distance, small_id) tie-break of the windowed path."""
        import pandas as pd

        ids_all, A = bc.value
        n_small = len(ids_all)
        kk = min(k, n_small)
        chunk = max(1, 4_000_000 // max(n_small, 1))
        ai_chunk = np.tile(np.arange(n_small, dtype=np.int64), chunk)
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            B = _point_batch(pdf["bx"].to_numpy(), pdf["by"].to_numpy()) \
                if "bx" in pdf.columns else GeomBatch.from_columns(
                    pdf["b_kind"].to_numpy(), pdf["b_coords"].to_list(),
                    pdf["b_rings"].to_list())
            big_ids = pdf["big_id"].to_numpy()
            for lo in range(0, len(pdf), chunk):
                p = min(chunk, len(pdf) - lo)
                ai = ai_chunk[: p * n_small]
                bi = np.repeat(np.arange(lo, lo + p, dtype=np.int64), n_small)
                d = kernels.distance(A, ai, B, bi).reshape(p, n_small)
                order = np.lexsort(
                    (np.broadcast_to(ids_all, d.shape), d)
                )[:, :kk]
                yield pd.DataFrame({
                    "big_id": np.repeat(big_ids[lo:lo + p], kk),
                    "small_id": ids_all[order].ravel(),
                    "distance": np.take_along_axis(d, order, axis=1).ravel(),
                    "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32), p),
                })

    def refine(iterator):
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            A, ai, B = _refine_sides(pdf, bc)
            bi = np.arange(len(pdf), dtype=np.int64)
            d = kernels.distance(A, ai, B, bi)
            out = pdf.loc[:, ["big_id", "small_id"]].copy()
            out["distance"] = d
            yield out

    from .index import _refine_input_cols

    def bcast(df):
        return F.broadcast(df) if idx.broadcast_small else df

    # point-vs-point: the ring-candidate distances stay entirely in the
    # JVM (same float ops as the numpy kernel: sqrt(dx*dx + dy*dy) on
    # the unbuffered scalar columns) — no Arrow boundary in the loop at
    # all; only the bounded straggler sweep touches Python
    all_points = point_probe and idx._small_kinds() == {KP}
    if all_points:
        refine_cols = [
            "big_id", "small_id",
            F.col("b_xmin").alias("bx"), F.col("b_ymin").alias("by"),
            "s_px", "s_py",
        ]
    else:
        refine_cols = _refine_input_cols(bc, [], point_probe=point_probe)

    import os as _os
    import time as _time

    _dbg = _os.environ.get("SPARK_GRAFT_KNN_DEBUG") == "1"

    results = []
    cached = [b_base]
    pending = b_base
    r = initial_ring
    rounds = 0
    while True:
        rounds += 1
        _t0 = _time.perf_counter()
        probe = with_cells(pending, "b", grid, res, keep_cxy=True)
        probe = _ring_expand(probe, r, n, res)
        cand = probe.join(bcast(small), on="cell", how="inner").select(*refine_cols)
        if small_fine is not None:
            # hot parents in the ring probe ALL their fine subcells, so
            # every hot-cell small row within Chebyshev ring r is still a
            # candidate and the done-criterion bound is unchanged
            ks = idx.fine_resolution - res
            ph = probe.join(F.broadcast(idx.hot_cells), "cell", "left_semi").drop("cell")
            ph = ph.withColumn(
                "fcx",
                F.explode(F.sequence(F.shiftleft(F.col("cx"), ks),
                                     F.shiftleft(F.col("cx") + 1, ks) - 1)),
            ).withColumn(
                "fcy",
                F.explode(F.sequence(F.shiftleft(F.col("cy"), ks),
                                     F.shiftleft(F.col("cy") + 1, ks) - 1)),
            )
            ph = ph.withColumn(
                "cell",
                F.lit(idx.fine_resolution << 58).cast("long")
                .bitwiseOR(F.shiftleft(F.col("fcx"), 29))
                .bitwiseOR(F.col("fcy")),
            ).drop("fcx", "fcy", "cx", "cy")
            cand_fine = ph.join(bcast(small_fine), on="cell", how="inner").select(*refine_cols)
            cand = cand.unionByName(cand_fine)
        # a pair may appear via several (probe-cell, ring-offset) paths
        # and via both index levels; dedupe on ids before the
        # (idempotent) refine to cut UDF work. Point-vs-point needs no
        # dedup shuffle: each side covers exactly ONE cell, ring cells
        # are distinct per probe, and a small point lives in either the
        # cold or the fine level — every pair arises exactly once.
        if not all_points:
            cand = cand.dropDuplicates(["big_id", "small_id"])
        if all_points:
            dists = cand.selectExpr(
                "big_id", "small_id",
                "sqrt((s_px - bx) * (s_px - bx) + (s_py - by) * (s_py - by)) AS distance",
            )
        elif point_probe and bc is not None:
            from .index import _arrow_point_refine

            dists = cand.mapInArrow(
                _arrow_point_refine(bc, "prox", max_d=np.inf), out_schema
            )
        else:
            dists = cand.mapInPandas(refine, out_schema)
        w = Window.partitionBy("big_id").orderBy(F.col("distance").asc(), F.col("small_id").asc())
        topk = (
            dists.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        ).persist()  # reused by the done-check action AND the final union
        cached.append(topk)
        if _dbg:
            topk.count()
            print(f"[knn] round {rounds} r={r} topk wall={_time.perf_counter() - _t0:.2f}")
            _t0 = _time.perf_counter()
        covered = float(r) * min_dim
        ring_spans_grid = r >= n
        if ring_spans_grid:
            results.append(topk)
            break
        # a probe is done if it found k neighbors with kth dist <= covered
        per_probe = topk.groupBy("big_id").agg(
            F.count(F.lit(1)).alias("cnt"), F.max("distance").alias("kth")
        )
        # strict <: an unseen geometry at distance exactly `covered` with a
        # smaller id could otherwise displace the current k-th on tie-break
        # persist the (tiny) done-id set: the final union re-evaluates
        # done_rows when materializing the checkpoint, and without this
        # cache it would re-run the per_probe aggregation shuffle per
        # round (measured as a top-3 stage of the query's fixed cost)
        done_ids = per_probe.where(
            (F.col("cnt") >= k) & (F.col("kth") < F.lit(covered))
        ).select("big_id").persist()
        cached.append(done_ids)
        pending_next = pending.join(done_ids, on="big_id", how="left_anti").persist()
        cached.append(pending_next)
        n_pending = pending_next.count()
        pending = pending_next
        if _dbg:
            print(f"[knn] round {rounds} done-check wall={_time.perf_counter() - _t0:.2f} pending={n_pending}")
        if n_pending == 0:
            # every probe finished this round: the done-filter semi join
            # would be the identity — ship the cached topk as-is
            results.append(topk)
            break
        results.append(topk.join(done_ids, on="big_id", how="left_semi"))
        if bc is not None and n_pending <= 4096:
            # straggler sweep: exact brute force against the broadcast
            # index beats up to log4(grid) more ring-escalation rounds
            if point_probe:
                rsel = pending.select(
                    "big_id", F.col("b_xmin").alias("bx"), F.col("b_ymin").alias("by")
                )
            else:
                rsel = pending.select("big_id", "b_kind", "b_coords", "b_rings")
            results.append(rsel.mapInPandas(brute_force_topk, topk_schema))
            if _dbg:
                print(f"[knn] brute-force sweep for {n_pending} stragglers")
            break
        if rounds >= max_rounds:
            # probes remain pending, the ring does NOT span the grid, and
            # no brute-force sweep applies: their top-k would be
            # incomplete — never return silently-wrong rows (unreachable
            # with the default budget: ring x4 spans any grid in
            # <= log4(2^res) + 1 rounds)
            for df in cached:
                df.unpersist()
            raise RuntimeError(
                f"knn_join exhausted max_rounds={max_rounds} with "
                f"{n_pending} probes pending at ring {r} (< grid span "
                f"{n}); raise max_rounds or initial_ring"
            )
        r *= 4
    _t0 = _time.perf_counter()
    out = results[0]
    for extra in results[1:]:
        out = out.unionByName(extra)
    # the union inherits every round's shuffle partitioning (measured:
    # 128 near-empty tasks checkpointing 45k rows, and the checkpoint
    # stage dominates the query's fixed cost) — narrow to the session
    # parallelism before materializing; coalesce is a narrow dependency
    # so no extra shuffle is introduced
    out = out.coalesce(spark.sparkContext.defaultParallelism)
    # materialize the union via an eager checkpoint, then free every
    # per-round cache (the round topk/pending frames otherwise accumulate
    # in executor storage for the session lifetime on multi-round
    # workloads). Checkpoint rather than persist: it truncates lineage
    # (so unpersisting the round caches can't trigger recompute), and a
    # LOCAL checkpoint's blocks are released by the ContextCleaner when
    # the returned frame is garbage-collected — a plain DataFrame
    # persist would pin storage until an explicit unpersist the caller
    # never sees.
    #
    # FAULT TOLERANCE: localCheckpoint blocks are executor-LOCAL and
    # unreplicated — on a multi-executor cluster, losing any executor
    # after the checkpoint makes the result irrecoverable (job failure;
    # lineage was truncated so Spark cannot recompute). When the session
    # has a RELIABLE checkpoint dir configured
    # (spark.sparkContext.setCheckpointDir on HDFS/S3 — standard on
    # long-lived clusters), use a reliable checkpoint instead: same
    # lineage truncation, but blocks survive executor loss.
    #
    # CLEANUP CAVEAT: unlike localCheckpoint, RELIABLE checkpoint files
    # are NOT removed when the frame is garbage-collected unless
    # spark.cleaner.referenceTracking.cleanCheckpoints=true (default
    # false) — repeated knn_join calls on a long-lived session would
    # otherwise accumulate full result copies under the checkpoint dir.
    # Warn once so operators either enable that conf or clean the dir.
    if spark.sparkContext.getCheckpointDir() is not None:
        clean = spark.conf.get(
            "spark.cleaner.referenceTracking.cleanCheckpoints", "false"
        )
        if str(clean).lower() != "true" and not _WARNED_CKPT_CLEANUP:
            _WARNED_CKPT_CLEANUP.append(True)
            warnings.warn(
                "knn_join: a reliable checkpoint dir is configured but "
                "spark.cleaner.referenceTracking.cleanCheckpoints is "
                "false — checkpointed results accumulate there until "
                "the dir is cleaned externally. Set the conf to true "
                "to have Spark delete them on GC.",
                RuntimeWarning,
            )
        out = out.checkpoint(eager=True)
    else:
        out = out.localCheckpoint(eager=True)
    if _dbg:
        print(f"[knn] final union+checkpoint wall={_time.perf_counter() - _t0:.2f}")
    for df in cached:
        df.unpersist()
    return out
