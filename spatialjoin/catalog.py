"""Geo table storage: cell-prefix partitioned Parquet (Iceberg-ready).

The north rule targets 10^12-row Iceberg image+caption tables. This
sandbox has no Iceberg runtime jar (verified — SURVEY.md §7), so the
layout is implemented on Parquet with the exact same table shape and
partitioning; ``configure_iceberg`` documents the one-config switch
when a jar is present. What carries over to Iceberg unchanged:

  * partition column = coarse cell prefix (`cell_p`, the geometry's
    center cell at a low resolution) — spatial locality on disk, and
    Catalyst prunes partitions for extent-restricted scans (tested);
  * the geometry column contract (kind/coords/rings) and the
    image+caption schema (images.IMAGE_SCHEMA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .grid import Grid
from .index import _clamped_cell_coord

PARTITION_RES = 3  # 8x8 = 64 spatial partitions by default


def with_cell_prefix(df: DataFrame, grid: Grid, res: int = PARTITION_RES,
                     x_expr=None, y_expr=None) -> DataFrame:
    """Add the coarse partition cell `cell_p` from the geometry's bbox
    center (pure JVM)."""
    if x_expr is None:
        xs = F.filter("coords", lambda _, i: i % 2 == 0)
        ys = F.filter("coords", lambda _, i: i % 2 == 1)
        x_expr = (F.array_min(xs) + F.array_max(xs)) / 2
        y_expr = (F.array_min(ys) + F.array_max(ys)) / 2
    n = 1 << res
    cw, ch = grid.cell_size(res)
    cx = _clamped_cell_coord(x_expr, grid.x0, cw, n)
    cy = _clamped_cell_coord(y_expr, grid.y0, ch, n)
    return df.withColumn("cell_p", F.shiftleft(cx, 29).bitwiseOR(cy).cast("long"))


def write_geo_table(df: DataFrame, path: str, grid: Grid,
                    res: int = PARTITION_RES, mode: str = "overwrite") -> None:
    """Write a geometry table partitioned by coarse cell prefix."""
    with_cell_prefix(df, grid, res).write.mode(mode).partitionBy("cell_p").parquet(path)


def read_geo_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_geo_extent(spark: SparkSession, path: str, grid: Grid, extent,
                    res: int = PARTITION_RES) -> DataFrame:
    """Extent-restricted read: the cell_p predicate is a pure partition
    filter, so Catalyst prunes non-overlapping directories at planning
    time (verify with .explain: 'number of partitions read')."""
    x0, y0, x1, y1 = extent
    n = 1 << res
    cw, ch = grid.cell_size(res)
    cx0 = max(0, min(n - 1, int((x0 - grid.x0) / cw)))
    cx1 = max(0, min(n - 1, int((x1 - grid.x0) / cw)))
    cy0 = max(0, min(n - 1, int((y0 - grid.y0) / ch)))
    cy1 = max(0, min(n - 1, int((y1 - grid.y0) / ch)))
    cells = [
        (cx << 29) | cy
        for cx in range(cx0, cx1 + 1)
        for cy in range(cy0, cy1 + 1)
    ]
    return spark.read.parquet(path).where(F.col("cell_p").isin(cells))


Z_RES = 10  # 2^10 cells per axis for the z-order key


def with_zorder_key(df: DataFrame, grid: Grid, res: int = Z_RES,
                    x_expr=None, y_expr=None) -> DataFrame:
    """Morton (z-order) key from the geometry's bbox-center cell at
    ``res`` — pure JVM bit interleaving. Sorting files by `zkey` gives
    spatially-local parquet row groups: min/max column stats on cx/cy
    (and on zkey itself) prune row groups for extent-restricted scans,
    the within-partition complement to `cell_p` directory pruning."""
    if x_expr is None:
        xs = F.filter("coords", lambda _, i: i % 2 == 0)
        ys = F.filter("coords", lambda _, i: i % 2 == 1)
        x_expr = (F.array_min(xs) + F.array_max(xs)) / 2
        y_expr = (F.array_min(ys) + F.array_max(ys)) / 2
    n = 1 << res
    cw, ch = grid.cell_size(res)
    cx = _clamped_cell_coord(x_expr, grid.x0, cw, n)
    cy = _clamped_cell_coord(y_expr, grid.y0, ch, n)
    z = F.lit(0).cast("long")
    for b in range(res):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(cx, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(cy, b).bitwiseAND(F.lit(1)), 2 * b)
        )
    return df.withColumn("zkey", z)


H_RES = 10  # 2^10 cells per axis for the hilbert key


def with_hilbert_key(df: DataFrame, grid: Grid, res: int = H_RES,
                     x_expr=None, y_expr=None) -> DataFrame:
    """Hilbert-curve key from the geometry's bbox-center cell at
    ``res`` — the locality packing of the reference's bulk-loaded
    static R-trees (``/root/reference/src/rtrees.rs:29`` bulk_load;
    packed-Hilbert ordering), re-expressed for a distributed store:
    it orders parquet ROW GROUPS instead of tree nodes. Hilbert beats Morton for extent scans because
    consecutive keys are always grid-ADJACENT cells (no Z-shape jumps
    across the map), so a rectangle decomposes into fewer, longer key
    ranges and row-group min/max stats prune tighter.

    Pure JVM: the classic xy2d bit-rotation loop runs as an
    ``aggregate()`` fold over the per-bit s values — evaluated
    iteratively at runtime, so the expression tree stays O(1) per row
    instead of the 3^res blow-up an unrolled column chain would hit."""
    if x_expr is None:
        xs = F.filter("coords", lambda _, i: i % 2 == 0)
        ys = F.filter("coords", lambda _, i: i % 2 == 1)
        x_expr = (F.array_min(xs) + F.array_max(xs)) / 2
        y_expr = (F.array_min(ys) + F.array_max(ys)) / 2
    n = 1 << res
    cw, ch = grid.cell_size(res)
    cx = _clamped_cell_coord(x_expr, grid.x0, cw, n)
    cy = _clamped_cell_coord(y_expr, grid.y0, ch, n)
    svals = F.array(*[F.lit(1 << b).cast("long") for b in reversed(range(res))])
    init = F.struct(
        cx.cast("long").alias("x"), cy.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc, s):
        x, y, d = acc["x"], acc["y"], acc["d"]
        rx_set = x.bitwiseAND(s) != 0
        ry_set = y.bitwiseAND(s) != 0
        rx = F.when(rx_set, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        ry = F.when(ry_set, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        d2 = d + s * s * (rx * F.lit(3)).bitwiseXOR(ry)
        # flip inside the quadrant, then swap axes (only when ry = 0)
        x2 = F.when(ry_set, x).otherwise(F.when(rx_set, s - 1 - y).otherwise(y))
        y2 = F.when(ry_set, y).otherwise(F.when(rx_set, s - 1 - x).otherwise(x))
        return F.struct(x2.alias("x"), y2.alias("y"), d2.alias("d"))

    hk = F.aggregate(svals, init, step, lambda acc: acc["d"])
    return df.withColumn("hkey", hk)


def _d2xy(res: int, d: int):
    """Inverse Hilbert: curve position -> cell coords (classic loop)."""
    x = y = 0
    t = d
    s = 1
    while s < (1 << res):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def hilbert_ranges(res: int, cx0: int, cx1: int, cy0: int, cy1: int) -> list:
    """Decompose the inclusive cell-rect [cx0..cx1] x [cy0..cy1] into
    the MINIMAL set of contiguous hkey intervals [(d_lo, d_hi), ...].

    Quadtree descent in curve order: every Hilbert subtree of size s
    occupies one ALIGNED s x s square, so each node needs one _d2xy
    call (first cell -> align down) plus a rect test — emit the whole
    subtree interval when the square is inside the query, recurse when
    it straddles, skip when disjoint. O(perimeter * res) nodes,
    driver-side. Adjacent intervals are merged, so a query rect
    becomes FEW long ranges — the property that makes Hilbert beat
    Morton for range scans (Z-order's diagonal jumps fragment the
    cover into many short runs)."""
    out: list = []

    def rec(d0: int, size: int) -> None:
        x, y = _d2xy(res, d0)
        sx, sy = x & ~(size - 1), y & ~(size - 1)
        if sx > cx1 or sx + size - 1 < cx0 or sy > cy1 or sy + size - 1 < cy0:
            return
        if cx0 <= sx and sx + size - 1 <= cx1 and cy0 <= sy and sy + size - 1 <= cy1:
            out.append((d0, d0 + size * size - 1))
            return
        h = size // 2
        for i in range(4):
            rec(d0 + i * h * h, h)

    rec(0, 1 << res)
    merged: list = []
    for lo, hi in out:  # descent emits in increasing-d order
        if merged and merged[-1][1] + 1 == lo:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return merged


def read_geo_extent_hilbert(spark: SparkSession, path: str, grid: Grid, extent,
                            res: int = PARTITION_RES,
                            h_res: int = Z_RES) -> DataFrame:
    """Extent-restricted read of a hilbert-clustered table: cell_p
    directory pruning (like read_geo_extent) PLUS `hkey BETWEEN`
    interval disjuncts from hilbert_ranges — within the surviving
    files these hit the parquet row-group min/max stats of the sorted
    hkey column, so row groups outside the extent are never
    decompressed (zone-map pruning, the per-file complement to
    directory pruning). Returns exactly the rows whose bbox-center
    cell at ``h_res`` intersects the extent's cell cover (a superset
    of the exact-geometry result at cell granularity, like
    read_geo_extent)."""
    x0, y0, x1, y1 = extent
    n = 1 << h_res
    cw, ch = grid.cell_size(h_res)
    cx0 = max(0, min(n - 1, int((x0 - grid.x0) / cw)))
    cx1 = max(0, min(n - 1, int((x1 - grid.x0) / cw)))
    cy0 = max(0, min(n - 1, int((y0 - grid.y0) / ch)))
    cy1 = max(0, min(n - 1, int((y1 - grid.y0) / ch)))
    base = read_geo_extent(spark, path, grid, extent, res)
    ranges = hilbert_ranges(h_res, cx0, cx1, cy0, cy1)
    pred = None
    for lo, hi in ranges:
        c = F.col("hkey").between(int(lo), int(hi))
        pred = c if pred is None else (pred | c)
    return base.where(pred if pred is not None else F.lit(False))


def write_geo_table_clustered(df: DataFrame, path: str, grid: Grid,
                              res: int = PARTITION_RES, z_res: int = Z_RES,
                              mode: str = "overwrite",
                              order: str = "zorder") -> None:
    """Partition by coarse cell prefix AND space-filling-curve-sort
    within each partition, so row groups inside every file carry tight
    spatial min/max stats (Iceberg's `sort_order` equivalent on plain
    parquet). ``order``: "zorder" (Morton) or "hilbert" (the
    reference's packed-Hilbert ordering; adjacent-cell guarantee)."""
    out = with_cell_prefix(df, grid, res)
    if order == "hilbert":
        out, key = with_hilbert_key(out, grid, z_res), "hkey"
    elif order == "zorder":
        out, key = with_zorder_key(out, grid, z_res), "zkey"
    else:
        raise ValueError(f"unknown order {order!r} (zorder|hilbert)")
    (
        out.repartition("cell_p")
        .sortWithinPartitions(key)
        .write.mode(mode)
        .partitionBy("cell_p")
        .parquet(path)
    )


def configure_iceberg(builder, catalog_name: str = "geo", warehouse: str | None = None):
    """Session-builder config for an Iceberg catalog — usable verbatim
    once `iceberg-spark-runtime` is on the classpath (not in this
    sandbox). The write path then becomes
    ``df.writeTo(f"{catalog}.db.tbl").partitionedBy(col('cell_p')).createOrReplace()``
    with everything else unchanged."""
    builder = (
        builder.config(
            f"spark.sql.catalog.{catalog_name}", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config(f"spark.sql.catalog.{catalog_name}.type", "hadoop")
    )
    if warehouse:
        builder = builder.config(f"spark.sql.catalog.{catalog_name}.warehouse", warehouse)
    return builder
