"""Cell-prefix partitioned storage: round-trip + partition pruning."""

from __future__ import annotations

import os
import random

from spatialjoin.catalog import read_geo_extent, read_geo_table, write_geo_table
from spatialjoin.geom import POINT, RECT
from spatialjoin.grid import Grid
from spatialjoin.sparkutil import geoms_to_df


def test_write_read_roundtrip_and_pruning(spark, tmp_path):
    rng = random.Random(3)
    rows = []
    for _ in range(300):
        cx, cy = rng.uniform(-9, 9), rng.uniform(-9, 9)
        rows.append((POINT, [cx, cy]) if rng.random() < 0.5
                    else (RECT, [cx - 0.1, cy - 0.1, cx + 0.1, cy + 0.1]))
    df = geoms_to_df(spark, rows)
    grid = Grid((-10.0, -10.0, 10.0, 10.0))
    path = str(tmp_path / "geo_tbl")
    write_geo_table(df, path, grid)

    # physical layout: one directory per coarse cell
    parts = [d for d in os.listdir(path) if d.startswith("cell_p=")]
    assert len(parts) > 8

    back = read_geo_table(spark, path)
    assert back.count() == 300
    got_ids = sorted(r.id for r in back.select("id").collect())
    assert got_ids == list(range(300))

    # extent-restricted read returns exactly the rows in the extent
    # (partition filter is necessary-but-coarse; verify per-row truth)
    ext = (0.0, 0.0, 10.0, 10.0)
    sub = read_geo_extent(spark, path, grid, ext)
    sub_ids = set(r.id for r in sub.select("id").collect())
    for i, r in enumerate(rows):
        cxs = r[1][0::2]
        cys = r[1][1::2]
        cx, cy = (min(cxs) + max(cxs)) / 2, (min(cys) + max(cys)) / 2
        if 0.0 <= cx <= 10.0 and 0.0 <= cy <= 10.0:
            assert i in sub_ids, (i, cx, cy)

    # pruning is visible in the physical plan (fewer partitions read)
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "cell_p" in plan


def test_registered_sql_functions(spark):
    from spatialjoin.functions import register_functions

    register_functions(spark)
    row = spark.sql(
        "SELECT sj_intersects(4, array(0e0,0e0,2e0,2e0), array(), 0, array(1e0,1e0), array()) AS i,"
        "       sj_contains(4, array(0e0,0e0,2e0,2e0), array(), 0, array(1e0,1e0), array()) AS c,"
        "       sj_distance(0, array(0e0,0e0), array(), 0, array(3e0,4e0), array()) AS d,"
        "       sj_cell_of(1e0, 1e0, 4, -10e0, -10e0, 10e0, 10e0) AS cell"
    ).first()
    assert row.i and row.c and row.d == 5.0
    from spatialjoin.grid import Grid
    import numpy as np

    want = int(Grid((-10.0, -10.0, 10.0, 10.0)).cell_of(np.array([1.0]), np.array([1.0]), 4)[0])
    assert row.cell == want
    # quirk carries through SQL too: degenerate triangle contains equal point
    row2 = spark.sql(
        "SELECT sj_intersects(5, array(1e0,1e0,1e0,1e0,1e0,1e0), array(), 0, array(1e0,1e0), array()) AS q"
    ).first()
    assert row2.q


def test_zorder_clustered_write(spark, tmp_path):
    """Z-order clustering: zkey equals the Python Morton code, and row
    groups within each written file are zkey-sorted (disjoint min/max
    ranges), which is what parquet row-group pruning keys off."""
    import glob

    import pyarrow.parquet as pq

    from spatialjoin.catalog import Z_RES, with_zorder_key, write_geo_table_clustered

    rng = random.Random(9)
    rows = [(POINT, [rng.uniform(-9, 9), rng.uniform(-9, 9)]) for _ in range(4000)]
    df = geoms_to_df(spark, rows)
    grid = Grid((-10.0, -10.0, 10.0, 10.0))

    # zkey vs independent Python Morton code
    sample = with_zorder_key(df, grid).select("id", "zkey").collect()
    n = 1 << Z_RES
    cw, ch = grid.cell_size(Z_RES)
    for r in sample[:200]:
        x, y = rows[r.id][1]
        cx = max(0, min(n - 1, int((x - grid.x0) // cw)))
        cy = max(0, min(n - 1, int((y - grid.y0) // ch)))
        want = 0
        for b in range(Z_RES):
            want |= ((cx >> b) & 1) << (2 * b + 1)
            want |= ((cy >> b) & 1) << (2 * b)
        assert r.zkey == want, (r.id, r.zkey, want)

    path = str(tmp_path / "geo_z")
    write_geo_table_clustered(df, path, grid)
    back = read_geo_table(spark, path)
    assert back.count() == 4000

    checked = 0
    for f in glob.glob(f"{path}/cell_p=*/*.parquet"):
        md = pq.ParquetFile(f).metadata
        zi = md.schema.to_arrow_schema().names.index("zkey")
        prev_max = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(zi).statistics
            assert st is not None
            if prev_max is not None:
                assert st.min >= prev_max, f"{f}: row groups not zkey-sorted"
            prev_max = st.max
            checked += 1
    assert checked > 0


def _xy2d(res: int, cx: int, cy: int) -> int:
    """Independent scalar Hilbert xy2d (classic bit-rotation loop)."""
    d = 0
    x, y = cx, cy
    s = 1 << (res - 1)
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_scalar_and_is_adjacent(spark):
    """with_hilbert_key's JVM aggregate() fold == the scalar xy2d for
    EVERY cell of a 16x16 grid, and the defining Hilbert property
    holds: consecutive keys are grid-ADJACENT cells (Manhattan
    distance exactly 1) — the locality guarantee Morton lacks."""
    from spatialjoin.catalog import with_hilbert_key

    res, n = 4, 16
    grid = Grid((0.0, 0.0, 16.0, 16.0))  # cell size exactly 1.0
    rows = [(POINT, [cx + 0.5, cy + 0.5]) for cx in range(n) for cy in range(n)]
    df = geoms_to_df(spark, rows)
    got = {r.id: r.hkey for r in
           with_hilbert_key(df, grid, res=res).select("id", "hkey").collect()}
    by_d = {}
    for i, (_, (xc, yc)) in enumerate(rows):
        cx, cy = int(xc), int(yc)
        want = _xy2d(res, cx, cy)
        assert got[i] == want, (cx, cy, got[i], want)
        by_d[want] = (cx, cy)
    assert sorted(by_d) == list(range(n * n))  # a bijection onto 0..255
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = by_d[d], by_d[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (d, by_d[d], by_d[d + 1])


def test_hilbert_clustered_write_sorted_row_groups(spark, tmp_path):
    """order='hilbert' writes hkey-sorted row groups (disjoint min/max
    ranges), same guarantee the zorder test pins."""
    import glob

    import pyarrow.parquet as pq

    from spatialjoin.catalog import write_geo_table_clustered

    rng = random.Random(11)
    rows = [(POINT, [rng.uniform(-9, 9), rng.uniform(-9, 9)]) for _ in range(4000)]
    df = geoms_to_df(spark, rows)
    grid = Grid((-10.0, -10.0, 10.0, 10.0))
    path = str(tmp_path / "geo_h")
    write_geo_table_clustered(df, path, grid, order="hilbert")
    assert read_geo_table(spark, path).count() == 4000
    checked = 0
    for f in glob.glob(f"{path}/cell_p=*/*.parquet"):
        md = pq.ParquetFile(f).metadata
        hi = md.schema.to_arrow_schema().names.index("hkey")
        prev_max = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(hi).statistics
            assert st is not None
            if prev_max is not None:
                assert st.min >= prev_max, f"{f}: row groups not hkey-sorted"
            prev_max = st.max
            checked += 1
    assert checked > 0


def test_extent_read_prunes_files(spark):
    """r5 (round-4 ask #7): the clustered layout must actually PRUNE —
    the extent-restricted scan's own numFiles/numPartitions metrics
    (read off the executed FileSourceScan) must show fewer files read
    than exist on disk, exactly the 3x3 cell window of the extent.
    Same data/extents as the geo_storage_roundtrip driver row: at
    sf0.001 the write lands 36 files across 36 cell_p dirs and the
    (-4,-4,4,4) window reads 9 of them."""
    import glob
    import tempfile

    from spatialjoin.catalog import read_geo_extent, write_geo_table_clustered
    from spatialjoin.queries import TILE_EXTENT, _rects_df

    grid = Grid(TILE_EXTENT)
    rects = _rects_df(spark, "/root/testdata/sf0.001", "part", "p_partkey")
    path = tempfile.mkdtemp(prefix="prune_test_")
    write_geo_table_clustered(rects, path, grid)
    n_disk = len(glob.glob(f"{path}/cell_p=*/*.parquet"))
    n_dirs = len(glob.glob(f"{path}/cell_p=*"))

    sub = read_geo_extent(spark, path, grid, (-4.0, -4.0, 4.0, 4.0))
    rows = sub.collect()
    assert len(rows) > 0

    final = sub._jdf.queryExecution().executedPlan()
    try:
        final = final.executedPlan()  # unwrap AdaptiveSparkPlanExec
    except Exception:
        pass
    leaves = final.collectLeaves()
    metrics = {}
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        it = leaf.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[kv._1()] = kv._2().value()
    # extent (-4,-4,4,4) over the 8x8 cell_p grid of TILE_EXTENT
    # (-16..16, cell 4.0) covers cx,cy in [3,5] -> 9 partitions
    assert metrics["numPartitions"] == 9
    assert metrics["numFiles"] < n_disk, (metrics, n_disk)
    assert metrics["numFiles"] <= 9  # one file per pruned-in partition

    import shutil
    shutil.rmtree(path, ignore_errors=True)


def test_hilbert_ranges_exact_cover_and_minimal(spark):
    """hilbert_ranges == the exact cell set of the rect (exhaustive,
    random rects at res 5), intervals sorted/disjoint/merged; and on
    the same rects the Hilbert cover uses <= as many runs as Z-order
    (usually strictly fewer) — the locality claim, quantified."""
    from spatialjoin.catalog import _d2xy, hilbert_ranges

    def xy2d(res, cx, cy):
        return _xy2d(res, cx, cy)

    def zkey(res, cx, cy):
        z = 0
        for b in range(res):
            z |= ((cx >> b) & 1) << (2 * b + 1)
            z |= ((cy >> b) & 1) << (2 * b)
        return z

    rng = random.Random(31)
    res, n = 5, 32
    h_fewer = z_fewer = 0
    for _ in range(40):
        cx0 = rng.randint(0, n - 1); cx1 = rng.randint(cx0, n - 1)
        cy0 = rng.randint(0, n - 1); cy1 = rng.randint(cy0, n - 1)
        ranges = hilbert_ranges(res, cx0, cx1, cy0, cy1)
        want = {xy2d(res, x, y)
                for x in range(cx0, cx1 + 1) for y in range(cy0, cy1 + 1)}
        got = set()
        prev_hi = -2
        for lo, hi in ranges:
            assert lo > prev_hi + 1, "intervals must be merged and sorted"
            prev_hi = hi
            got |= set(range(lo, hi + 1))
        assert got == want
        # roundtrip sanity: d2xy inverts xy2d on this rect
        for d in list(want)[:5]:
            x, y = _d2xy(res, d)
            assert xy2d(res, x, y) == d
        zs = sorted(zkey(res, x, y)
                    for x in range(cx0, cx1 + 1) for y in range(cy0, cy1 + 1))
        z_runs = 1 + sum(1 for a, b in zip(zs, zs[1:]) if b != a + 1)
        if len(ranges) < z_runs:
            h_fewer += 1
        elif z_runs < len(ranges):
            z_fewer += 1
    assert h_fewer > z_fewer, (h_fewer, z_fewer)


def test_read_geo_extent_hilbert_rows_and_rowgroup_pruning(spark, tmp_path):
    """read_geo_extent_hilbert returns exactly the rows whose center
    cell sits in the extent's cell cover, and the hkey intervals prune
    parquet ROW GROUPS inside surviving files (zone-map check against
    the real written stats)."""
    import glob

    import pyarrow.parquet as pq

    from spatialjoin.catalog import (H_RES, Z_RES, hilbert_ranges,
                                     read_geo_table,
                                     read_geo_extent_hilbert,
                                     write_geo_table_clustered)

    rng = random.Random(41)
    rows = [(POINT, [rng.uniform(-9, 9), rng.uniform(-9, 9)]) for _ in range(6000)]
    df = geoms_to_df(spark, rows)
    grid = Grid((-10.0, -10.0, 10.0, 10.0))
    path = str(tmp_path / "geo_hx")
    write_geo_table_clustered(df, path, grid, order="hilbert")

    ext = (-3.0, -1.0, 2.0, 4.0)
    got = {r.id for r in read_geo_extent_hilbert(spark, path, grid, ext).collect()}
    n = 1 << Z_RES
    cw, ch = grid.cell_size(Z_RES)
    cx0 = int((ext[0] - grid.x0) / cw); cx1 = int((ext[2] - grid.x0) / cw)
    cy0 = int((ext[1] - grid.y0) / ch); cy1 = int((ext[3] - grid.y0) / ch)
    want = set()
    for i, (_, (x, y)) in enumerate(rows):
        cx = max(0, min(n - 1, int((x - grid.x0) // cw)))
        cy = max(0, min(n - 1, int((y - grid.y0) // ch)))
        if cx0 <= cx <= cx1 and cy0 <= cy <= cy1:
            want.add(i)
    assert got == want and len(got) > 0

    ranges = hilbert_ranges(Z_RES, cx0, cx1, cy0, cy1)
    total = survivors = 0
    for f in glob.glob(f"{path}/cell_p=*/*.parquet"):
        md = pq.ParquetFile(f).metadata
        hi_idx = md.schema.to_arrow_schema().names.index("hkey")
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(hi_idx).statistics
            total += 1
            if any(st.min <= hi and st.max >= lo for lo, hi in ranges):
                survivors += 1
    assert survivors < total, (survivors, total)
