"""Engine queries over the driver's testdata tables + their DuckDB oracles.

Geometry is DERIVED deterministically from the TPC-H-ish tables with
integer-hash + IEEE-double arithmetic written as the SAME SQL expression
text for Spark (selectExpr) and DuckDB (oracle), so coordinates are
bit-identical in both engines and value-hash comparisons are exact.

Every query runs through the real engine (SpatialIndex / knn_join /
assign_tiles); the oracle re-derives the answer in pure ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ann import (
    oracle_ann_ivf,
    oracle_ann_lsh,
    oracle_ann_topk,
    oracle_embedding_near_dup,
    q_ann_ivf,
    q_ann_lsh,
    q_ann_topk,
    q_embedding_near_dup,
)
from .index import SpatialIndex
from .knn import knn_join
from .textops import TEXT_ORACLES, TEXT_QUERIES
from .tiles import assign_tiles

# -- shared derivation expression text (Spark SQL == DuckDB SQL) --------------

# NOTE: every fractional literal uses e-notation (1e6, 5e-1, ...): both
# Spark 4 and DuckDB parse X.Y literals as DECIMAL but e-notation as
# DOUBLE — decimal arithmetic would round differently than the numpy
# kernels and break bit-exact oracle comparison.
PX = "(({k} * 2654435761) % 1000000) / 1e6 * 20e0 - 10e0"
PY = "(({k} * 40503) % 1000000) / 1e6 * 20e0 - 10e0"
# rhombus half-sizes for supplier quads
QA = "5e-1 + ({k} % 7) / 7e0 * 15e-1"
QB = "5e-1 + ({k} % 11) / 11e0 * 15e-1"
# rect half-sizes
RA = "2e-2 + ({k} % 97) / 97e0 * 18e-2"
RB = "2e-2 + ({k} % 89) / 89e0 * 18e-2"

TILE_EXTENT = (-16.0, -16.0, 16.0, 16.0)
TILE_ZOOM = 5


def _points_df(spark, sf_dir, table, key) -> DataFrame:
    px, py = PX.format(k=key), PY.format(k=key)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet").selectExpr(
        f"{key} as id",
        "0 as kind",
        f"array({px}, {py}) as coords",
        "cast(null as array<int>) as rings",
    )


def _rects_df(spark, sf_dir, table, key, id_expr=None) -> DataFrame:
    px, py = PX.format(k=key), PY.format(k=key)
    ra, rb = RA.format(k=key), RB.format(k=key)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet").selectExpr(
        f"{id_expr or key} as id",
        "4 as kind",
        f"array(({px}) - ({ra}), ({py}) - ({rb}), ({px}) + ({ra}), ({py}) + ({rb})) as coords",
        "cast(null as array<int>) as rings",
    )


def _quads_df(spark, sf_dir, table, key) -> DataFrame:
    """CCW rhombus polygon (closed ring of 5 points)."""
    px, py = PX.format(k=key), PY.format(k=key)
    a, b = QA.format(k=key), QB.format(k=key)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet").selectExpr(
        f"{key} as id",
        "3 as kind",
        f"array(({px}) + ({a}), ({py}), ({px}), ({py}) + ({b}), "
        f"({px}) - ({a}), ({py}), ({px}), ({py}) - ({b}), ({px}) + ({a}), ({py})) as coords",
        "array(0) as rings",
    )


LINEITEM_ID = "l_orderkey * 10 + l_linenumber"


# -- queries (spark, sf_dir) -> DataFrame -------------------------------------


def q_pip_quad_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon join: supplier quads CONTAIN customer points."""
    quads = _quads_df(spark, sf_dir, "supplier", "s_suppkey")
    pts = _points_df(spark, sf_dir, "customer", "c_custkey")
    idx = SpatialIndex.build(spark, quads, validate=False)
    return idx.spatial_join(pts, how="contains", validate=False, big_kinds={0})


def q_pip_rect_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-rect containment: part rects CONTAIN customer points."""
    rects = _rects_df(spark, sf_dir, "part", "p_partkey")
    pts = _points_df(spark, sf_dir, "customer", "c_custkey")
    idx = SpatialIndex.build(spark, rects, validate=False)
    return idx.spatial_join(pts, how="contains", validate=False, big_kinds={0})


def q_rects_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rect-rect Intersects join: part rects vs lineitem rects."""
    small = _rects_df(spark, sf_dir, "part", "p_partkey")
    big = _rects_df(spark, sf_dir, "lineitem", "(l_orderkey * 10 + l_linenumber)",
                    id_expr=LINEITEM_ID)
    idx = SpatialIndex.build(spark, small, validate=False)
    return idx.spatial_join(big, how="intersects", validate=False, big_kinds={4})


def q_points_within_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'within' path: customer points (small) WITHIN supplier quads (big)."""
    pts = _points_df(spark, sf_dir, "customer", "c_custkey")
    quads = _quads_df(spark, sf_dir, "supplier", "s_suppkey")
    idx = SpatialIndex.build(spark, pts, validate=False)
    return idx.spatial_join(quads, how="within", validate=False,
                            big_kinds={3}, big_max_rings=1)


def q_prox_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity map (inclusive epsilon join) with exact distances."""
    sup = _points_df(spark, sf_dir, "supplier", "s_suppkey")
    cust = _points_df(spark, sf_dir, "customer", "c_custkey")
    idx = SpatialIndex.build(spark, sup, max_distance=2.0, validate=False)
    return idx.proximity_map(cust, validate=False, big_kinds={0})


def q_knn_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=3 nearest part centers for every customer point."""
    parts = _points_df(spark, sf_dir, "part", "p_partkey")
    cust = _points_df(spark, sf_dir, "customer", "c_custkey")
    out = knn_join(spark, parts, cust, k=3, validate=False)
    return out.select("big_id", "small_id", "distance", "rank")


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster-tile <-> vector assignment of part rects at zoom 5."""
    rects = _rects_df(spark, sf_dir, "part", "p_partkey")
    out = assign_tiles(rects, zoom=TILE_ZOOM, extent=TILE_EXTENT, validate=False)
    return out.select("id", "tx", "ty")


# -- DuckDB oracles ------------------------------------------------------------


def _oracle_pip_quads(small_within_big: bool) -> str:
    px_c, py_c = PX.format(k="c_custkey"), PY.format(k="c_custkey")
    px_s, py_s = PX.format(k="s_suppkey"), PY.format(k="s_suppkey")
    a, b = QA.format(k="s_suppkey"), QB.format(k="s_suppkey")
    # CCW rhombus vertices: (cx+a,cy) (cx,cy+b) (cx-a,cy) (cx,cy-b);
    # strict interior = all edge cross products > 0 (boundary-exclusive,
    # matching the engine's geo-0.14 polygon containment)
    if small_within_big:
        big_id, small_id = "qds.s_suppkey", "pts.c_custkey"
    else:
        big_id, small_id = "pts.c_custkey", "qds.s_suppkey"
    return f"""
WITH pts AS (SELECT c_custkey, {px_c} AS px, {py_c} AS py FROM customer),
qds AS (SELECT s_suppkey, {px_s} AS cx, {py_s} AS cy, {a} AS a, {b} AS b FROM supplier)
SELECT {big_id} AS big_id, {small_id} AS small_id
FROM pts, qds
WHERE ((cx) - (cx + a)) * (py - cy) - ((cy + b) - cy) * (px - (cx + a)) > 0
  AND ((cx - a) - cx) * (py - (cy + b)) - (cy - (cy + b)) * (px - cx) > 0
  AND (cx - (cx - a)) * (py - cy) - ((cy - b) - cy) * (px - (cx - a)) > 0
  AND ((cx + a) - cx) * (py - (cy - b)) - (cy - (cy - b)) * (px - cx) > 0
""".strip()


def oracle_images_pipeline(n: int = 512) -> str:
    """DuckDB twin of q_images_pipeline. The synth image table is a
    deterministic function of the row index (images.py:105-138), so the
    whole pipeline output (big_id, small_id, n_tiles) is re-derivable
    from generate_series without any binary column: footprint rhombus
    centers/half-sizes from the index hash, the caption point via the
    exact %.6f round-trip the caption text applies, strict-interior PIP
    (same cross-product form as the quad oracles), and zoom-4 tile
    counts via the closed-rhombus/rect distance form min over the tile
    of |dx|/hx + |dy|/hy <= 1 over the engine's bbox tile covering."""
    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n - 1})) AS i),
img AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 64 END AS w,
         CASE i % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 48 END AS h,
         ((i * 2654435761) % 1000000) / 1e6 * 20e0 - 10e0 AS lon,
         ((i * 40503) % 1000000) / 1e6 * 20e0 - 10e0 AS lat
  FROM ids
),
fp AS (
  SELECT i, lon, lat, w / 64e0 * 3e-1 AS hx, h / 64e0 * 3e-1 AS hy FROM img
),
pts AS (
  SELECT i AS pi,
         CAST(printf('%.6f', lon) AS DOUBLE) AS px,
         CAST(printf('%.6f', lat) AS DOUBLE) AS py
  FROM img
),
pairs AS (
  SELECT pts.pi AS big_id, fp.i AS small_id
  FROM pts, fp
  WHERE ((lon) - (lon + hx)) * (py - lat) - ((lat + hy) - lat) * (px - (lon + hx)) > 0
    AND ((lon - hx) - lon) * (py - (lat + hy)) - (lat - (lat + hy)) * (px - lon) > 0
    AND (lon - (lon - hx)) * (py - lat) - ((lat - hy) - lat) * (px - (lon - hx)) > 0
    AND ((lon + hx) - lon) * (py - (lat - hy)) - (lat - (lat - hy)) * (px - lon) > 0
),
cov AS (
  SELECT i, lon, lat, hx, hy,
         greatest(0, least(15, CAST(floor(((lon - hx) - (-16e0)) / 2e0) AS BIGINT))) AS cx0,
         greatest(0, least(15, CAST(floor(((lon + hx) - (-16e0)) / 2e0) AS BIGINT))) AS cx1,
         greatest(0, least(15, CAST(floor(((lat - hy) - (-16e0)) / 2e0) AS BIGINT))) AS cy0,
         greatest(0, least(15, CAST(floor(((lat + hy) - (-16e0)) / 2e0) AS BIGINT))) AS cy1
  FROM fp
),
ser AS (SELECT unnest(generate_series(0, 15)) AS t),
tiles AS (
  SELECT cov.i
  FROM cov
  JOIN ser sx ON sx.t >= cx0 AND sx.t <= cx1
  JOIN ser sy ON sy.t >= cy0 AND sy.t <= cy1
  WHERE (greatest(0e0, (-16e0 + sx.t * 2e0) - lon, lon - (-16e0 + (sx.t + 1) * 2e0)) / hx
       + greatest(0e0, (-16e0 + sy.t * 2e0) - lat, lat - (-16e0 + (sy.t + 1) * 2e0)) / hy) <= 1e0
),
tc AS (SELECT i, count(*) AS n_tiles FROM tiles GROUP BY 1)
SELECT pairs.big_id, pairs.small_id, tc.n_tiles
FROM pairs JOIN tc ON tc.i = pairs.small_id
""".strip()


def oracle_sql() -> dict[str, str]:
    px_c, py_c = PX.format(k="c_custkey"), PY.format(k="c_custkey")
    px_p, py_p = PX.format(k="p_partkey"), PY.format(k="p_partkey")
    ra_p, rb_p = RA.format(k="p_partkey"), RB.format(k="p_partkey")
    px_s, py_s = PX.format(k="s_suppkey"), PY.format(k="s_suppkey")
    lk = "(l_orderkey * 10 + l_linenumber)"
    px_l, py_l = PX.format(k=lk), PY.format(k=lk)
    ra_l, rb_l = RA.format(k=lk), RB.format(k=lk)

    ts = (TILE_EXTENT[2] - TILE_EXTENT[0]) / (1 << TILE_ZOOM)
    x0, y0 = TILE_EXTENT[0], TILE_EXTENT[1]
    ts_sql, x0_sql, y0_sql = f"{ts:.17e}", f"{x0:.17e}", f"{y0:.17e}"
    ncell = (1 << TILE_ZOOM) - 1

    return {
        "pip_quad_contains": _oracle_pip_quads(small_within_big=False),
        "points_within_quads": _oracle_pip_quads(small_within_big=True),
        "pip_rect_contains": f"""
WITH pts AS (SELECT c_custkey, {px_c} AS px, {py_c} AS py FROM customer),
rcs AS (SELECT p_partkey,
               ({px_p}) - ({ra_p}) AS xmin, ({py_p}) - ({rb_p}) AS ymin,
               ({px_p}) + ({ra_p}) AS xmax, ({py_p}) + ({rb_p}) AS ymax FROM part)
SELECT pts.c_custkey AS big_id, rcs.p_partkey AS small_id
FROM pts, rcs
WHERE px >= xmin AND px <= xmax AND py >= ymin AND py <= ymax
""".strip(),
        "rects_intersect": f"""
WITH a AS (SELECT p_partkey,
               ({px_p}) - ({ra_p}) AS xmin, ({py_p}) - ({rb_p}) AS ymin,
               ({px_p}) + ({ra_p}) AS xmax, ({py_p}) + ({rb_p}) AS ymax FROM part),
b AS (SELECT {lk} AS lid,
               ({px_l}) - ({ra_l}) AS xmin, ({py_l}) - ({rb_l}) AS ymin,
               ({px_l}) + ({ra_l}) AS xmax, ({py_l}) + ({rb_l}) AS ymax FROM lineitem)
SELECT b.lid AS big_id, a.p_partkey AS small_id
FROM a JOIN b
  ON a.xmin <= b.xmax AND a.xmax >= b.xmin AND a.ymin <= b.ymax AND a.ymax >= b.ymin
""".strip(),
        "prox_points": f"""
WITH sup AS (SELECT s_suppkey, {px_s} AS px, {py_s} AS py FROM supplier),
cst AS (SELECT c_custkey, {px_c} AS px, {py_c} AS py FROM customer)
SELECT cst.c_custkey AS big_id, sup.s_suppkey AS small_id,
       sqrt((sup.px - cst.px) * (sup.px - cst.px) + (sup.py - cst.py) * (sup.py - cst.py)) AS distance
FROM sup, cst
WHERE sqrt((sup.px - cst.px) * (sup.px - cst.px) + (sup.py - cst.py) * (sup.py - cst.py)) <= 2e0
""".strip(),
        "knn_points": f"""
WITH prt AS (SELECT p_partkey, {px_p} AS px, {py_p} AS py FROM part),
cst AS (SELECT c_custkey, {px_c} AS px, {py_c} AS py FROM customer)
SELECT c_custkey AS big_id, p_partkey AS small_id,
       sqrt((prt.px - cst.px) * (prt.px - cst.px) + (prt.py - cst.py) * (prt.py - cst.py)) AS distance,
       CAST(row_number() OVER (
           PARTITION BY c_custkey
           ORDER BY sqrt((prt.px - cst.px) * (prt.px - cst.px) + (prt.py - cst.py) * (prt.py - cst.py)) ASC,
                    p_partkey ASC
       ) AS INTEGER) AS rank
FROM prt, cst
QUALIFY rank <= 3
""".strip(),
        "tile_assign": f"""
WITH rcs AS (SELECT p_partkey,
               greatest(0, least({ncell}, CAST(floor(((({px_p}) - ({ra_p})) - ({x0_sql})) / {ts_sql}) AS BIGINT))) AS cx0,
               greatest(0, least({ncell}, CAST(floor(((({px_p}) + ({ra_p})) - ({x0_sql})) / {ts_sql}) AS BIGINT))) AS cx1,
               greatest(0, least({ncell}, CAST(floor(((({py_p}) - ({rb_p})) - ({y0_sql})) / {ts_sql}) AS BIGINT))) AS cy0,
               greatest(0, least({ncell}, CAST(floor(((({py_p}) + ({rb_p})) - ({y0_sql})) / {ts_sql}) AS BIGINT))) AS cy1
        FROM part),
ser AS (SELECT unnest(generate_series(0, {ncell})) AS i)
SELECT p_partkey AS id, sx.i AS tx, sy.i AS ty
FROM rcs
JOIN ser sx ON sx.i >= cx0 AND sx.i <= cx1
JOIN ser sy ON sy.i >= cy0 AND sy.i <= cy1
""".strip(),
        "ann_topk": oracle_ann_topk(),
        "ann_ivf": oracle_ann_ivf(),
        "ann_lsh": oracle_ann_lsh(),
        "embedding_near_dup": oracle_embedding_near_dup(),
        "cell_counts": f"""
WITH pts AS (SELECT c_custkey, {px_c} AS px, {py_c} AS py FROM customer),
cells AS (
  SELECT c_custkey,
         greatest(0, least({ncell}, CAST(floor((px - ({x0_sql})) / {ts_sql}) AS BIGINT))) AS tx,
         greatest(0, least({ncell}, CAST(floor((py - ({y0_sql})) / {ts_sql}) AS BIGINT))) AS ty
  FROM pts)
SELECT tx, ty, count(*) AS n_customers FROM cells GROUP BY 1, 2
""".strip(),
        "top_tiles": f"""
WITH pts AS (SELECT c_custkey, {px_c} AS px, {py_c} AS py FROM customer),
cells AS (
  SELECT c_custkey,
         greatest(0, least({ncell}, CAST(floor((px - ({x0_sql})) / {ts_sql}) AS BIGINT))) AS tx,
         greatest(0, least({ncell}, CAST(floor((py - ({y0_sql})) / {ts_sql}) AS BIGINT))) AS ty
  FROM pts)
SELECT tx, ty, count(*) AS n_customers FROM cells GROUP BY 1, 2
ORDER BY n_customers DESC, tx ASC, ty ASC LIMIT 10
""".strip(),
        "images_pipeline": oracle_images_pipeline(),
        "unmatched_customers": f"""
WITH sup AS (SELECT s_suppkey, {px_s} AS px, {py_s} AS py FROM supplier),
cst AS (SELECT c_custkey, {px_c} AS px, {py_c} AS py FROM customer)
SELECT c_custkey FROM cst
WHERE NOT EXISTS (
  SELECT 1 FROM sup
  WHERE sqrt((sup.px - cst.px) * (sup.px - cst.px) + (sup.py - cst.py) * (sup.py - cst.py)) <= 2e0
)
""".strip(),
        **TEXT_ORACLES,
    }


def q_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a spatial op: customers per zoom-5 tile."""
    pts = _points_df(spark, sf_dir, "customer", "c_custkey")
    tiles = assign_tiles(pts, zoom=TILE_ZOOM, extent=TILE_EXTENT, validate=False)
    return tiles.groupBy("tx", "ty").agg(F.count(F.lit(1)).alias("n_customers"))


def q_top_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort/limit over the aggregation: 10 densest tiles (deterministic
    tie-break by coordinates)."""
    return (
        q_cell_counts(spark, sf_dir)
        .orderBy(F.col("n_customers").desc(), F.col("tx").asc(), F.col("ty").asc())
        .limit(10)
    )


def q_unmatched_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join semantics: customers with NO supplier within distance 2."""
    cust = _points_df(spark, sf_dir, "customer", "c_custkey") \
        .select(F.col("id").alias("c_custkey"))
    prox = q_prox_points(spark, sf_dir).select("big_id")
    return cust.join(prox, cust.c_custkey == prox.big_id, "left_anti").select("c_custkey")


def q_images_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline: synth image table -> footprints + caption
    points -> PIP join through the engine -> per-image tile counts at
    zoom 4. Oracle-checked: the output is a deterministic function of
    the row index (see oracle_images_pipeline), no binary column needs
    to cross into DuckDB."""
    from .images import caption_points, footprints, synth_images

    imgs = synth_images(spark, 512).persist()
    fp = footprints(imgs)
    pts = caption_points(imgs)
    idx = SpatialIndex.build(spark, fp, validate=False)
    pairs = idx.spatial_join(pts, how="contains", validate=False)
    tiles = assign_tiles(fp, zoom=4, extent=(-16.0, -16.0, 16.0, 16.0), validate=False)
    tile_counts = tiles.groupBy("id").agg(F.count(F.lit(1)).alias("n_tiles"))
    return (
        pairs.join(tile_counts, pairs.small_id == tile_counts.id)
        .select("big_id", "small_id", "n_tiles")
    )


QUERIES = {
    "pip_quad_contains": q_pip_quad_contains,
    "points_within_quads": q_points_within_quads,
    "pip_rect_contains": q_pip_rect_contains,
    "rects_intersect": q_rects_intersect,
    "prox_points": q_prox_points,
    "knn_points": q_knn_points,
    "tile_assign": q_tile_assign,
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "embedding_near_dup": q_embedding_near_dup,
    "cell_counts": q_cell_counts,
    "top_tiles": q_top_tiles,
    "unmatched_customers": q_unmatched_customers,
    "images_pipeline": q_images_pipeline,
    **TEXT_QUERIES,
}
