"""Geometry measures — area, length, centroid — as pure-JVM columns.

The reference crate exposes no measure functions (its API is the two
join operators, src/lib.rs); a training-data pipeline filtering by
footprint area or edge length needs them, so they are part of this
engine's beyond-reference surface. Everything is Spark SQL column math
(higher-order aggregate/transform over the flat coords array), so the
plan stays inside whole-stage codegen — no Python worker.

Semantics per kind (engine kind codes):
  POINT      area 0, length 0
  LINE/LINESTRING  area 0, length = sum of segment lengths
  RECT       area w*h, length = perimeter
  TRIANGLE   |shoelace|, perimeter of the closed ring
  POLYGON    |shoelace(exterior)| - sum |shoelace(hole)| (orientation-
             free, holes assumed disjoint + contained), perimeter =
             sum over ALL rings; centroid = area-weighted combination
             of per-ring shoelace centroids (holes subtract)

Centroid is defined for area kinds (POLYGON/RECT/TRIANGLE); for
LINE/LINESTRING it is the length-weighted midpoint of segments; for
POINT the point itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .geom import LINE, LINESTRING, POINT, POLYGON, RECT, TRIANGLE


def _ring_bounds(c: str = "coords", r: str = "rings"):
    """Per-ring [start, end) POINT offsets: start = rings[i], end =
    rings[i+1] or npts."""
    return (
        f"transform(sequence(1, size({r})), i -> named_struct("
        f"'s', element_at({r}, i), "
        f"'e', IF(i = size({r}), size({c}) DIV 2, element_at({r}, i + 1))))"
    )


def _fold(body: str, s: str, e: str) -> str:
    """Fold ``body`` over segment indices [s, e-2]. Degenerate rings
    (< 2 points) contribute 0 — without the guard, Spark's
    sequence(a, b) with a > b DESCENDS (step -1), silently folding
    wrong (even negative-index) elements."""
    return (
        f"IF((({e})) - (({s})) >= 2, "
        f"aggregate(sequence({s}, ({e}) - 2), CAST(0 AS DOUBLE), {body}), "
        f"CAST(0 AS DOUBLE))"
    )


def _shoelace(c: str, s: str, e: str) -> str:
    """2 * signed area of the CLOSED ring spanning point offsets
    [s, e): sum over segments of x_i*y_(i+1) - x_(i+1)*y_i."""
    return _fold(
        f"(acc, i) -> acc + "
        f"element_at({c}, CAST(2*i + 1 AS INT)) * element_at({c}, CAST(2*i + 4 AS INT)) - "
        f"element_at({c}, CAST(2*i + 3 AS INT)) * element_at({c}, CAST(2*i + 2 AS INT))",
        s, e,
    )


def _ring_len(c: str, s: str, e: str) -> str:
    """Sum of segment lengths over point offsets [s, e)."""
    return _fold(
        f"(acc, i) -> acc + "
        f"sqrt((element_at({c}, CAST(2*i + 3 AS INT)) - element_at({c}, CAST(2*i + 1 AS INT))) * "
        f"(element_at({c}, CAST(2*i + 3 AS INT)) - element_at({c}, CAST(2*i + 1 AS INT))) + "
        f"(element_at({c}, CAST(2*i + 4 AS INT)) - element_at({c}, CAST(2*i + 2 AS INT))) * "
        f"(element_at({c}, CAST(2*i + 4 AS INT)) - element_at({c}, CAST(2*i + 2 AS INT))))",
        s, e,
    )


def _cx_num(c: str, s: str, e: str) -> str:
    """6 * signed-area-weighted centroid x of a closed ring."""
    return _fold(
        f"(acc, i) -> acc + "
        f"(element_at({c}, CAST(2*i + 1 AS INT)) + element_at({c}, CAST(2*i + 3 AS INT))) * "
        f"(element_at({c}, CAST(2*i + 1 AS INT)) * element_at({c}, CAST(2*i + 4 AS INT)) - "
        f"element_at({c}, CAST(2*i + 3 AS INT)) * element_at({c}, CAST(2*i + 2 AS INT)))",
        s, e,
    )


def _cy_num(c: str, s: str, e: str) -> str:
    return _fold(
        f"(acc, i) -> acc + "
        f"(element_at({c}, CAST(2*i + 2 AS INT)) + element_at({c}, CAST(2*i + 4 AS INT))) * "
        f"(element_at({c}, CAST(2*i + 1 AS INT)) * element_at({c}, CAST(2*i + 4 AS INT)) - "
        f"element_at({c}, CAST(2*i + 3 AS INT)) * element_at({c}, CAST(2*i + 2 AS INT)))",
        s, e,
    )


def area(kind: str = "kind", coords: str = "coords", rings: str = "rings") -> Column:
    c = coords
    rb = _ring_bounds(coords, rings)
    # polygon: |exterior| - sum of |holes|, ring ordinal via zip_with
    poly = (
        f"aggregate(zip_with({rb}, sequence(1, size({rings})), (b, ri) -> "
        f"IF(ri = 1, abs({_shoelace(c, 'b.s', 'b.e')}) / 2e0, "
        f"-abs({_shoelace(c, 'b.s', 'b.e')}) / 2e0)), "
        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    rect = (
        f"(element_at({c}, 3) - element_at({c}, 1)) * "
        f"(element_at({c}, 4) - element_at({c}, 2))"
    )
    tri = (
        f"abs((element_at({c}, 3) - element_at({c}, 1)) * (element_at({c}, 6) - element_at({c}, 2)) - "
        f"(element_at({c}, 5) - element_at({c}, 1)) * (element_at({c}, 4) - element_at({c}, 2))) / 2e0"
    )
    return (
        F.when(F.col(kind) == POLYGON, F.expr(poly))
        .when(F.col(kind) == RECT, F.expr(rect))
        .when(F.col(kind) == TRIANGLE, F.expr(tri))
        .otherwise(F.lit(0.0))
    )


def length(kind: str = "kind", coords: str = "coords", rings: str = "rings") -> Column:
    """Perimeter for area kinds, path length for line kinds, 0 for
    points."""
    c = coords
    rb = _ring_bounds(coords, rings)
    poly = (
        f"aggregate({rb}, CAST(0 AS DOUBLE), (acc, b) -> acc + "
        f"{_ring_len(c, 'b.s', 'b.e')})"
    )
    path = _ring_len(c, "0", f"size({c}) DIV 2")
    rect = (
        f"2e0 * ((element_at({c}, 3) - element_at({c}, 1)) + "
        f"(element_at({c}, 4) - element_at({c}, 2)))"
    )
    # triangle ring is stored OPEN (3 points): close it for perimeter
    # (4 points -> 3 segments)
    tri_closed = f"concat({c}, slice({c}, 1, 2))"
    tri = _ring_len(tri_closed, "0", "4")
    return (
        F.when(F.col(kind) == POLYGON, F.expr(poly))
        .when(F.col(kind).isin(LINE, LINESTRING), F.expr(path))
        .when(F.col(kind) == RECT, F.expr(rect))
        .when(F.col(kind) == TRIANGLE, F.expr(tri))
        .otherwise(F.lit(0.0))
    )


def _poly_centroid(axis: str, coords: str, rings: str) -> str:
    """Signed-area-weighted centroid over all rings, holes subtracting
    regardless of stored orientation. With w_r = +-|A_r| and C_r =
    num_r / (3 * sh_r), each w_r * C_r = +- sign(sh_r) * num_r / 6, so

        C = (sum_r +- sign(sh_r) * num_r) / (6 * area)

    — a single final division. On integer-lattice coordinates every
    intermediate is an exact integer-valued double, making the result
    bit-deterministic (and DuckDB-oracle-exact)."""
    c = coords
    rb = _ring_bounds(coords, rings)
    num_fn = _cx_num if axis == "x" else _cy_num
    term = f"sign({_shoelace(c, 'b.s', 'b.e')}) * ({num_fn(c, 'b.s', 'b.e')})"
    num = (
        f"aggregate(zip_with({rb}, sequence(1, size({rings})), (b, ri) -> "
        f"IF(ri = 1, {term}, -({term}))), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    den = (
        f"aggregate(zip_with({rb}, sequence(1, size({rings})), (b, ri) -> "
        f"IF(ri = 1, abs({_shoelace(c, 'b.s', 'b.e')}) / 2e0, "
        f"-abs({_shoelace(c, 'b.s', 'b.e')}) / 2e0)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    # zero-area polygon (degenerate/sliver): centroid is undefined —
    # return NULL rather than a silent NaN/Inf from the division
    return (
        f"IF(({den}) = 0e0, CAST(NULL AS DOUBLE), ({num}) / (6e0 * ({den})))"
    )


def centroid(axis: str, kind: str = "kind", coords: str = "coords",
             rings: str = "rings") -> Column:
    """Centroid coordinate (axis 'x' or 'y'). Area-weighted for area
    kinds, length-weighted segment midpoints for line kinds, the point
    itself for points."""
    c = coords
    off = 1 if axis == "x" else 2
    poly = _poly_centroid(axis, coords, rings)
    rect = f"(element_at({c}, {off}) + element_at({c}, {off + 2})) / 2e0"
    tri = (
        f"(element_at({c}, {off}) + element_at({c}, {off + 2}) + "
        f"element_at({c}, {off + 4})) / 3e0"
    )
    n = f"size({c}) DIV 2"
    seg_mid = (
        f"aggregate(sequence(0, ({n}) - 2), CAST(0 AS DOUBLE), (acc, i) -> acc + "
        f"((element_at({c}, CAST(2*i + {off} AS INT)) + element_at({c}, CAST(2*i + {off + 2} AS INT))) / 2e0) * "
        f"sqrt((element_at({c}, CAST(2*i + 3 AS INT)) - element_at({c}, CAST(2*i + 1 AS INT))) * "
        f"(element_at({c}, CAST(2*i + 3 AS INT)) - element_at({c}, CAST(2*i + 1 AS INT))) + "
        f"(element_at({c}, CAST(2*i + 4 AS INT)) - element_at({c}, CAST(2*i + 2 AS INT))) * "
        f"(element_at({c}, CAST(2*i + 4 AS INT)) - element_at({c}, CAST(2*i + 2 AS INT)))))"
    )
    # zero-length path (coincident points): fall back to the first
    # vertex — the length-weighted mean is 0/0 otherwise
    path = (
        f"IF(({_ring_len(c, '0', n)}) = 0e0, element_at({c}, {off}), "
        f"({seg_mid}) / ({_ring_len(c, '0', n)}))"
    )
    return (
        F.when(F.col(kind) == POLYGON, F.expr(poly))
        .when(F.col(kind) == RECT, F.expr(rect))
        .when(F.col(kind) == TRIANGLE, F.expr(tri))
        .when(F.col(kind).isin(LINE, LINESTRING), F.expr(path))
        .otherwise(F.expr(f"element_at({c}, {off})"))
    )


def with_measures(df: DataFrame, kind: str = "kind", coords: str = "coords",
                  rings: str = "rings") -> DataFrame:
    """Add area / length / centroid_x / centroid_y columns — one
    pure-JVM projection, no shuffle, no Python."""
    return (
        df.withColumn("area", area(kind, coords, rings))
        .withColumn("length", length(kind, coords, rings))
        .withColumn("centroid_x", centroid("x", kind, coords, rings))
        .withColumn("centroid_y", centroid("y", kind, coords, rings))
    )
