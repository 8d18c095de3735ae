"""Geometry measures: area / length / centroid, pure-JVM columns."""

from __future__ import annotations

import math

from spatialjoin.measures import with_measures
from spatialjoin.sparkutil import geoms_to_df

# (kind, coords[, ring offsets on the UNCLOSED input]) -> expected
# (area, length, cx, cy)
CASES = [
    ((0, [3.0, 4.0]), (0.0, 0.0, 3.0, 4.0)),
    ((1, [0.0, 0.0, 3.0, 4.0]), (0.0, 5.0, 1.5, 2.0)),
    ((2, [0.0, 0.0, 3.0, 4.0, 6.0, 0.0]), (0.0, 10.0, 3.0, 2.0)),
    ((4, [1.0, 2.0, 4.0, 6.0]), (12.0, 14.0, 2.5, 4.0)),
    ((5, [0.0, 0.0, 4.0, 0.0, 0.0, 3.0]), (6.0, 12.0, 4.0 / 3.0, 1.0)),
    # square
    ((3, [0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0], [0]),
     (16.0, 16.0, 2.0, 2.0)),
    # square with centered 2x2 hole: area 36-4, perimeter 24+8
    ((3, [0.0, 0.0, 6.0, 0.0, 6.0, 6.0, 0.0, 6.0,
          2.0, 2.0, 4.0, 2.0, 4.0, 4.0, 2.0, 4.0], [0, 4]),
     (32.0, 32.0, 3.0, 3.0)),
    # off-center 1x1 hole at [1,2]x[1,2]: centroid shifts away from it
    ((3, [0.0, 0.0, 6.0, 0.0, 6.0, 6.0, 0.0, 6.0,
          1.0, 1.0, 2.0, 1.0, 2.0, 2.0, 1.0, 2.0], [0, 4]),
     (35.0, 28.0, (3.0 * 36 - 1.5 * 1) / 35, (3.0 * 36 - 1.5 * 1) / 35)),
    # CW (reversed) square — orientation must not matter
    ((3, [0.0, 0.0, 0.0, 4.0, 4.0, 4.0, 4.0, 0.0], [0]),
     (16.0, 16.0, 2.0, 2.0)),
]


def test_measures_all_kinds(spark):
    df = with_measures(geoms_to_df(spark, [c for c, _ in CASES]))
    got = {r.id: (r.area, r.length, r.centroid_x, r.centroid_y)
           for r in df.collect()}
    for i, (_, want) in enumerate(CASES):
        for g, w in zip(got[i], want):
            assert math.isclose(g, w, rel_tol=1e-12, abs_tol=1e-12), (i, got[i], want)


def test_degenerate_geometry_guards(spark):
    """Zero-area polygons get a NULL centroid (not NaN/Inf), rings with
    < 2 points contribute 0 (Spark's sequence(a, b) would otherwise
    DESCEND and fold wrong elements), zero-length lines centroid at
    their vertex."""
    rows = [
        # collinear (zero-area) polygon
        (3, [0.0, 0.0, 2.0, 0.0, 4.0, 0.0], [0]),
        # square with a degenerate single-point second "ring"
        (3, [0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 1.0, 1.0], [0, 4]),
        # zero-length line
        (1, [2.0, 3.0, 2.0, 3.0]),
    ]
    df = with_measures(geoms_to_df(spark, rows))
    got = {r.id: r for r in df.collect()}
    assert got[0].area == 0.0
    assert got[0].centroid_x is None and got[0].centroid_y is None
    assert math.isclose(got[1].area, 16.0)
    assert math.isclose(got[1].length, 16.0)
    assert math.isclose(got[1].centroid_x, 2.0)
    assert math.isclose(got[1].centroid_y, 2.0)
    assert got[2].length == 0.0
    assert (got[2].centroid_x, got[2].centroid_y) == (2.0, 3.0)


def test_measures_plan_is_pure_jvm(spark):
    df = with_measures(geoms_to_df(spark, [c for c, _ in CASES]))
    plan = df._jdf.queryExecution().toString()
    for op in ("MapInPandas", "MapInArrow", "FlatMapCoGroupsInPandas", "FlatMapCoGroupsInArrow", "BatchEvalPython"):
        assert op not in plan
