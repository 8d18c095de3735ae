"""WKT source/sink: pure-JVM parse + format roundtrips."""

from __future__ import annotations

import pytest

from spatialjoin.sparkutil import geoms_to_df
from spatialjoin.wkt import from_wkt, to_wkt

CASES = [
    ("POINT (1 2)", 0, [1.0, 2.0], None),
    ("LINESTRING (0 0, 3 4)", 1, [0.0, 0.0, 3.0, 4.0], None),
    ("LINESTRING (0 0, 1 1, 2 0)", 2, [0.0, 0.0, 1.0, 1.0, 2.0, 0.0], None),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", 3,
     [0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 0.0, 0.0], [0]),
    # hole + offsets
    ("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))", 3,
     [0.0, 0.0, 8.0, 0.0, 8.0, 8.0, 0.0, 8.0, 0.0, 0.0,
      2.0, 2.0, 3.0, 2.0, 3.0, 3.0, 2.0, 3.0, 2.0, 2.0], [0, 5]),
    # open ring auto-closed, lowercase, odd whitespace
    ("  polygon ( ( 0 0 , 2 0 , 1 2 ) )", 3,
     [0.0, 0.0, 2.0, 0.0, 1.0, 2.0, 0.0, 0.0], [0]),
    # scientific notation + negatives
    ("POINT (-1.5e2 2.25)", 0, [-150.0, 2.25], None),
]


def test_from_wkt_all_kinds(spark):
    df = spark.createDataFrame(
        [(i, w) for i, (w, *_) in enumerate(CASES)], "id long, wkt string"
    )
    got = {r.id: (r.kind, list(r.coords), list(r.rings) if r.rings is not None else None)
           for r in from_wkt(df).collect()}
    for i, (_, kind, coords, rings) in enumerate(CASES):
        assert got[i] == (kind, coords, rings), (i, got[i])


def test_wkt_roundtrip_identity(spark):
    df = spark.createDataFrame(
        [(i, w) for i, (w, *_) in enumerate(CASES)], "id long, wkt string"
    )
    parsed = from_wkt(df).select("id", "kind", "coords", "rings")
    rt = from_wkt(to_wkt(parsed).select("id", "wkt")).select(
        "id", "kind", "coords", "rings"
    )
    a = {r.id: (r.kind, list(r.coords), list(r.rings or [])) for r in parsed.collect()}
    b = {r.id: (r.kind, list(r.coords), list(r.rings or [])) for r in rt.collect()}
    assert a == b


def test_to_wkt_rect_triangle_as_polygon(spark):
    g = geoms_to_df(spark, [(4, [0.0, 0.0, 2.0, 3.0]),
                            (5, [0.0, 0.0, 2.0, 0.0, 1.0, 2.0])])
    got = {r.id: r.wkt for r in to_wkt(g).collect()}
    assert got[0] == "POLYGON ((0.0 0.0, 2.0 0.0, 2.0 3.0, 0.0 3.0, 0.0 0.0))"
    assert got[1] == "POLYGON ((0.0 0.0, 2.0 0.0, 1.0 2.0, 0.0 0.0))"
    # and the polygon forms parse back to the same shapes' vertices
    back = {r.id: list(r.coords) for r in
            from_wkt(to_wkt(g).select("id", "wkt")).collect()}
    assert back[0] == [0.0, 0.0, 2.0, 0.0, 2.0, 3.0, 0.0, 3.0, 0.0, 0.0]
    assert back[1] == [0.0, 0.0, 2.0, 0.0, 1.0, 2.0, 0.0, 0.0]


def test_permissive_nulls_bad_rows(spark):
    bad = spark.createDataFrame(
        [(0, "GARBAGE (1 2)"), (1, "POINT (x y)"), (2, "POINT (3 4)")],
        "id long, wkt string",
    )
    got = {r.id: r.kind for r in from_wkt(bad, permissive=True).collect()}
    assert got == {0: None, 1: None, 2: 0}


def test_strict_raises_on_bad_type(spark):
    bad = spark.createDataFrame([(0, "GARBAGE (1 2)")], "id long, wkt string")
    with pytest.raises(Exception, match="unsupported WKT type"):
        from_wkt(bad).collect()


def test_strict_raises_on_malformed_body(spark):
    """Supported type with a malformed/absent body must raise in strict
    mode (module contract: 'malformed text raises') — not emit a
    kind-with-empty-coords row that breaks the engine downstream."""
    for txt in ("POINT EMPTY", "LINESTRING (0 0, 1)", "POINT (1 2, 3 4)",
                "POLYGON", "LINESTRING"):
        bad = spark.createDataFrame([(0, txt)], "id long, wkt string")
        with pytest.raises(Exception, match="malformed WKT body"):
            from_wkt(bad).collect()


def test_permissive_nulls_malformed_body(spark):
    bad = spark.createDataFrame(
        [(0, "POINT EMPTY"), (1, "LINESTRING (0 0, 1)"),
         (2, "POINT (1 2, 3 4)"), (3, "POINT (3 4)")],
        "id long, wkt string",
    )
    got = {r.id: r.kind for r in from_wkt(bad, permissive=True).collect()}
    assert got == {0: None, 1: None, 2: None, 3: 0}


def test_random_geometry_roundtrip_bit_exact(spark):
    """format -> parse must reproduce every coordinate double
    BIT-EXACTLY for random geometries of every kind (Java's
    shortest-roundtrip double formatting + ANSI cast back). One Spark
    job for the whole corpus."""
    import random

    rng = random.Random(95)

    def coord():
        # nasty magnitudes: subnormal-ish, huge, negative, e-notation
        return rng.choice([
            rng.uniform(-1e-7, 1e-7), rng.uniform(-1e9, 1e9),
            rng.uniform(-180, 180), rng.uniform(-1, 1) * 10 ** rng.randint(-12, 12),
        ])

    rows = []
    for _ in range(60):
        k = rng.choice([0, 1, 2, 3, 4, 5])
        if k == 0:
            rows.append((0, [coord(), coord()]))
        elif k == 1:
            rows.append((1, [coord() for _ in range(4)]))
        elif k == 2:
            rows.append((2, [coord() for _ in range(2 * rng.randint(3, 6))]))
        elif k == 3:
            ring = [coord() for _ in range(2 * rng.randint(3, 6))]
            if rng.random() < 0.5:
                hole = [coord() for _ in range(2 * rng.randint(3, 5))]
                rows.append((3, ring + hole, [0, len(ring) // 2 + 1]))
            else:
                rows.append((3, ring, [0]))
        elif k == 4:
            x1, x2 = sorted((coord(), coord()))
            y1, y2 = sorted((coord(), coord()))
            rows.append((4, [x1, y1, x2, y2]))
        else:
            rows.append((5, [coord() for _ in range(6)]))
    g = geoms_to_df(spark, rows)
    rt = from_wkt(to_wkt(g).select("id", "wkt"))
    orig = {r.id: (r.kind, list(r.coords), list(r.rings or []))
            for r in g.collect()}
    back = {r.id: (r.kind, list(r.coords), list(r.rings or []))
            for r in rt.collect()}
    for i, (kind, coords, rings) in orig.items():
        bk, bc, br = back[i]
        if kind in (4, 5):  # rect/triangle serialize as closed POLYGON
            assert bk == 3
            if kind == 4:
                x1, y1, x2, y2 = coords
                assert bc == [x1, y1, x2, y1, x2, y2, x1, y2, x1, y1]
            else:
                assert bc == coords + coords[:2]
        else:
            assert (bk, bc, br) == (kind, coords, rings), i


def test_plan_has_no_python_operator(spark):
    df = spark.createDataFrame([(0, "POINT (1 2)")], "id long, wkt string")
    plan = from_wkt(df)._jdf.queryExecution().toString()
    for op in ("MapInPandas", "MapInArrow", "FlatMapCoGroupsInPandas", "FlatMapCoGroupsInArrow", "BatchEvalPython"):
        assert op not in plan
