"""WKB codec: roundtrips, standard-vector interop, wkt.py agreement,
strict/permissive malformed handling."""

from __future__ import annotations

import random
import struct

import pytest

from spatialjoin.geom import LINE, LINESTRING, POINT, POLYGON, RECT, TRIANGLE
from spatialjoin.sparkutil import geoms_to_df
from spatialjoin.wkb import from_wkb, to_wkb


def _random_rows(rng, n):
    rows = []
    for _ in range(n):
        k = rng.choice([POINT, LINE, LINESTRING, POLYGON, RECT, TRIANGLE])
        c = lambda: rng.uniform(-100, 100)
        if k == POINT:
            rows.append((POINT, [c(), c()]))
        elif k == LINE:
            rows.append((LINE, [c(), c(), c(), c()]))
        elif k == LINESTRING:
            m = rng.randint(3, 8)
            rows.append((LINESTRING, [c() for _ in range(2 * m)]))
        elif k == RECT:
            xs, ys = sorted((c(), c())), sorted((c(), c()))
            rows.append((RECT, [xs[0], ys[0], xs[1], ys[1]]))
        elif k == TRIANGLE:
            rows.append((TRIANGLE, [c() for _ in range(6)]))
        else:
            # two-ring polygon (outer + hole), both closed
            cx, cy = c() / 10, c() / 10
            outer = [cx - 2, cy - 2, cx + 2, cy - 2, cx + 2, cy + 2,
                     cx - 2, cy + 2, cx - 2, cy - 2]
            hole = [cx - 1, cy - 1, cx + 1, cy - 1, cx, cy + 1, cx - 1, cy - 1]
            rows.append((POLYGON, outer + hole, [0, 5]))
    return rows


def test_wkb_roundtrip_bit_exact(spark):
    rng = random.Random(42)
    rows = _random_rows(rng, 80)
    df = geoms_to_df(spark, rows)
    back = {r.id: r for r in from_wkb(to_wkb(df)).collect()}
    for i, row in enumerate(rows):
        kind, coords = row[0], row[1]
        g = back[i]
        if kind in (POINT, LINE, LINESTRING):
            assert g.kind == kind and list(g.coords) == coords
        elif kind == POLYGON:
            assert g.kind == POLYGON and list(g.coords) == coords
            assert list(g.rings) == list(row[2])
        elif kind == RECT:
            x0, y0, x1, y1 = coords
            assert g.kind == POLYGON
            assert list(g.coords) == [x0, y0, x1, y0, x1, y1, x0, y1, x0, y0]
        else:  # TRIANGLE -> closed 4-point polygon ring
            assert g.kind == POLYGON
            assert list(g.coords) == coords + coords[:2]


def test_wkb_standard_vectors(spark):
    """Interop with the public WKB spec: pinned little-endian bytes for
    POINT (1 2), and a big-endian point parses too."""
    le = bytes.fromhex("0101000000") + struct.pack("<2d", 1.0, 2.0)
    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 3.0, 4.0)
    df = spark.createDataFrame([(0, le), (1, be)], "id long, wkb binary")
    got = {r.id: r for r in from_wkb(df).collect()}
    assert got[0].kind == POINT and list(got[0].coords) == [1.0, 2.0]
    assert got[1].kind == POINT and list(got[1].coords) == [3.0, 4.0]
    # and our writer emits exactly the spec bytes for a point
    out = to_wkb(geoms_to_df(spark, [(POINT, [1.0, 2.0])])).collect()[0].wkb
    assert bytes(out) == le


def test_wkb_agrees_with_wkt(spark):
    """Same geometry contract out of both codecs for the shared kinds."""
    from pyspark.sql import functions as F

    from spatialjoin.wkt import from_wkt, to_wkt

    rng = random.Random(7)
    rows = [r for r in _random_rows(rng, 60)
            if r[0] in (POINT, LINE, LINESTRING, POLYGON)]
    df = geoms_to_df(spark, rows)
    a = {r.id: r for r in from_wkb(to_wkb(df)).collect()}
    b = {r.id: r for r in
         from_wkt(to_wkt(df).drop("kind", "coords", "rings")).collect()}
    assert set(a) == set(b)
    for i in a:
        assert a[i].kind == b[i].kind
        assert list(a[i].coords) == list(b[i].coords)
        ra = list(a[i].rings) if a[i].rings is not None else None
        rb = list(b[i].rings) if b[i].rings is not None else None
        assert ra == rb


def test_wkb_malformed_strict_and_permissive(spark):
    good = bytes.fromhex("0101000000") + struct.pack("<2d", 1.0, 2.0)
    bad = [b"\x07\x00\x00\x00", good[:9], b"", b"\x01" + struct.pack("<I", 99)]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate([good] + bad)], "id long, wkb binary")
    out = from_wkb(df, permissive=True).collect()
    by_id = {r.id: r.kind for r in out}
    assert by_id[0] == POINT and all(by_id[i] is None for i in range(1, 5))
    with pytest.raises(Exception):
        from_wkb(df).collect()
