"""Kernel correctness: pinned reference unit cases, the reference's
regression corpus, and differential tests (vectorized kernels vs the
independent scalar implementation).

Reference contracts ported:
* unit cases /root/reference/src/lib.rs:464-526
* regression geometries /root/reference/proptest-regressions/*.txt
* proptest generator shapes /root/reference/src/proptests.rs:15-87
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spatialjoin import geom, kernels, scalar_ref
from spatialjoin.geom import (
    LINE,
    LINESTRING,
    POINT,
    POLYGON,
    RECT,
    TRIANGLE,
    GeomBatch,
    BadCoordinateValue,
    BadMaxDistance,
    LineStringTooSmall,
    PolygonExteriorTooSmall,
)
from spatialjoin.oracle import slow_prox_map, slow_spatial_join


def gb(rows):
    """rows: list of (kind, coords[, ring_offsets])"""
    kinds = [r[0] for r in rows]
    coords = [r[1] for r in rows]
    rings = [r[2] if len(r) > 2 else None for r in rows]
    return GeomBatch.from_lists(kinds, coords, rings)


def sref(rows):
    return [scalar_ref.make(r[0], r[1], r[2] if len(r) > 2 else None) for r in rows]


# ---------------------------------------------------------------------------
# pinned unit cases (src/lib.rs:464-526)
# ---------------------------------------------------------------------------


def test_simple_index_self():
    small = gb([(POINT, [1.0, 1.0])])
    big = gb([(POINT, [1.0, 1.0])])
    assert slow_prox_map(small, big, 4.0) == [(0, 0, 0.0)]


def test_self_spatial_join_pair():
    pts = gb([(POINT, [1.0, 1.0]), (POINT, [22.0, 22.0])])
    assert slow_spatial_join(pts, pts, "intersects") == [(0, 0), (1, 1)]


def test_simple_index_some_other():
    small = gb([(POINT, [1.0, 1.0])])
    big = gb([(POINT, [2.0, 1.0])])
    assert slow_prox_map(small, big, 4.0) == [(0, 0, 1.0)]


def test_simple_index_none():
    small = gb([(POINT, [1.0, 1.0])])
    big = gb([(POINT, [2.0, 1.0])])
    assert slow_prox_map(small, big, 0.5) == []


def test_contains_box():
    # README doc-test shape (src/lib.rs:122-156): outer rect contains inner
    small = gb([(RECT, [-1.0, -1.0, 1.0, 1.0])])
    big = gb([(RECT, [-0.5, -0.5, 0.5, 0.5])])
    assert slow_spatial_join(small, big, "contains") == [(0, 0)]
    assert slow_spatial_join(small, big, "within") == []
    assert slow_spatial_join(big, small, "within") == [(0, 0)]
    assert slow_spatial_join(small, big, "intersects") == [(0, 0)]


# ---------------------------------------------------------------------------
# validation parity (src/validation.rs, src/structs.rs:9-22)
# ---------------------------------------------------------------------------


def test_validation_nan_coord():
    with pytest.raises(BadCoordinateValue) as ei:
        gb([(POINT, [0.0, 0.0]), (POINT, [float("nan"), 1.0])])
    assert ei.value.position == 1


def test_validation_linestring_too_small():
    with pytest.raises(LineStringTooSmall) as ei:
        gb([(POINT, [0.0, 0.0]), (LINESTRING, [1.0, 1.0])])
    assert ei.value.position == 1


def test_validation_empty_linestring():
    # regression corpus: LineString([]) must raise, not crash
    with pytest.raises(LineStringTooSmall):
        gb([(LINESTRING, [])])


def test_validation_polygon_exterior_too_small():
    # geo::Polygon auto-closes the exterior before the >=3 check, so two
    # DISTINCT points close to 3 coords and pass; a single point or a
    # degenerate already-closed pair fails (src/validation.rs:90-105)
    with pytest.raises(PolygonExteriorTooSmall):
        gb([(POLYGON, [0.0, 0.0], [0])])
    with pytest.raises(PolygonExteriorTooSmall):
        gb([(POLYGON, [1.0, 1.0, 1.0, 1.0], [0])])
    gb([(POLYGON, [0.0, 0.0, 1.0, 1.0], [0])])  # closes to 3 coords: valid


def test_validation_bad_max_distance():
    with pytest.raises(BadMaxDistance):
        geom.validate_max_distance(-1.0)
    with pytest.raises(BadMaxDistance):
        geom.validate_max_distance(float("nan"))
    assert geom.validate_max_distance(0.0) == 0.0


# ---------------------------------------------------------------------------
# reference quirks
# ---------------------------------------------------------------------------


def test_point_point_exact_equality():
    a = gb([(POINT, [0.1 + 0.2, 0.0])])
    b = gb([(POINT, [0.3, 0.0])])
    # 0.1 + 0.2 != 0.3 in f64 -> no intersection (relates_impl.rs:415-417)
    assert slow_spatial_join(a, b, "intersects") == []


def test_degenerate_triangle_contains_only_equal_point():
    tri = gb([(TRIANGLE, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0])])
    hit = gb([(POINT, [1.0, 1.0])])
    miss = gb([(POINT, [1.0, 1.0000001])])
    assert slow_spatial_join(tri, hit, "intersects") == [(0, 0)]
    assert slow_spatial_join(tri, miss, "intersects") == []


def test_triangle_polygon_hole_quirk():
    """relates_impl.rs:359-367 (PAIRWISE truth table): because
    LineString.Contains(Triangle) is constant false, ANY triangle
    'intersects' ANY holed polygon (even one sitting inside a hole),
    and a triangle strictly inside a hole-less polygon does NOT
    intersect it.
    The JOIN, however, never sees disjoint-bbox pairs (the reference's
    R-tree probe gates them; see oracle.slow_spatial_join docstring)."""
    import numpy as np

    far_tri = [(TRIANGLE, [100.0, 100.0, 101.0, 100.0, 100.0, 101.0])]
    square = [0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0]
    hole = [4.0, 4.0, 6.0, 4.0, 6.0, 6.0, 4.0, 6.0]
    holed = [(POLYGON, square + hole, [0, 4])]
    plain = [(POLYGON, square, [0])]
    z = np.zeros(1, dtype=np.int64)
    # pairwise kernel: the verbatim quirk
    assert kernels.intersects(gb(far_tri), z, gb(holed), z)[0]
    assert not kernels.intersects(gb([(TRIANGLE, [1.0, 1.0, 2.0, 1.0, 1.0, 2.0])]), z,
                                  gb(plain), z)[0]
    # join semantics: bbox gate removes the unreachable disjoint pair
    assert slow_spatial_join(gb(far_tri), gb(holed), "intersects") == []
    # overlapping-bbox quirk pair IS emitted by the join
    near_tri = [(TRIANGLE, [4.5, 4.5, 5.5, 4.5, 4.5, 5.5])]  # inside the hole region-ish
    assert slow_spatial_join(gb(near_tri), gb(holed), "intersects") == [(0, 0)]
    inner_tri = [(TRIANGLE, [1.0, 1.0, 2.0, 1.0, 1.0, 2.0])]
    assert slow_spatial_join(gb(inner_tri), gb(plain), "intersects") == []
    # scalar ref must agree with the pairwise quirk in both orders
    assert scalar_ref.intersects(sref(far_tri)[0], sref(holed)[0])
    assert scalar_ref.intersects(sref(holed)[0], sref(far_tri)[0])
    assert not scalar_ref.intersects(sref(inner_tri)[0], sref(plain)[0])


def test_polygon_contains_is_boundary_exclusive_rect_inclusive():
    sq = [(POLYGON, [0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 2.0], [0])]
    on_edge = [(POINT, [1.0, 0.0])]
    inside = [(POINT, [1.0, 1.0])]
    assert slow_spatial_join(gb(sq), gb(on_edge), "contains") == []
    assert slow_spatial_join(gb(sq), gb(inside), "contains") == [(0, 0)]
    r = [(RECT, [0.0, 0.0, 2.0, 2.0])]
    assert slow_spatial_join(gb(r), gb(on_edge), "contains") == [(0, 0)]


def _contains_pair(container, operand):
    """(kernel result, scalar_ref result) for one (container, operand)."""
    A = gb([container])
    B = gb([operand])
    i = np.zeros(1, dtype=np.int64)
    k = bool(kernels.contains(A, i, B, i)[0])
    s = scalar_ref.contains(sref([container])[0], sref([operand])[0])
    assert k == s, "kernel and scalar_ref disagree"
    return k


# concave "U": deep notch from the top edge down to y=2 between x=4..6
U_NOTCH = (
    POLYGON,
    [0, 0, 10, 0, 10, 10, 6, 10, 5, 2, 4, 10, 0, 10, 0, 0],
    [0],
)
# 10x10 square with a centered 2x2 hole
HOLED = (
    POLYGON,
    [0, 0, 10, 0, 10, 10, 0, 10, 0, 0, 4, 4, 6, 4, 6, 6, 4, 6, 4, 4],
    [0, 5],
)


def test_polygon_contains_rejects_ring_crossing_segments():
    """geo 0.14 (reference delegation): a segment with both endpoints
    strictly inside but crossing the exterior (concave notch) or a hole
    ring is NOT contained — the vertex rule alone is insufficient."""
    span = [2.0, 5.0, 8.0, 5.0]  # crosses the notch / the hole
    inside = [1.0, 5.0, 2.0, 5.0]  # fully within the left lobe / solid
    assert not _contains_pair(U_NOTCH, (LINE, span))
    assert _contains_pair(U_NOTCH, (LINE, inside))
    assert not _contains_pair(HOLED, (LINE, span))
    assert not _contains_pair(HOLED, (LINESTRING, span))
    assert not _contains_pair(U_NOTCH, (RECT, [2, 4, 8, 6]))
    assert _contains_pair(U_NOTCH, (RECT, [1, 4, 3, 6]))
    assert not _contains_pair(
        U_NOTCH, (POLYGON, [2, 5, 5, 4, 8, 5, 5, 6, 2, 5], [0])
    )
    assert _contains_pair(U_NOTCH, (POLYGON, [1, 5, 2, 4, 3, 5, 2, 6, 1, 5], [0]))
    # triangle operands keep the vertices-only rule (relates_impl.rs:394-399):
    # a notch-spanning triangle with all vertices inside IS "contained"
    assert _contains_pair(U_NOTCH, (TRIANGLE, [2, 5, 8, 5, 5, 1]))


def test_polygon_contains_linestring_exterior_asymmetry():
    """geo 0.14 quirk pinned verbatim: the LineString operand is only
    checked against HOLE rings, so a notch-crossing LineString with all
    vertices inside IS contained (unlike the Line operand)."""
    span = [2.0, 5.0, 8.0, 5.0]
    assert _contains_pair(U_NOTCH, (LINESTRING, span))
    assert not _contains_pair(U_NOTCH, (LINE, span))


def test_deviation_point_on_linestring_endpoint():
    """DELIBERATE deviation (kernels.py docstring): a point on a
    LineString's terminal vertex counts as intersecting (geo 0.14
    excludes the two endpoints). Pinned so it stays deliberate."""
    A = gb([(POINT, [0.0, 0.0])])
    B = gb([(LINESTRING, [0.0, 0.0, 1.0, 0.0, 2.0, 1.0])])
    i = np.zeros(1, dtype=np.int64)
    assert bool(kernels.intersects(A, i, B, i)[0])
    assert scalar_ref.intersects(
        scalar_ref.make(POINT, [0.0, 0.0]),
        scalar_ref.make(LINESTRING, [0.0, 0.0, 1.0, 0.0, 2.0, 1.0]),
    )


def test_deviation_ls_contains_line_single_segment():
    """DELIBERATE deviation (kernels.py docstring): LineString contains
    Line only when one segment covers both endpoints — a line spanning
    two collinear segments is NOT contained (geo 0.14 accepts it)."""
    ls = (LINESTRING, [0.0, 0.0, 1.0, 0.0, 2.0, 0.0])
    spanning = (LINE, [0.5, 0.0, 1.5, 0.0])
    within_one = (LINE, [0.2, 0.0, 0.8, 0.0])
    assert not _contains_pair(ls, spanning)
    assert _contains_pair(ls, within_one)


def test_point_in_holed_polygon():
    square = [0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0]
    hole = [4.0, 4.0, 6.0, 4.0, 6.0, 6.0, 4.0, 6.0]
    holed = gb([(POLYGON, square + hole, [0, 4])])
    in_hole = gb([(POINT, [5.0, 5.0])])
    in_meat = gb([(POINT, [2.0, 2.0])])
    assert slow_spatial_join(holed, in_hole, "contains") == []
    assert slow_spatial_join(holed, in_meat, "contains") == [(0, 0)]
    # distance from the hole-dweller is 0? No: polygon-point distance is
    # min over ALL rings when not contained -> distance to hole ring = 1.0
    assert slow_prox_map(holed, in_hole, 2.0) == [(0, 0, 1.0)]


# ---------------------------------------------------------------------------
# regression corpus (proptest-regressions/*.txt), as kernel-vs-scalar checks
# ---------------------------------------------------------------------------

SLIVER_POLY = (
    POLYGON,
    [1e-6, 0.0, 7.071067811865476e-7, 7.071067811865475e-7, 6.123233995736766e-23, 1e-6],
    [0],
)
DEGEN_POLY = (POLYGON, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0], [0])
REG_PAIRS = [
    # lib.txt seed: degenerate zero-area polygon at origin vs origin point
    (DEGEN_POLY, (POINT, [0.0, 0.0])),
    # proptests.txt: sliver polygon vs 1-pt/empty linestrings raise; use valid 2pt
    (SLIVER_POLY, (LINESTRING, [0.0, 0.0, 0.0, 0.0])),
    # polygon vs rect distance case
    (
        (
            POLYGON,
            [
                0.2830489625756334, 0.0,
                0.2520571956822212, 0.09538285075582777,
                0.1709196965838543, 0.1543326944667879,
                0.07062823217394498, 0.15433269446678793,
            ],
            [0],
        ),
        (RECT, [0.3051777447381212, 0.19669725667687643, 0.4213073259271589, 1.1928087604867796]),
    ),
    # line vs 12-gon case
    (
        (LINE, [0.0, 0.0, -0.16371620275753784, 0.6927014516964842]),
        (
            POLYGON,
            [
                0.16819167902313092, 0.9630196581794301,
                0.15759414274018685, 1.0502982217616563,
                0.1264174241796423, 1.132504472473154,
                0.07647340090147503, 1.2048608818301343,
                0.010664637999474147, 1.2631623583256162,
                -0.06718429843161658, 1.304020632062927,
                -0.15254911117579234, 1.3250611686862364,
                -0.24046870760483086, 1.3250611686862364,
                -0.32583352034900664, 1.304020632062927,
                -0.4036824567800973, 1.2631623583256164,
                -0.46949121968209834, 1.2048608818301343,
                -0.5194352429602654, 1.1325044724731543,
            ],
            [0],
        ),
    ),
    # pentagon vs line case
    (
        (
            POLYGON,
            [
                1.187921045169523, 0.13548520119881102,
                0.9859597198710358, 0.4852924777797367,
                0.5820370692740611, 0.4852924777797368,
                0.3800757439755737, 0.13548520119881108,
                0.5820370692740608, -0.21432207538211462,
            ],
            [0],
        ),
        (LINE, [-0.33977562454670807, 0.0, 0.49486139442294563, 0.438739662450339]),
    ),
    # rect vs triangle-fan polygon case
    (
        (RECT, [-0.17084137691985102, 0.09858870312437906, 0.45257457282855895, 0.8748085493016657]),
        (
            POLYGON,
            [
                -0.10781391405721802, -0.15433610862574643,
                -0.7855276236615211, 0.23694208404779793,
                -0.7855276236615214, -0.5456143012992907,
            ],
            [0],
        ),
    ),
]

ALL_DEGENERATE = [
    (POINT, [0.0, 0.0]),
    (TRIANGLE, [0.0] * 6),
    (POINT, [0.0, 0.0]),
    (RECT, [0.0] * 4),
    (RECT, [0.0] * 4),
    (TRIANGLE, [0.0] * 6),
    (RECT, [0.0] * 4),
    (POINT, [0.0, 0.0]),
]


def _check_pair_agreement(rows_a, rows_b):
    A, B = gb(rows_a), gb(rows_b)
    SA, SB = sref(rows_a), sref(rows_b)
    n_a, n_b = len(rows_a), len(rows_b)
    ai = np.repeat(np.arange(n_a), n_b)
    bi = np.tile(np.arange(n_b), n_a)
    k_int = kernels.intersects(A, ai, B, bi)
    k_con = kernels.contains(A, ai, B, bi)
    k_within = kernels.contains(B, bi, A, ai)
    k_dst = kernels.distance(A, ai, B, bi)
    for r, (i, j) in enumerate(zip(ai.tolist(), bi.tolist())):
        assert k_int[r] == scalar_ref.intersects(SA[i], SB[j]), (rows_a[i], rows_b[j], "int")
        assert k_con[r] == scalar_ref.contains(SA[i], SB[j]), (rows_a[i], rows_b[j], "con")
        assert k_within[r] == scalar_ref.contains(SB[j], SA[i]), (rows_a[i], rows_b[j], "win")
        sd = scalar_ref.distance(SA[i], SB[j])
        assert math.isclose(k_dst[r], sd, rel_tol=1e-12, abs_tol=1e-15), (
            rows_a[i], rows_b[j], k_dst[r], sd,
        )


def test_regression_corpus_agreement():
    for a, b in REG_PAIRS:
        _check_pair_agreement([a], [b])
        _check_pair_agreement([b], [a])


def test_all_degenerate_sequence():
    _check_pair_agreement(ALL_DEGENERATE, ALL_DEGENERATE)


# ---------------------------------------------------------------------------
# hypothesis differential tests mirroring proptests.rs:15-87 generators
# ---------------------------------------------------------------------------

coord = st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=64)


@st.composite
def geometry(draw):
    kind = draw(st.sampled_from([POINT, LINE, LINESTRING, POLYGON, RECT, TRIANGLE]))
    if kind == POINT:
        return (POINT, [draw(coord), draw(coord)])
    if kind == LINE:
        return (LINE, [draw(coord) for _ in range(4)])
    if kind == LINESTRING:
        npts = draw(st.integers(min_value=2, max_value=8))
        return (LINESTRING, [draw(coord) for _ in range(2 * npts)])
    if kind == RECT:
        x1, y1, x2, y2 = (draw(coord) for _ in range(4))
        return (RECT, [min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2)])
    if kind == TRIANGLE:
        return (TRIANGLE, [draw(coord) for _ in range(6)])
    # regular polygon approximation (proptests.rs:50-67)
    nv = draw(st.integers(min_value=3, max_value=10))
    radius = draw(st.floats(min_value=1e-6, max_value=0.5))
    cx, cy = draw(coord), draw(coord)
    pts = []
    for i in range(nv):
        ang = 2.0 * math.pi * i / nv
        pts += [cx + radius * math.cos(ang), cy + radius * math.sin(ang)]
    if draw(st.booleans()):
        # punch a centered hole at half radius (extends the reference
        # corpus: its generator is hole-less, but holes are in-contract)
        hole = []
        for i in range(nv):
            ang = 2.0 * math.pi * i / nv
            hole += [cx + 0.5 * radius * math.cos(ang), cy + 0.5 * radius * math.sin(ang)]
        return (POLYGON, pts + hole, [0, nv])
    return (POLYGON, pts, [0])


@settings(max_examples=150, deadline=None)
@given(st.lists(geometry(), min_size=1, max_size=5), st.lists(geometry(), min_size=1, max_size=5))
def test_vectorized_matches_scalar(rows_a, rows_b):
    _check_pair_agreement(rows_a, rows_b)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(geometry(), min_size=1, max_size=6),
    st.lists(geometry(), min_size=1, max_size=6),
    st.floats(min_value=0.0, max_value=4.0),
)
def test_prox_map_matches_scalar(rows_a, rows_b, max_d):
    A, B = gb(rows_a), gb(rows_b)
    got = slow_prox_map(A, B, max_d)
    SA, SB = sref(rows_a), sref(rows_b)
    want = sorted(
        (j, i, scalar_ref.distance(SA[i], SB[j]))
        for i in range(len(SA))
        for j in range(len(SB))
        if scalar_ref.distance(SA[i], SB[j]) <= max_d
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert math.isclose(g[2], w[2], rel_tol=1e-12, abs_tol=1e-15)


def test_geombatch_from_arrow_matches_from_columns():
    """The applyInArrow fast constructor must produce the identical
    pooled layout as from_columns for every kind, including polygons
    with holes and the implied-[0]-exterior fallback."""
    import pyarrow as pa

    from spatialjoin.geom import GeomBatch

    kinds = [0, 1, 2, 3, 3, 4, 5, 3]
    coords = [
        [1.0, 2.0],
        [0.0, 0.0, 3.0, 4.0],
        [0.0, 0.0, 1.0, 1.0, 2.0, 0.0],
        # closed square
        [0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 0.0, 0.0],
        # closed square + closed hole
        [0.0, 0.0, 8.0, 0.0, 8.0, 8.0, 0.0, 8.0, 0.0, 0.0,
         2.0, 2.0, 3.0, 2.0, 3.0, 3.0, 2.0, 3.0, 2.0, 2.0],
        [1.0, 2.0, 4.0, 6.0],
        [0.0, 0.0, 4.0, 0.0, 0.0, 3.0],
        # polygon with EMPTY rings array (implied [0] exterior)
        [0.0, 0.0, 2.0, 0.0, 1.0, 2.0, 0.0, 0.0],
    ]
    rings = [[], [], [], [0], [0, 5], [], [], []]
    a = GeomBatch.from_arrow(
        np.asarray(kinds, dtype=np.int8),
        pa.array(coords, type=pa.list_(pa.float64())),
        pa.array(rings, type=pa.list_(pa.int32())),
    )
    b = GeomBatch.from_columns(
        np.asarray(kinds, dtype=np.int8),
        [np.asarray(c) for c in coords],
        [r if r else None for r in rings],
    )
    for f in ("kind", "offs", "xs", "ys", "ring_counts", "ring_starts"):
        assert (getattr(a, f) == getattr(b, f)).all(), f
    # sliced arrays (non-zero arrow offset) must decode identically
    ca = pa.array(coords, type=pa.list_(pa.float64())).slice(2)
    ra = pa.array(rings, type=pa.list_(pa.int32())).slice(2)
    s = GeomBatch.from_arrow(np.asarray(kinds[2:], dtype=np.int8), ca, ra)
    s2 = GeomBatch.from_columns(
        np.asarray(kinds[2:], dtype=np.int8),
        [np.asarray(c) for c in coords[2:]],
        [r if r else None for r in rings[2:]],
    )
    for f in ("kind", "offs", "xs", "ys", "ring_counts", "ring_starts"):
        assert (getattr(s, f) == getattr(s2, f)).all(), f


def test_geombatch_from_arrow_ignores_rings_on_non_polygons():
    """Contract-violating input: a NON-polygon row carrying a non-empty
    rings array. from_columns ignores rings on non-polygon rows; the
    vectorized from_arrow branch must mask identically, or hole checks
    (ring_counts[i] > 1) flip on the bad row (ADVICE r4)."""
    import pyarrow as pa

    from spatialjoin.geom import GeomBatch

    kinds = [1, 3, 0]  # LINE carrying rings, polygon, point carrying rings
    coords = [
        [0.0, 0.0, 3.0, 4.0],
        [0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 0.0, 0.0],
        [1.0, 2.0],
    ]
    rings = [[0, 1], [0], [0, 1, 2]]  # only row 1's rings are legitimate
    a = GeomBatch.from_arrow(
        np.asarray(kinds, dtype=np.int8),
        pa.array(coords, type=pa.list_(pa.float64())),
        pa.array(rings, type=pa.list_(pa.int32())),
    )
    b = GeomBatch.from_columns(
        np.asarray(kinds, dtype=np.int8),
        [np.asarray(c) for c in coords],
        [rings[0], rings[1], rings[2]],
    )
    assert (a.ring_counts == np.array([0, 1, 0], dtype=np.int32)).all()
    for f in ("kind", "offs", "xs", "ys", "ring_counts", "ring_starts"):
        assert (getattr(a, f) == getattr(b, f)).all(), f


def test_poly_poly_intersects_closed_semantics():
    """POLYGON x POLYGON intersects (kernels._int_poly_poly): closed
    semantics — vertex touching counts, containment with no edge
    crossing counts, disjoint stays out. Pins the kernel cell behind
    the quads_intersect_quads driver row."""
    from spatialjoin.geom import GeomBatch, POLYGON
    from spatialjoin.oracle import slow_spatial_join

    def rh(cx, cy, a, b):
        out = []
        for x, y in [(cx + a, cy), (cx, cy + b), (cx - a, cy),
                     (cx, cy - b), (cx + a, cy)]:
            out += [x, y]
        return out

    coords = [rh(0, 0, 1, 1),       # 0
              rh(2, 0, 1, 1),       # 1: touches 0 at exactly (1, 0)
              rh(0, 0, 0.2, 0.2),   # 2: strictly inside 0, no edge cross
              rh(5, 5, 1, 1),       # 3: disjoint from all
              rh(0.5, 0, 1, 1)]     # 4: proper edge-crossing overlap of 0
    gb = GeomBatch.from_lists([POLYGON] * 5, coords, [[0]] * 5)
    got = sorted(set(map(tuple, slow_spatial_join(gb, gb, "intersects"))))
    expect = sorted({(i, i) for i in range(5)}
                    | {(0, 1), (1, 0), (0, 2), (2, 0), (0, 4), (4, 0),
                       (1, 4), (4, 1), (2, 4), (4, 2)})
    assert got == expect
