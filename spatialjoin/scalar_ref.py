"""Scalar (per-pair, pure-Python) reference implementation of the kernel
spec — independent code path used ONLY in tests to differentially test
the vectorized kernels in ``kernels.py`` (vectorization bugs are the
main risk; this module shares no code with the fast path).

Spec source: /root/reference/src/relates_impl.rs (see kernels.py
docstring for the replicated quirks). Geometries here are plain tuples
``(kind, pts, rings)`` where pts = [(x, y), ...] and rings (polygons
only) = list of closed rings, each a list of (x, y).
"""

from __future__ import annotations

import math

from .geom import LINE, LINESTRING, POINT, POLYGON, RECT, TRIANGLE


def make(kind, coords, ring_offsets=None):
    pts = [(coords[i], coords[i + 1]) for i in range(0, len(coords), 2)]
    rings = None
    if kind == POLYGON:
        ro = list(ring_offsets or [0])
        ends = ro[1:] + [len(pts)]
        rings = []
        for s, e in zip(ro, ends):
            r = pts[s:e]
            if r and r[0] != r[-1]:
                r = r + [r[0]]
            rings.append(r)
        pts = [p for r in rings for p in r]
    return (kind, pts, rings)


# -- primitives --------------------------------------------------------------


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _on_seg(a, b, p):
    if _cross(a, b, p) != 0.0:
        return False
    return (
        min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
        and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
    )


def _segs_intersect(a1, a2, b1, b2):
    d1 = _cross(b1, b2, a1)
    d2 = _cross(b1, b2, a2)
    d3 = _cross(a1, a2, b1)
    d4 = _cross(a1, a2, b2)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    ):
        return True
    if d1 == 0 and _on_seg(b1, b2, a1):
        return True
    if d2 == 0 and _on_seg(b1, b2, a2):
        return True
    if d3 == 0 and _on_seg(a1, a2, b1):
        return True
    if d4 == 0 and _on_seg(a1, a2, b2):
        return True
    return False


def _pt_seg_d2(a, b, p):
    dx, dy = b[0] - a[0], b[1] - a[1]
    l2 = dx * dx + dy * dy
    if l2 == 0.0:
        ex, ey = p[0] - a[0], p[1] - a[1]
        return ex * ex + ey * ey
    t = ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / l2
    t = max(0.0, min(1.0, t))
    cx, cy = a[0] + t * dx, a[1] + t * dy
    ex, ey = p[0] - cx, p[1] - cy
    return ex * ex + ey * ey


def _seg_seg_d2(a1, a2, b1, b2):
    if _segs_intersect(a1, a2, b1, b2):
        return 0.0
    return min(
        _pt_seg_d2(a1, a2, b1),
        _pt_seg_d2(a1, a2, b2),
        _pt_seg_d2(b1, b2, a1),
        _pt_seg_d2(b1, b2, a2),
    )


def _rect_mm(g):
    (x1, y1), (x2, y2) = g[1][0], g[1][1]
    return min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2)


def _segments(g, rings="all"):
    kind, pts, rr = g
    if kind == POINT:
        return []
    if kind in (LINE, LINESTRING):
        return list(zip(pts[:-1], pts[1:]))
    if kind == RECT:
        xmin, ymin, xmax, ymax = _rect_mm(g)
        c = [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)]
        return [(c[i], c[(i + 1) % 4]) for i in range(4)]
    if kind == TRIANGLE:
        return [(pts[i], pts[(i + 1) % 3]) for i in range(3)]
    sel = rr if rings == "all" else ([rr[0]] if rings == "exterior" else rr[1:])
    out = []
    for r in sel:
        out.extend(zip(r[:-1], r[1:]))
    return out


def _vertices(g):
    kind, pts, rr = g
    if kind == RECT:
        xmin, ymin, xmax, ymax = _rect_mm(g)
        return [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)]
    if kind == POLYGON:
        return list(rr[0])
    return list(pts)


def _pt_in_rect(g, p):
    xmin, ymin, xmax, ymax = _rect_mm(g)
    return xmin <= p[0] <= xmax and ymin <= p[1] <= ymax


def _pt_in_tri(g, p):
    a, b, c = g[1][0], g[1][1], g[1][2]
    if a == b == c:
        return p == a
    d1 = _cross(a, b, p)
    d2 = _cross(b, c, p)
    d3 = _cross(c, a, p)
    has_neg = d1 < 0 or d2 < 0 or d3 < 0
    has_pos = d1 > 0 or d2 > 0 or d3 > 0
    return not (has_neg and has_pos)


def _ring_state(ring, p):
    """(odd_crossings, on_boundary) for one closed ring."""
    cnt = 0
    onb = False
    for a, b in zip(ring[:-1], ring[1:]):
        if _on_seg(a, b, p):
            onb = True
        if (a[1] > p[1]) != (b[1] > p[1]):
            xint = (b[0] - a[0]) * (p[1] - a[1]) / (b[1] - a[1]) + a[0]
            if p[0] < xint:
                cnt += 1
    return cnt % 2 == 1, onb


def _pt_in_poly_strict(g, p):
    inside, onb = _ring_state(g[2][0], p)
    if not inside or onb:
        return False
    for hole in g[2][1:]:
        h_in, h_onb = _ring_state(hole, p)
        if h_in or h_onb:
            return False
    return True


def _pt_contained(g, p):
    k = g[0]
    if k == RECT:
        return _pt_in_rect(g, p)
    if k == TRIANGLE:
        return _pt_in_tri(g, p)
    return _pt_in_poly_strict(g, p)


# -- intersects ---------------------------------------------------------------


def intersects(a, b):
    ka, kb = a[0], b[0]
    if ka > kb:
        return intersects(b, a)
    if ka == POINT:
        p = a[1][0]
        if kb == POINT:
            return p == b[1][0]
        if kb in (LINE, LINESTRING):
            return any(_on_seg(s, e, p) for s, e in _segments(b))
        if kb == POLYGON:
            return _pt_in_poly_strict(b, p)
        if kb == RECT:
            return _pt_in_rect(b, p)
        return _pt_in_tri(b, p)
    if ka in (LINE, LINESTRING) and kb in (LINE, LINESTRING):
        return any(
            _segs_intersect(s1, e1, s2, e2)
            for s1, e1 in _segments(a)
            for s2, e2 in _segments(b)
        )
    # triangle-polygon quirk (relates_impl.rs:359-367); after the ka<=kb
    # canonicalization the polygon is `a` and the triangle is `b`
    if ka == POLYGON and kb == TRIANGLE:
        tri, poly = b, a
        ext = poly[2][0]
        ext_segs = list(zip(ext[:-1], ext[1:]))
        crossing = any(
            _segs_intersect(s1, e1, s2, e2) for s1, e1 in _segments(tri) for s2, e2 in ext_segs
        )
        any_vert = any(_pt_in_tri(tri, v) for v in ext)
        return crossing or any_vert or len(poly[2]) > 1
    if ka == RECT and kb == RECT:
        a0, a1_, a2, a3 = _rect_mm(a)
        b0, b1_, b2, b3 = _rect_mm(b)
        return a0 <= b2 and a2 >= b0 and a1_ <= b3 and a3 >= b1_
    # generic: segments cross OR any vertex of one inside the other (area kinds)
    if any(
        _segs_intersect(s1, e1, s2, e2) for s1, e1 in _segments(a) for s2, e2 in _segments(b)
    ):
        return True
    if kb in (RECT, TRIANGLE, POLYGON) and any(_pt_contained(b, v) for v in _vertices(a)):
        return True
    if ka in (RECT, TRIANGLE, POLYGON) and any(_pt_contained(a, v) for v in _vertices(b)):
        return True
    return False


# -- contains -----------------------------------------------------------------


def contains(a, b):
    ka, kb = a[0], b[0]
    if ka == POINT:
        return kb == POINT and a[1][0] == b[1][0]
    if ka == LINE:
        s, e = a[1][0], a[1][1]
        if kb in (POINT, LINE, LINESTRING):
            return all(_on_seg(s, e, p) for p in b[1])
        return False
    if ka == LINESTRING:
        if kb == POINT:
            return any(_on_seg(s, e, b[1][0]) for s, e in _segments(a))
        if kb in (LINE, LINESTRING):
            return all(
                any(_on_seg(s, e, bs) and _on_seg(s, e, be) for s, e in _segments(a))
                for bs, be in _segments(b)
            )
        return False
    # area kinds: all defining vertices of b contained ...
    if not all(_pt_contained(a, v) for v in _vertices(b)):
        return False
    # ... PLUS, for POLYGON containers with segment-bearing operands,
    # geo 0.14's ring-crossing rejection (kernels._con_poly_seg_reject
    # documents the delegation and the LineString asymmetry). The
    # polygon operand contributes its EXTERIOR segments only.
    if ka == POLYGON and kb in (LINE, LINESTRING, RECT, POLYGON):
        segs_b = _segments(b, "exterior") if kb == POLYGON else _segments(b)
        check = _segments(a, "holes")
        if kb != LINESTRING:  # LineString: hole rings only (geo 0.14)
            check = check + _segments(a, "exterior")
        if any(
            _segs_intersect(s1, e1, s2, e2)
            for s1, e1 in check
            for s2, e2 in segs_b
        ):
            return False
    return True


# -- distance -----------------------------------------------------------------


def distance(a, b):
    ka, kb = a[0], b[0]
    if ka > kb:
        return distance(b, a)
    if ka == POINT and kb == POINT:
        dx = a[1][0][0] - b[1][0][0]
        dy = a[1][0][1] - b[1][0][1]
        return math.sqrt(dx * dx + dy * dy)
    if ka == POINT:
        p = a[1][0]
        if kb in (LINE, LINESTRING):
            return math.sqrt(min(_pt_seg_d2(s, e, p) for s, e in _segments(b)))
        if _pt_contained(b, p):
            return 0.0
        return math.sqrt(min(_pt_seg_d2(s, e, p) for s, e in _segments(b)))
    if ka in (LINE, LINESTRING) and kb in (LINE, LINESTRING):
        return math.sqrt(
            min(
                _seg_seg_d2(s1, e1, s2, e2)
                for s1, e1 in _segments(a)
                for s2, e2 in _segments(b)
            )
        )
    if kb == POLYGON and ka in (LINE, LINESTRING):
        if intersects(a, b):
            return 0.0
        in_ext, onb = _ring_state(b[2][0], a[1][0])
        rings = "holes" if (len(b[2]) > 1 and (in_ext or onb)) else "exterior"
        return math.sqrt(
            min(
                _seg_seg_d2(s1, e1, s2, e2)
                for s1, e1 in _segments(a)
                for s2, e2 in _segments(b, rings)
            )
        )
    if ka == POLYGON and kb in (RECT, TRIANGLE):
        shape, poly = b, a
        ext = poly[2][0]
        ext_segs = list(zip(ext[:-1], ext[1:]))
        shape_ext = any(
            _segs_intersect(s1, e1, s2, e2)
            for s1, e1 in _segments(shape)
            for s2, e2 in ext_segs
        ) or any(_pt_contained(shape, v) for v in ext)
        corner_in = any(_pt_in_poly_strict(poly, v) for v in _vertices(shape))
        hole_cross = any(
            _segs_intersect(s1, e1, s2, e2)
            for s1, e1 in _segments(shape)
            for s2, e2 in _segments(poly, "holes")
        )
        if shape_ext or corner_in or hole_cross:
            return 0.0
        return math.sqrt(
            min(
                _seg_seg_d2(s1, e1, s2, e2) for s1, e1 in _segments(shape) for s2, e2 in ext_segs
            )
        )
    if ka == POLYGON and kb == POLYGON:
        if intersects(a, b):
            return 0.0
        b_in_a, b_onb = _ring_state(a[2][0], b[2][0][0])
        a_in_b, a_onb = _ring_state(b[2][0], a[2][0][0])
        if len(a[2]) > 1 and (b_in_a or b_onb):
            segs_a = _segments(a, "holes")
            segs_b = _segments(b, "exterior")
        elif len(b[2]) > 1 and (a_in_b or a_onb):
            segs_a = _segments(a, "exterior")
            segs_b = _segments(b, "holes")
        else:
            segs_a = _segments(a, "exterior")
            segs_b = _segments(b, "exterior")
        return math.sqrt(
            min(_seg_seg_d2(s1, e1, s2, e2) for s1, e1 in segs_a for s2, e2 in segs_b)
        )
    # remaining composites: 0 if intersects else min over edge pairs
    if intersects(a, b):
        return 0.0
    return math.sqrt(
        min(_seg_seg_d2(s1, e1, s2, e2) for s1, e1 in _segments(a) for s2, e2 in _segments(b))
    )
