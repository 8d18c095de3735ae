"""Naive nested-loop join oracle.

Port of the reference's test oracle ``slow_spatial_join`` /
``slow_prox_map`` (``/root/reference/src/naive.rs:109-158``): the full
cross product evaluated with the same predicate semantics, sorted
output. Used only in tests — never a production operator.
"""

from __future__ import annotations

import numpy as np

from . import kernels
from .geom import GeomBatch, validate_max_distance


def _cross_indices(ns: int, nb: int):
    ai = np.repeat(np.arange(ns, dtype=np.int64), nb)
    bi = np.tile(np.arange(nb, dtype=np.int64), ns)
    return ai, bi


def _bbox_gate(small: GeomBatch, big: GeomBatch, ai, bi, buffer: float):
    """Closed bbox-intersection prefilter — what the reference's R-tree
    probe does before refining (src/index.rs:143-221, envelopes
    buffered by max_distance at build, src/rtrees.rs:36-47)."""
    sx0, sy0, sx1, sy1 = small.bbox()
    bx0, by0, bx1, by1 = big.bbox()
    return (
        (sx0[ai] - buffer <= bx1[bi])
        & (sx1[ai] + buffer >= bx0[bi])
        & (sy0[ai] - buffer <= by1[bi])
        & (sy1[ai] + buffer >= by0[bi])
    )


def slow_spatial_join(small: GeomBatch, big: GeomBatch, interaction: str,
                      max_distance: float = 0.0):
    """Returns sorted list of (big_index, small_index).

    interaction: 'intersects' | 'contains' (small contains big) |
    'within' (small within big == big contains small); semantics per
    /root/reference/src/index.rs:505-533 and naive.rs:142-146.

    DELIBERATE divergence from the reference's naive.rs oracle: pairs
    are prefiltered by (buffered) bbox intersection, exactly like the
    reference's PRODUCTION join (R-tree envelope probe). The two differ
    only for triangle-vs-HOLED-polygon pairs with disjoint bboxes,
    where the quirky rule at relates_impl.rs:359-367 reduces to
    ``polygon.has_holes`` and naive.rs would emit a pair the reference
    join itself can never produce (its proptest corpus is hole-less, so
    the inconsistency is unreachable in its tests). We pin the
    production-join behavior; the pairwise kernels keep the verbatim
    quirk (tests/test_kernels.py::test_triangle_polygon_hole_quirk).
    """
    ai, bi = _cross_indices(len(small), len(big))
    gate = _bbox_gate(small, big, ai, bi, max_distance)
    ai, bi = ai[gate], bi[gate]
    if interaction == "intersects":
        mask = kernels.intersects(small, ai, big, bi)
    elif interaction == "contains":
        mask = kernels.contains(small, ai, big, bi)
    elif interaction == "within":
        mask = kernels.contains(big, bi, small, ai)
    else:
        raise ValueError(f"unknown interaction {interaction!r}")
    pairs = sorted(zip(bi[mask].tolist(), ai[mask].tolist()))
    return pairs


def slow_prox_map(small: GeomBatch, big: GeomBatch, max_distance: float):
    """Returns sorted list of (big_index, small_index, distance) with
    distance <= max_distance (inclusive; naive.rs:119)."""
    max_distance = validate_max_distance(max_distance)
    ai, bi = _cross_indices(len(small), len(big))
    d = kernels.distance(small, ai, big, bi)
    assert np.isfinite(d).all(), "distances must be finite (index.rs:436)"
    mask = d <= max_distance
    rows = sorted(zip(bi[mask].tolist(), ai[mask].tolist(), d[mask].tolist()))
    return rows
