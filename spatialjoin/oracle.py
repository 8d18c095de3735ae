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


def slow_spatial_join(small: GeomBatch, big: GeomBatch, interaction: str):
    """Returns sorted list of (big_index, small_index).

    interaction: 'intersects' | 'contains' (small contains big) |
    'within' (small within big == big contains small); semantics per
    /root/reference/src/index.rs:505-533 and naive.rs:142-146.
    """
    ai, bi = _cross_indices(len(small), len(big))
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
