"""Packed STRtree vs brute-force bbox join (no Spark needed)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spatialjoin.strtree import STRtree


def brute(qs, items):
    qx0, qy0, qx1, qy1 = qs
    ix0, iy0, ix1, iy1 = items
    out = set()
    for i in range(len(qx0)):
        for j in range(len(ix0)):
            if qx0[i] <= ix1[j] and qx1[i] >= ix0[j] and qy0[i] <= iy1[j] and qy1[i] >= iy0[j]:
                out.add((i, j))
    return out


def _boxes(rng, n, span=10.0, size=1.0):
    x0 = rng.uniform(-span, span, n)
    y0 = rng.uniform(-span, span, n)
    w = rng.uniform(0, size, n)
    h = rng.uniform(0, size, n)
    return x0, y0, x0 + w, y0 + h


@pytest.mark.parametrize("n_items,n_q,seed", [(0, 5, 1), (1, 1, 2), (17, 40, 3), (500, 200, 4), (1000, 1, 5)])
def test_matches_brute_force(n_items, n_q, seed):
    rng = np.random.default_rng(seed)
    items = _boxes(rng, n_items)
    qs = _boxes(rng, n_q)
    t = STRtree(*items)
    qi, ti = t.query_pairs(*qs)
    got = set(zip(qi.tolist(), ti.tolist()))
    assert len(got) == len(qi)  # no duplicate pairs
    assert got == brute(qs, items)


def test_degenerate_and_touching():
    # degenerate boxes (points) and exact boundary touches are inclusive
    items = (np.array([0.0, 2.0]), np.array([0.0, 2.0]), np.array([1.0, 2.0]), np.array([1.0, 2.0]))
    qs = (np.array([1.0, 5.0]), np.array([1.0, 5.0]), np.array([2.0, 6.0]), np.array([2.0, 6.0]))
    t = STRtree(*items)
    qi, ti = t.query_pairs(*qs)
    assert set(zip(qi.tolist(), ti.tolist())) == {(0, 0), (0, 1)}


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=300), st.integers(min_value=1, max_value=60), st.integers(0, 10_000))
def test_hypothesis_agreement(n_items, n_q, seed):
    rng = np.random.default_rng(seed)
    items = _boxes(rng, n_items, span=3.0, size=2.0)
    qs = _boxes(rng, n_q, span=3.0, size=2.0)
    t = STRtree(*items)
    got = set(zip(*[a.tolist() for a in t.query_pairs(*qs)]))
    assert got == brute(qs, items)
