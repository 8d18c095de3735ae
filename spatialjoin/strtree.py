"""Packed STRtree (Sort-Tile-Recursive) in flat numpy arrays.

The per-partition local index the north rule mandates for the refine
phase: inside a cogrouped ``applyInPandas`` the small side's bboxes are
bulk-loaded (STR packing, same strategy as the reference's
``RTree::bulk_load``, /root/reference/src/rtrees.rs:29) and probed with
the big side's bboxes. Everything is arrays — build is O(n log n)
sorting, queries are vectorized level-order descents — so there is no
per-row Python in either phase.

Used when the indexed side is too large to broadcast: candidates are
then enumerated per cell-group locally instead of materializing the
cell equi-join's row blowup through the JVM->Arrow boundary.
"""

from __future__ import annotations

import numpy as np

NODE_CAP = 16


class STRtree:
    """Immutable packed R-tree over N bboxes.

    Layout: leaves are the input bboxes sorted by STR tiling; each
    upper level packs NODE_CAP children per node. Per level we store
    the node bboxes as four arrays; probes descend level by level with
    fully vectorized overlap tests.
    """

    __slots__ = ("order", "levels", "leaf", "n")

    def __init__(self, xmin, ymin, xmax, ymax):
        xmin = np.asarray(xmin, dtype=np.float64)
        ymin = np.asarray(ymin, dtype=np.float64)
        xmax = np.asarray(xmax, dtype=np.float64)
        ymax = np.asarray(ymax, dtype=np.float64)
        n = len(xmin)
        self.n = n
        if n == 0:
            self.order = np.zeros(0, dtype=np.int64)
            self.levels = []
            return
        # STR packing: sort by center x, slice into sqrt(n/cap) vertical
        # strips, sort each strip by center y
        cx = (xmin + xmax) * 0.5
        cy = (ymin + ymax) * 0.5
        n_leaves = int(np.ceil(n / NODE_CAP))
        n_strips = max(int(np.ceil(np.sqrt(n_leaves))), 1)
        strip_size = int(np.ceil(n / n_strips))
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(n, dtype=np.int64)
        for s in range(n_strips):
            sl = by_x[s * strip_size : (s + 1) * strip_size]
            order[s * strip_size : s * strip_size + len(sl)] = sl[
                np.argsort(cy[sl], kind="stable")
            ]
        self.order = order
        # ordered raw bboxes for the final exact test of each probe
        lx0, ly0 = xmin[order], ymin[order]
        lx1, ly1 = xmax[order], ymax[order]
        self.leaf = (lx0, ly0, lx1, ly1)
        levels = []
        while True:
            m = len(lx0)
            n_nodes = int(np.ceil(m / NODE_CAP))
            pad = n_nodes * NODE_CAP - m
            def pack(a, fill):
                return np.concatenate([a, np.full(pad, fill)]).reshape(n_nodes, NODE_CAP)
            nx0 = pack(lx0, np.inf).min(axis=1)
            ny0 = pack(ly0, np.inf).min(axis=1)
            nx1 = pack(lx1, -np.inf).max(axis=1)
            ny1 = pack(ly1, -np.inf).max(axis=1)
            levels.append((nx0, ny0, nx1, ny1))
            if n_nodes == 1:
                break
            lx0, ly0, lx1, ly1 = nx0, ny0, nx1, ny1
        levels.reverse()  # root first
        self.levels = levels

    def query_pairs(self, qxmin, qymin, qxmax, qymax):
        """All (query_idx, item_idx) pairs whose bboxes intersect
        (closed). Vectorized level-order descent over all queries at
        once. Returns (qi, ti) int64 arrays."""
        qxmin = np.asarray(qxmin, dtype=np.float64)
        qymin = np.asarray(qymin, dtype=np.float64)
        qxmax = np.asarray(qxmax, dtype=np.float64)
        qymax = np.asarray(qymax, dtype=np.float64)
        nq = len(qxmin)
        if self.n == 0 or nq == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z.copy()
        # frontier: (query, node) pairs at the current level
        qi = np.arange(nq, dtype=np.int64)
        ni = np.zeros(nq, dtype=np.int64)  # every query starts at the root
        for lvl, (x0, y0, x1, y1) in enumerate(self.levels):
            hit = (
                (qxmin[qi] <= x1[ni]) & (qxmax[qi] >= x0[ni])
                & (qymin[qi] <= y1[ni]) & (qymax[qi] >= y0[ni])
            )
            qi, ni = qi[hit], ni[hit]
            if len(qi) == 0:
                z = np.zeros(0, dtype=np.int64)
                return z, z.copy()
            if lvl + 1 < len(self.levels):
                n_next = len(self.levels[lvl + 1][0])
            else:
                n_next = len(self.order)
            # expand each surviving (query, node) to the node's children
            child0 = ni * NODE_CAP
            n_children = np.minimum(NODE_CAP, n_next - child0)
            qi = np.repeat(qi, n_children)
            offs = np.concatenate([[0], np.cumsum(n_children)[:-1]])
            ni = np.repeat(child0, n_children) + (
                np.arange(int(n_children.sum()), dtype=np.int64) - np.repeat(offs, n_children)
            )
        # ni indexes the ordered leaf bboxes: exact per-bbox test last
        lx0, ly0, lx1, ly1 = self.leaf
        hit = (
            (qxmin[qi] <= lx1[ni]) & (qxmax[qi] >= lx0[ni])
            & (qymin[qi] <= ly1[ni]) & (qymax[qi] >= ly0[ni])
        )
        return qi[hit], self.order[ni[hit]]
