"""Hierarchical grid cell index (numpy, pure integer math).

Plays the role the six R-trees play in the reference
(``/root/reference/src/rtrees.rs:24-96``) but re-expressed for a
distributed engine: instead of an in-process tree probe, geometries are
assigned int64 CELL IDS at a resolution, and the spatial join's
filter phase becomes an ordinary Spark equi-join on the cell column
(broadcast or shuffle — Catalyst's problem, per SURVEY.md §4).

Cell id layout (int64):  [ res:6 bits | cx:29 bits | cy:29 bits ]
``cx``/``cy`` are row-major grid coordinates at resolution ``res``
(cell count per axis = 2^res) over a configured world extent. Row-major
packing keeps the id decodable with two shifts in Spark SQL built-ins
(used by the reference-point dedup filter); a Hilbert/Morton packing
would be a drop-in replacement if storage-order locality mattered more.

The ``max_distance`` buffering of the reference's index build
(``src/rtrees.rs:159-166`` cheap_buffer) maps to covering the EXPANDED
bbox here — the epsilon of the distance join is pushed into the cell
covering exactly like the reference pushes it into stored bboxes.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 28
_COORD_BITS = 29
_COORD_MASK = (1 << _COORD_BITS) - 1

# Default world extent. Synthetic corpora here live in small planar
# boxes; lon/lat data fits the same box. Configurable per index.
DEFAULT_EXTENT = (-180.0, -90.0, 180.0, 90.0)


class Grid:
    """A fixed-extent quadtree grid; all methods are vectorized."""

    __slots__ = ("x0", "y0", "x1", "y1")

    def __init__(self, extent=DEFAULT_EXTENT):
        self.x0, self.y0, self.x1, self.y1 = map(float, extent)
        if not (self.x1 > self.x0 and self.y1 > self.y0):
            raise ValueError("extent must have positive width and height")

    @property
    def extent(self):
        return (self.x0, self.y0, self.x1, self.y1)

    def cell_size(self, res: int):
        n = 1 << res
        return (self.x1 - self.x0) / n, (self.y1 - self.y0) / n

    # -- id packing ---------------------------------------------------------

    @staticmethod
    def pack(cx, cy, res):
        return (
            (np.int64(res) << np.int64(2 * _COORD_BITS))
            | (np.asarray(cx, dtype=np.int64) << np.int64(_COORD_BITS))
            | np.asarray(cy, dtype=np.int64)
        )

    @staticmethod
    def unpack(cell):
        cell = np.asarray(cell, dtype=np.int64)
        res = cell >> np.int64(2 * _COORD_BITS)
        cx = (cell >> np.int64(_COORD_BITS)) & np.int64(_COORD_MASK)
        cy = cell & np.int64(_COORD_MASK)
        return cx, cy, res

    # -- coordinate -> cell -------------------------------------------------

    def grid_coords(self, x, y, res: int):
        """Clamped integer grid coordinates at ``res``."""
        n = 1 << res
        cw, ch = self.cell_size(res)
        cx = np.floor((np.asarray(x, dtype=np.float64) - self.x0) / cw).astype(np.int64)
        cy = np.floor((np.asarray(y, dtype=np.float64) - self.y0) / ch).astype(np.int64)
        return np.clip(cx, 0, n - 1), np.clip(cy, 0, n - 1)

    def cell_of(self, x, y, res: int):
        cx, cy = self.grid_coords(x, y, res)
        return self.pack(cx, cy, res)

    # -- hierarchy ----------------------------------------------------------

    @staticmethod
    def parent(cell, steps=1):
        cx, cy, res = Grid.unpack(cell)
        return Grid.pack(cx >> steps, cy >> steps, int(res[0]) - steps if np.ndim(res) else res - steps)

    def k_ring(self, cell, k: int):
        """All cells within Chebyshev distance k of each input cell
        (clamped to the grid). Returns (owner, cells)."""
        cx, cy, res = self.unpack(cell)
        r = int(res[0]) if len(np.atleast_1d(res)) else 0
        n = 1 << r
        side = 2 * k + 1
        dx = np.arange(-k, k + 1, dtype=np.int64)
        offx = np.repeat(dx, side)
        offy = np.tile(dx, side)
        m = len(cx)
        owner = np.repeat(np.arange(m, dtype=np.int64), side * side)
        nx = cx[owner] + np.tile(offx, m)
        ny = cy[owner] + np.tile(offy, m)
        ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
        return owner[ok], self.pack(nx[ok], ny[ok], r)

    # -- bbox covering ------------------------------------------------------

    def cover_bbox(self, xmin, ymin, xmax, ymax, res: int, cap: int = 4096):
        """Cells overlapping each bbox at ``res``.

        Returns (owner, cells). ``cap`` bounds the per-row blowup: rows
        whose covering would exceed cap raise (choose a coarser
        resolution for such data — see choose_resolution).
        """
        cx0, cy0 = self.grid_coords(xmin, ymin, res)
        cx1, cy1 = self.grid_coords(xmax, ymax, res)
        nx = cx1 - cx0 + 1
        ny = cy1 - cy0 + 1
        counts = nx * ny
        if counts.size and int(counts.max()) > cap:
            raise ValueError(
                f"bbox covers {int(counts.max())} cells at res={res} (cap={cap}); "
                "use a coarser resolution"
            )
        total = int(counts.sum())
        owner = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        base = np.concatenate([[0], np.cumsum(counts)[:-1]])
        k = np.arange(total, dtype=np.int64) - np.repeat(base, counts)
        rep_ny = ny[owner]
        ix = cx0[owner] + k // rep_ny
        iy = cy0[owner] + k - (k // rep_ny) * rep_ny
        return owner, self.pack(ix, iy, res)

    def choose_resolution(self, widths, heights, target_cells_per_geom: float = 2.0,
                          min_res: int = 2, max_res: int = MAX_RES) -> int:
        """Pick the join resolution from indexed-side bbox stats.

        Heuristic: cell size ~= median bbox max-dimension *
        sqrt(target), so a typical bbox overlaps ~target cells; tiny or
        point-like data falls back to a fine resolution bounded by
        max_res. Mirrors 'index the smaller sequence' guidance
        (reference README.md:199-205) — stats come from the indexed
        (small) side.
        """
        w = np.asarray(widths, dtype=np.float64)
        h = np.asarray(heights, dtype=np.float64)
        dim = np.maximum(w, h)
        dim = dim[np.isfinite(dim)]
        med = float(np.median(dim)) if dim.size else 0.0
        ex_w = self.x1 - self.x0
        ex_h = self.y1 - self.y0
        if med <= 0.0:
            return max_res
        cell = med * float(np.sqrt(target_cells_per_geom))
        res_x = int(np.floor(np.log2(max(ex_w / cell, 1.0))))
        res_y = int(np.floor(np.log2(max(ex_h / cell, 1.0))))
        return int(np.clip(min(res_x, res_y), min_res, max_res))
