"""Geometry model: columnar struct-of-arrays batches + validation.

A brand-new PySpark-native re-expression of the reference crate's data
model (msalib/spatial-join). The reference represents a geometry
sequence as six per-type Vecs with position bookkeeping
(``/root/reference/src/structs.rs:84-91``); we represent a batch as a
numpy struct-of-arrays (kind tags + pooled coordinate arrays), which is
what Arrow hands us inside pandas UDFs anyway.

Supported kinds (reference: ``/root/reference/src/lib.rs:28-39``):
point, line, linestring, polygon, rect, triangle. Multi* geometries are
unsupported, exactly like the reference (``src/conv.rs:51``).

Validation parity (``/root/reference/src/validation.rs``,
``src/structs.rs:9-22``): all coordinates finite; linestrings >= 2
points; polygon exteriors >= 3 points; max_distance finite and >= 0.
"""

from __future__ import annotations

import numpy as np

# Kind codes (stable contract; also used in the Spark struct encoding).
POINT = 0
LINE = 1
LINESTRING = 2
POLYGON = 3
RECT = 4
TRIANGLE = 5

KIND_NAMES = {
    POINT: "point",
    LINE: "line",
    LINESTRING: "linestring",
    POLYGON: "polygon",
    RECT: "rect",
    TRIANGLE: "triangle",
}


class ValidationError(ValueError):
    """Base for the reference's four Error variants (src/structs.rs:9-22)."""


class BadCoordinateValue(ValidationError):
    def __init__(self, position: int):
        self.position = position
        super().__init__(f"geometry at position {position} has a non-finite coordinate")


class BadMaxDistance(ValidationError):
    def __init__(self, value: float):
        self.value = value
        super().__init__(f"max_distance must be finite and >= 0, got {value}")


class LineStringTooSmall(ValidationError):
    def __init__(self, position: int):
        self.position = position
        super().__init__(f"linestring at position {position} has < 2 points")


class PolygonExteriorTooSmall(ValidationError):
    def __init__(self, position: int):
        self.position = position
        super().__init__(f"polygon at position {position} has an exterior with < 3 points")


def validate_max_distance(max_distance: float) -> float:
    """Reference: Config::validate (src/structs.rs:49-55)."""
    d = float(max_distance)
    if not np.isfinite(d) or d < 0.0:
        raise BadMaxDistance(d)
    return d


class GeomBatch:
    """Columnar batch of N geometries.

    Fields
    ------
    kind    : int8[N]
    offs    : int64[N+1]  point offsets into xs/ys per geometry
    xs, ys  : float64[P]  pooled coordinates
    ring_counts : int32[N]   number of rings (polygons only; 0 otherwise)
    ring_starts : int64[sum(ring_counts)] absolute point index of each
                  ring start, grouped per geometry in order; ring end =
                  next start within the geometry, or the geometry end.
                  Rings are stored CLOSED (last point == first point).

    Coordinate layout per kind:
      point: 1 pt; line: 2 pts; linestring: n pts; rect: 2 pts (min,max);
      triangle: 3 pts; polygon: closed rings concatenated (exterior first).
    """

    __slots__ = ("kind", "offs", "xs", "ys", "ring_counts", "ring_starts", "_bbox")

    def __init__(self, kind, offs, xs, ys, ring_counts, ring_starts):
        self.kind = np.asarray(kind, dtype=np.int8)
        self.offs = np.asarray(offs, dtype=np.int64)
        self.xs = np.asarray(xs, dtype=np.float64)
        self.ys = np.asarray(ys, dtype=np.float64)
        self.ring_counts = np.asarray(ring_counts, dtype=np.int32)
        self.ring_starts = np.asarray(ring_starts, dtype=np.int64)
        self._bbox = None

    def __len__(self) -> int:
        return len(self.kind)

    # -- construction -----------------------------------------------------

    @staticmethod
    def from_lists(kinds, coords_lists, ring_offsets_lists=None, validate: bool = True):
        """Build from python/pandas rows.

        ``coords_lists[i]`` is the flat [x0,y0,x1,y1,...] list;
        ``ring_offsets_lists[i]`` (polygons) lists the starting POINT
        index of each ring within the geometry's coords (exterior
        first), e.g. ``[0]`` for a hole-less polygon. Polygon rings are
        auto-closed here (the reference's geo::Polygon does the same).
        """
        n = len(kinds)
        kind = np.asarray(kinds, dtype=np.int8)
        xs_parts, ys_parts = [], []
        offs = np.zeros(n + 1, dtype=np.int64)
        ring_counts = np.zeros(n, dtype=np.int32)
        ring_starts_parts = []
        total = 0
        for i in range(n):
            c = np.asarray(coords_lists[i], dtype=np.float64)
            k = int(kind[i])
            if k == POLYGON:
                ro = None
                if ring_offsets_lists is not None and ring_offsets_lists[i] is not None:
                    ro = [int(v) for v in ring_offsets_lists[i]]
                if not ro:
                    ro = [0]
                npts_in = len(c) // 2
                ends = ro[1:] + [npts_in]
                closed_xy = []
                rstarts = []
                acc = total
                for rs, re in zip(ro, ends):
                    ring = c[2 * rs : 2 * re].reshape(-1, 2)
                    if len(ring) > 0 and (len(ring) < 2 or ring[0][0] != ring[-1][0] or ring[0][1] != ring[-1][1]):
                        ring = np.vstack([ring, ring[:1]])
                    closed_xy.append(ring)
                    rstarts.append(acc)
                    acc += len(ring)
                pts = np.vstack(closed_xy) if closed_xy else np.zeros((0, 2))
                ring_counts[i] = len(rstarts)
                ring_starts_parts.append(np.asarray(rstarts, dtype=np.int64))
            else:
                pts = c.reshape(-1, 2)
            xs_parts.append(pts[:, 0])
            ys_parts.append(pts[:, 1])
            total += len(pts)
            offs[i + 1] = total
        xs = np.concatenate(xs_parts) if xs_parts else np.zeros(0)
        ys = np.concatenate(ys_parts) if ys_parts else np.zeros(0)
        ring_starts = (
            np.concatenate(ring_starts_parts) if ring_starts_parts else np.zeros(0, dtype=np.int64)
        )
        gb = GeomBatch(kind, offs, xs, ys, ring_counts, ring_starts)
        if validate:
            gb.validate()
        return gb

    @staticmethod
    def from_columns(kinds, coords_list, rings_list=None, validate: bool = False):
        """Fast batch constructor for the engine hot path (refine UDFs).

        ``coords_list``: sequence of flat [x,y,...] arrays (as handed to a
        pandas UDF). Polygon rings MUST already be closed (engine
        contract; ``from_lists`` is the lenient test-side constructor).
        ``rings_list[i]``: ring start offsets (in points) or None.
        """
        kind = np.asarray(kinds, dtype=np.int8)
        n = len(kind)
        if n == 0:
            z = np.zeros(0)
            return GeomBatch(kind, np.zeros(1, dtype=np.int64), z, z.copy(),
                             np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int64))
        arrs = [np.asarray(c, dtype=np.float64) for c in coords_list]
        lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=n)
        flat = np.concatenate(arrs) if n else np.zeros(0)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens // 2, out=offs[1:])
        xs = flat[0::2]
        ys = flat[1::2]
        ring_counts = np.zeros(n, dtype=np.int32)
        ring_starts = np.zeros(0, dtype=np.int64)
        poly_rows = np.flatnonzero(kind == POLYGON)
        if len(poly_rows):
            parts = []
            for i in poly_rows:
                r = rings_list[i] if rings_list is not None else None
                ro = np.asarray(r if r is not None and len(r) else [0], dtype=np.int64)
                ring_counts[i] = len(ro)
                parts.append(ro + offs[i])
            ring_starts = np.concatenate(parts)
        gb = GeomBatch(kind, offs, xs, ys, ring_counts, ring_starts)
        if validate:
            gb.validate()
        return gb

    @staticmethod
    def from_arrow(kinds, coords_arr, rings_arr=None):
        """Zero-copy batch constructor from Arrow LIST arrays (the
        applyInArrow hot path). The whole column's coordinates arrive as
        ONE flat float64 buffer + an offsets vector, which is exactly
        this class's pooled layout — no per-row object boxing, no
        pandas, no per-row concatenate (from_columns pays all three).

        ``coords_arr`` / ``rings_arr``: pyarrow ListArray or
        ChunkedArray (no null values — engine contract ships empty
        arrays, see _prefixed)."""
        import pyarrow as pa

        kind = np.asarray(kinds, dtype=np.int8)
        n = len(kind)
        if n == 0:
            z = np.zeros(0)
            return GeomBatch(kind, np.zeros(1, dtype=np.int64), z, z.copy(),
                             np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int64))
        if isinstance(coords_arr, pa.ChunkedArray):
            coords_arr = coords_arr.combine_chunks()
        off = np.asarray(coords_arr.offsets, dtype=np.int64)
        flat = coords_arr.values.to_numpy(zero_copy_only=False)
        flat = flat[off[0]: off[-1]]
        off = off - off[0]
        offs = off >> 1
        xs = flat[0::2]
        ys = flat[1::2]
        ring_counts = np.zeros(n, dtype=np.int32)
        ring_starts = np.zeros(0, dtype=np.int64)
        poly = kind == POLYGON
        if poly.any() and rings_arr is not None:
            if isinstance(rings_arr, pa.ChunkedArray):
                rings_arr = rings_arr.combine_chunks()
            roff = np.asarray(rings_arr.offsets, dtype=np.int64)
            rvals = rings_arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
            rvals = rvals[roff[0]: roff[-1]]
            roff = roff - roff[0]
            counts = np.diff(roff)
            if (counts[poly] == 0).any():
                # rare: polygon with implied [0] exterior — per-row path
                parts = []
                for i in np.flatnonzero(poly):
                    ro = rvals[roff[i]: roff[i + 1]]
                    if len(ro) == 0:
                        ro = np.zeros(1, dtype=np.int64)
                    ring_counts[i] = len(ro)
                    parts.append(ro + offs[i])
                ring_starts = np.concatenate(parts)
            else:
                # non-polygon rows may carry a (contract-violating)
                # non-empty rings array; from_columns ignores rings on
                # those rows — mask to polygon rows before the repeat so
                # hole checks (ring_counts[i] > 1) can't flip on them
                if not poly.all():
                    rvals = rvals[np.repeat(poly, counts)]
                    counts = np.where(poly, counts, 0)
                ring_counts = counts.astype(np.int32)
                ring_starts = rvals + np.repeat(offs[:-1], counts)
        return GeomBatch(kind, offs, xs, ys, ring_counts, ring_starts)

    # -- validation (reference parity) ------------------------------------

    def validate(self) -> None:
        """Eager-at-ingest validation; first failing position raises,
        mirroring the reference's per-geometry is_safe walk
        (src/conv.rs:13-66, src/validation.rs:5-105)."""
        npts = np.diff(self.offs)
        finite = np.isfinite(self.xs) & np.isfinite(self.ys)
        if not finite.all():
            # map the first bad coordinate back to its geometry position
            bad_pt = int(np.flatnonzero(~finite)[0])
            pos = int(np.searchsorted(self.offs, bad_pt, side="right") - 1)
            # structural errors take precedence at earlier positions
            struct_bad = self._first_structural_error(npts)
            if struct_bad is not None and struct_bad[0] <= pos:
                self._raise_structural(*struct_bad)
            raise BadCoordinateValue(pos)
        sb = self._first_structural_error(npts)
        if sb is not None:
            self._raise_structural(*sb)

    def _first_structural_error(self, npts):
        ls_bad = (self.kind == LINESTRING) & (npts < 2)
        poly = self.kind == POLYGON
        # exterior ring point count (closed); reference checks
        # num_coords >= 3 on the (auto-closed) exterior LineString
        poly_bad = np.zeros(len(self), dtype=bool)
        if poly.any():
            ext_len = self._ring_length(0)
            poly_bad[poly] = ext_len[poly] < 3
        cand = np.flatnonzero(ls_bad | poly_bad)
        if len(cand) == 0:
            return None
        p = int(cand[0])
        return (p, "ls" if ls_bad[p] else "poly")

    def _ring_length(self, ring_idx: int):
        """Length (in points) of ring ``ring_idx`` per geometry (0 if absent)."""
        out = np.zeros(len(self), dtype=np.int64)
        rc_off = np.concatenate([[0], np.cumsum(self.ring_counts)])
        for i in np.flatnonzero(self.kind == POLYGON):
            rs, re = rc_off[i], rc_off[i + 1]
            starts = self.ring_starts[rs:re]
            if ring_idx < len(starts):
                end = starts[ring_idx + 1] if ring_idx + 1 < len(starts) else self.offs[i + 1]
                out[i] = end - starts[ring_idx]
        return out

    @staticmethod
    def _raise_structural(pos, which):
        if which == "ls":
            raise LineStringTooSmall(pos)
        raise PolygonExteriorTooSmall(pos)

    # -- derived -----------------------------------------------------------

    def bbox(self):
        """(xmin, ymin, xmax, ymax) per geometry. Reference: Envelope::to_env
        (src/rtrees.rs:99-157); rects normalize to (min,max) like geo::Rect."""
        if self._bbox is None:
            n = len(self)
            if n == 0:
                z = np.zeros(0)
                self._bbox = (z, z.copy(), z.copy(), z.copy())
                return self._bbox
            starts = self.offs[:-1]
            xmin = np.minimum.reduceat(self.xs, starts)
            xmax = np.maximum.reduceat(self.xs, starts)
            ymin = np.minimum.reduceat(self.ys, starts)
            ymax = np.maximum.reduceat(self.ys, starts)
            # reduceat quirk: empty slices copy the element at the index;
            # validation forbids empty geometries so every slice is nonempty.
            self._bbox = (xmin, ymin, xmax, ymax)
        return self._bbox


def pair_cross_indices(counts_a, counts_b):
    """Vectorized per-pair cross product.

    Given per-pair element counts ``counts_a[i]``, ``counts_b[i]``,
    return (pid, ia, ib) enumerating, for every pair i, all
    counts_a[i] * counts_b[i] combinations, where ia/ib are LOCAL
    indices within the pair's elements.
    """
    counts_a = np.asarray(counts_a, dtype=np.int64)
    counts_b = np.asarray(counts_b, dtype=np.int64)
    total = counts_a * counts_b
    tsum = int(total.sum())
    if tsum == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    pid = np.repeat(np.arange(len(total), dtype=np.int64), total)
    base = np.concatenate([[0], np.cumsum(total)[:-1]])
    k = np.arange(tsum, dtype=np.int64) - np.repeat(base, total)
    nb = counts_b[pid]
    ia = k // nb
    ib = k - ia * nb
    return pid, ia, ib


def group_arange(counts):
    """[0..c0), [0..c1), ... concatenated (vectorized)."""
    counts = np.asarray(counts, dtype=np.int64)
    tsum = int(counts.sum())
    if tsum == 0:
        return np.zeros(0, dtype=np.int64)
    base = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(tsum, dtype=np.int64) - np.repeat(base, counts)
