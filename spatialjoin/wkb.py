"""WKB source/sink — Arrow-batched numpy codec.

The reference's test-data generator emits BOTH .wkt and .wkb files
(``/root/reference/src/gen_test.py:25-33``); ``wkt.py`` covers the
text side as pure-JVM column math. WKB is a BINARY codec and Spark has
no built-in double<->IEEE-bytes conversion, so encode/decode run as
``mapInPandas`` batches (the multimodal-codec pattern: per-geometry
numpy, never per-scalar Python).

Standard ISO WKB, little-endian on write, both byte orders accepted on
read. Geometry types: Point(1), LineString(2), Polygon(3). Kind
mapping mirrors ``wkt.py``:

  kind 0 POINT      <-> WKB Point
  kind 1 LINE        -> WKB LineString (2 points; parsed back to LINE)
  kind 2 LINESTRING <-> WKB LineString (>2 points)
  kind 3 POLYGON    <-> WKB Polygon (closed rings, holes kept; open
                        rings are closed on read, like from_wkt)
  kind 4 RECT        -> WKB Polygon (5-point CCW ring; lossy by design)
  kind 5 TRIANGLE    -> WKB Polygon (4-point ring; lossy by design)

Strictness parity with wkt.py: malformed bytes raise by default;
``permissive=True`` nulls the kind so bad rows route to a dead-letter
sink with one ``kind IS NOT NULL`` filter.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_WKB_POINT, _WKB_LINESTRING, _WKB_POLYGON = 1, 2, 3


def _encode_one(kind: int, coords, rings) -> bytes:
    c = np.ascontiguousarray(np.asarray(coords, dtype=np.float64))
    if kind == 0:
        return b"\x01" + struct.pack("<I", _WKB_POINT) + c[:2].tobytes()
    if kind in (1, 2):
        return (b"\x01" + struct.pack("<II", _WKB_LINESTRING, len(c) // 2)
                + c.tobytes())
    if kind == 4:
        x0, y0, x1, y1 = c
        ring = np.array([x0, y0, x1, y0, x1, y1, x0, y1, x0, y0])
        return b"\x01" + struct.pack("<III", _WKB_POLYGON, 1, 5) + ring.tobytes()
    if kind == 5:
        ring = np.concatenate([c, c[:2]])
        return b"\x01" + struct.pack("<III", _WKB_POLYGON, 1, 4) + ring.tobytes()
    if kind == 3:
        offs = [int(o) for o in (rings if rings is not None else [0])]
        offs.append(len(c) // 2)
        parts = [b"\x01", struct.pack("<II", _WKB_POLYGON, len(offs) - 1)]
        for i in range(len(offs) - 1):
            seg = c[2 * offs[i]:2 * offs[i + 1]]
            parts.append(struct.pack("<I", len(seg) // 2))
            parts.append(seg.tobytes())
        return b"".join(parts)
    raise ValueError(f"to_wkb: unsupported kind {kind}")


def _decode_one(b: bytes):
    """-> (kind, coords_list, rings_list_or_None); raises on bad input."""
    if not b or b[0] not in (0, 1):
        raise ValueError("from_wkb: bad byte-order marker")
    dt = "<" if b[0] == 1 else ">"
    (typ,) = struct.unpack_from(dt + "I", b, 1)
    if typ == _WKB_POINT:
        x, y = struct.unpack_from(dt + "2d", b, 5)
        return 0, [x, y], None
    if typ == _WKB_LINESTRING:
        (n,) = struct.unpack_from(dt + "I", b, 5)
        if n < 2 or len(b) < 9 + 16 * n:
            raise ValueError("from_wkb: truncated LineString")
        c = np.frombuffer(b, dtype=dt + "f8", count=2 * n, offset=9)
        return (1 if n == 2 else 2), c.tolist(), None
    if typ == _WKB_POLYGON:
        (nr,) = struct.unpack_from(dt + "I", b, 5)
        if nr < 1:
            raise ValueError("from_wkb: Polygon with no rings")
        pos, coords, offs, total = 9, [], [], 0
        for _ in range(nr):
            (n,) = struct.unpack_from(dt + "I", b, pos)
            pos += 4
            if n < 3 or len(b) < pos + 16 * n:
                raise ValueError("from_wkb: truncated Polygon ring")
            r = np.frombuffer(b, dtype=dt + "f8", count=2 * n, offset=pos)
            pos += 16 * n
            if r[0] != r[-2] or r[1] != r[-1]:  # close open rings (wkt.py parity)
                r = np.concatenate([r, r[:2]])
            offs.append(total)
            total += len(r) // 2
            coords.append(r)
        return 3, np.concatenate(coords).tolist(), offs
    raise ValueError(f"from_wkb: unsupported WKB geometry type {typ}")


def to_wkb(df: DataFrame, out_col: str = "wkb") -> DataFrame:
    """Append a WKB binary column serialized from kind/coords/rings."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType(), True)]
    )

    def enc(iterator):
        for pdf in iterator:
            out = pdf.copy()
            out[out_col] = [
                _encode_one(int(k), c, r)
                for k, c, r in zip(pdf["kind"], pdf["coords"], pdf["rings"])
            ]
            yield out

    return df.mapInPandas(enc, out_schema)


def from_wkb(df: DataFrame, wkb_col: str = "wkb",
             permissive: bool = False) -> DataFrame:
    """Add kind/coords/rings columns parsed from ``wkb_col`` (existing
    geometry columns, if any, are replaced). Malformed bytes raise
    (default) or null the kind (permissive)."""
    keep = [f for f in df.schema.fields
            if f.name not in ("kind", "coords", "rings")]
    out_schema = T.StructType(keep + [
        T.StructField("kind", T.IntegerType(), True),
        T.StructField("coords", T.ArrayType(T.DoubleType()), True),
        T.StructField("rings", T.ArrayType(T.IntegerType()), True),
    ])
    keep_names = [f.name for f in keep]

    def dec(iterator):
        for pdf in iterator:
            kinds, coords, rings = [], [], []
            for b in pdf[wkb_col]:
                try:
                    k, c, r = _decode_one(bytes(b))
                except Exception:
                    if not permissive:
                        raise
                    k, c, r = None, None, None
                kinds.append(k)
                coords.append(c)
                rings.append(r)
            out = pdf[keep_names].copy()
            out["kind"] = kinds
            out["coords"] = coords
            out["rings"] = rings
            yield out

    return df.select(*keep_names).mapInPandas(dec, out_schema)
