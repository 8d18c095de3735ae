"""WKT source/sink — pure-JVM parsing and formatting.

The reference ingests in-memory ``geo::Geometry`` values
(``/root/reference/src/conv.rs:13-53``) and has no text format; this
module is the Spark-native ingestion convenience a 100 TB pipeline
actually needs (WKT columns in lake tables). Everything is Spark SQL
column math — regexp/split/transform/aggregate — so parsing runs inside
whole-stage codegen with no Python worker: at scale, WKT decode is a
scan-side map, not a UDF bottleneck.

Kind mapping (reference kind codes, ``src/structs.rs``):

  WKT POINT                      -> 0 POINT
  WKT LINESTRING with 2 points   -> 1 LINE      (geo::Line)
  WKT LINESTRING with >2 points  -> 2 LINESTRING
  WKT POLYGON                    -> 3 POLYGON   (closed rings, holes kept)

RECT (4) and TRIANGLE (5) are not WKT types; ``to_wkt`` serializes them
as POLYGON rings (lossy by design — WKT has no rect/triangle), and
``from_wkt`` never produces them.

Strictness: by default malformed text raises (ANSI cast). With
``permissive=True`` unparseable rows get kind = NULL so callers can
filter or route them to a dead-letter sink — the standard lake-ingest
pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUM = r"[-+0-9.eE]+"


def _pairs_to_coords(pairs_expr: str, cast: str) -> str:
    """array<double> of flat x,y coords from 'x y, x y, ...' text."""
    return (
        f"flatten(transform(split({pairs_expr}, ','), p -> "
        f"transform(filter(split(trim(p), ' +'), t -> t != ''), "
        f"t -> {cast}(t AS DOUBLE))))"
    )


def from_wkt(df: DataFrame, wkt_col: str = "wkt", permissive: bool = False) -> DataFrame:
    """Add kind/coords/rings columns parsed from ``wkt_col``.

    Output matches the engine geometry contract: flat coords, polygon
    rings CLOSED with ``rings`` holding ring start offsets in points.
    Unsupported/malformed geometry types -> error (default) or NULL kind
    (permissive)."""
    cast = "TRY_CAST" if permissive else "CAST"
    typ = F.upper(F.regexp_extract(F.col(wkt_col), r"^\s*([A-Za-z]+)", 1))
    inner = f"regexp_extract({wkt_col}, '\\\\(\\\\s*(.*?)\\\\s*\\\\)\\\\s*$', 1)"
    # POINT (x y) / LINESTRING (x y, x y, ...): one paren level
    flat = _pairs_to_coords(inner, cast)
    # POLYGON ((...), (...)): split ring bodies on ')...(' boundaries
    ring_bodies = (
        f"transform(split(regexp_replace({inner}, '^\\\\(|\\\\)$', ''), "
        f"'\\\\)\\\\s*,\\\\s*\\\\('), r -> r)"
    )
    ring_arrays = f"transform({ring_bodies}, rb -> {_pairs_to_coords('rb', cast)})"
    df = df.withColumn("__t", typ).withColumn("__ra", F.expr(ring_arrays))
    npts = F.size(F.expr(flat)) / 2
    kind = (
        F.when(F.col("__t") == "POINT", F.lit(0))
        .when((F.col("__t") == "LINESTRING") & (npts == 2), F.lit(1))
        .when(F.col("__t") == "LINESTRING", F.lit(2))
        .when(F.col("__t") == "POLYGON", F.lit(3))
        .otherwise(
            F.lit(None) if permissive else F.raise_error(
                F.concat(F.lit("from_wkt: unsupported WKT type: "), F.col("__t"))
            )
        )
    )
    # polygon: close each ring if open, then flatten + prefix-sum offsets
    closed = (
        "transform(__ra, r -> IF(size(r) >= 2 AND (element_at(r, 1) != element_at(r, -2) "
        "OR element_at(r, 2) != element_at(r, -1)), "
        "concat(r, slice(r, 1, 2)), r))"
    )
    poly_coords = f"flatten({closed})"
    poly_rings = (
        f"transform(sequence(1, size({closed})), i -> "
        f"CAST(aggregate(slice({closed}, 1, i - 1), 0L, "
        f"(acc, r) -> acc + size(r) DIV 2) AS INT))"
    )
    out = (
        df.withColumn("kind", kind.cast("int"))
        .withColumn(
            "coords",
            F.when(F.col("kind") == 3, F.expr(poly_coords)).otherwise(F.expr(flat)),
        )
        .withColumn(
            "rings",
            F.when(F.col("kind") == 3, F.expr(poly_rings)).otherwise(
                F.lit(None).cast("array<int>")
            ),
        )
        .drop("__t", "__ra")
    )
    # malformed-body detection (both modes): an empty/absent body
    # ('POINT EMPTY', truncated text), an odd coordinate count
    # ('LINESTRING (0 0, 1)'), a null number (TRY_CAST miss), or a POINT
    # with more than one pair — each would otherwise emit a geometry row
    # that violates the engine contract downstream
    bad = (
        F.col("coords").isNull()
        | (F.size("coords") < 2)
        | (F.size("coords") % 2 == 1)
        | F.exists("coords", lambda x: x.isNull())
        | ((F.col("kind") == 0) & (F.size("coords") != 2))
    )
    if permissive:
        # permissive: null the kind so downstream filters catch every
        # bad row with one `kind IS NOT NULL` (dead-letter routing)
        out = out.withColumn("kind", F.when(bad, F.lit(None)).otherwise(F.col("kind")))
    else:
        # strict: malformed text raises (module contract), matching the
        # unsupported-type raise above
        out = out.withColumn(
            "kind",
            F.when(
                bad,
                F.raise_error(
                    F.concat(F.lit("from_wkt: malformed WKT body: "), F.col(wkt_col))
                ),
            ).otherwise(F.col("kind")),
        )
    return out


def _fmt_pairs(coords_expr: str) -> str:
    """'x y, x y, ...' text from a flat coords array (shortest-roundtrip
    double formatting — Spark's CAST(double AS STRING)). The lambda
    variable is namespaced (__fp) so callers can embed expressions that
    reference their OWN enclosing lambda variables (e.g. the ring index
    i in to_wkt) without shadowing."""
    return (
        f"array_join(transform(sequence(0, CAST(size({coords_expr})/2 AS INT) - 1), "
        f"__fp -> concat(CAST(element_at({coords_expr}, 2*__fp + 1) AS STRING), ' ', "
        f"CAST(element_at({coords_expr}, 2*__fp + 2) AS STRING))), ', ')"
    )


def to_wkt(df: DataFrame, out_col: str = "wkt") -> DataFrame:
    """Serialize kind/coords/rings to a WKT string column. RECT and
    TRIANGLE become POLYGON (WKT has no such types); LINE becomes a
    2-point LINESTRING."""
    pairs = _fmt_pairs("coords")
    rect_ring = (
        "concat('POLYGON ((', "
        "CAST(coords[0] AS STRING), ' ', CAST(coords[1] AS STRING), ', ', "
        "CAST(coords[2] AS STRING), ' ', CAST(coords[1] AS STRING), ', ', "
        "CAST(coords[2] AS STRING), ' ', CAST(coords[3] AS STRING), ', ', "
        "CAST(coords[0] AS STRING), ' ', CAST(coords[3] AS STRING), ', ', "
        "CAST(coords[0] AS STRING), ' ', CAST(coords[1] AS STRING), '))')"
    )
    tri_ring = (
        "concat('POLYGON ((', "
        f"{_fmt_pairs('concat(coords, slice(coords, 1, 2))')}, '))')"
    )
    ring_txts = (
        "transform(sequence(1, size(rings)), i -> "
        "concat('(', "
        + _fmt_pairs(
            "slice(coords, element_at(rings, i) * 2 + 1, "
            "IF(i = size(rings), size(coords), element_at(rings, i + 1) * 2) "
            "- element_at(rings, i) * 2)"
        )
        + ", ')'))"
    )
    poly = f"concat('POLYGON (', array_join({ring_txts}, ', '), ')')"
    wkt = (
        F.when(F.col("kind") == 0, F.expr(f"concat('POINT (', {pairs}, ')')"))
        .when(F.col("kind").isin(1, 2), F.expr(f"concat('LINESTRING (', {pairs}, ')')"))
        .when(F.col("kind") == 3, F.expr(poly))
        .when(F.col("kind") == 4, F.expr(rect_ring))
        .when(F.col("kind") == 5, F.expr(tri_ring))
    )
    return df.withColumn(out_col, wkt)
