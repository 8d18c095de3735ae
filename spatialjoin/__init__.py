"""spatialjoin — a PySpark-native spatial-join + tiling engine.

Brand-new implementation (Spark DataFrames + vectorized Arrow/pandas
UDFs) with the query capabilities of the reference Rust crate
msalib/spatial-join (read-only at /root/reference): spatial joins on
Intersects/Contains/Within, proximity maps (inclusive epsilon-distance
joins), plus the scale-out additions the north rule mandates — cell
grid indexing, kNN joins, raster-tile<->vector assignment, skew
handling, and per-partition checkpoints.
"""

from .geom import (
    LINE,
    LINESTRING,
    POINT,
    POLYGON,
    RECT,
    TRIANGLE,
    BadCoordinateValue,
    BadMaxDistance,
    GeomBatch,
    LineStringTooSmall,
    PolygonExteriorTooSmall,
    ValidationError,
    validate_max_distance,
)

def __getattr__(name):
    # lazy re-exports that need pyspark (keep bare `import spatialjoin`
    # usable for the numpy-only kernel/oracle modules)
    if name in ("SpatialIndex", "Config", "validate_geoms"):
        from . import index

        return getattr(index, name)
    if name == "knn_join":
        from .knn import knn_join

        return knn_join
    if name == "assign_tiles":
        from .tiles import assign_tiles

        return assign_tiles
    raise AttributeError(name)


__all__ = [
    "SpatialIndex",
    "Config",
    "knn_join",
    "assign_tiles",
    "validate_geoms",
    "POINT",
    "LINE",
    "LINESTRING",
    "POLYGON",
    "RECT",
    "TRIANGLE",
    "GeomBatch",
    "ValidationError",
    "BadCoordinateValue",
    "BadMaxDistance",
    "LineStringTooSmall",
    "PolygonExteriorTooSmall",
    "validate_max_distance",
]

__version__ = "0.1.0"
