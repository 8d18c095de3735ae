"""Structured Streaming over the cell grid.

The reference crate's "streaming" is pull-based bounded-memory
iterators (README.md:206-213), not event-time streaming — SURVEY.md §2.2
records that. This module adds the Spark-native streaming counterpart
anyway: a watermarked, windowed per-cell aggregation over a stream of
located events, plus a stream-static spatial enrichment join against a
built SpatialIndex's cell table. Tested end-to-end with a file stream
(tests write parquet increments) — the same code runs on Kafka/rate
sources unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .grid import Grid
from .index import SpatialIndex, _clamped_cell_coord


def with_event_cells(events: DataFrame, grid: Grid, res: int,
                     x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Assign each (possibly streaming) event row its grid cell —
    stateless column math, fully streamable."""
    n = 1 << res
    cw, ch = grid.cell_size(res)
    cx = _clamped_cell_coord(F.col(x_col), grid.x0, cw, n)
    cy = _clamped_cell_coord(F.col(y_col), grid.y0, ch, n)
    return events.withColumn(
        "cell",
        F.lit(res << 58).cast("long").bitwiseOR(F.shiftleft(cx, 29)).bitwiseOR(cy),
    )


def windowed_cell_counts(events: DataFrame, grid: Grid, res: int,
                         ts_col: str = "ts", window: str = "10 seconds",
                         watermark: str = "30 seconds") -> DataFrame:
    """Watermarked tumbling-window per-cell event counts + value sums —
    late rows beyond the watermark are dropped by the engine."""
    cells = with_event_cells(events, grid, res)
    return (
        cells.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("cell"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "cell", "n_events", "sum_value",
        )
    )


def enrich_stream_with_index(events: DataFrame, index: SpatialIndex,
                             x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Stream-static join: tag each streaming event with the indexed
    (small-side) geometries whose cell it lands in — the streaming
    filter phase of a spatial join; exact refine can follow downstream
    in foreachBatch where batch semantics apply."""
    cells = with_event_cells(events, index.grid, index.resolution, x_col, y_col)
    small = index.small_cells.select("cell", "small_id")
    return cells.join(small, on="cell", how="inner")
