"""Per-partition / per-cell job metrics (north rule: "emitting
per-partition row/byte/skew metrics").

All metrics are computed as ordinary aggregations over
``spark_partition_id()`` / cell columns — no listeners or side
channels, so they work identically under spark-submit on a cluster.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_metrics(df: DataFrame) -> DataFrame:
    """DF[partition_id, rows, approx_bytes] for the physical partitions
    of ``df`` as currently planned."""
    size_cols = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in ("string", "binary"):
            size_cols.append(F.coalesce(F.octet_length(f.name), F.lit(0)))
        elif t.startswith("array<double") or t.startswith("array<float"):
            size_cols.append(F.coalesce(F.size(f.name) * 8, F.lit(0)))
        elif t.startswith("array"):
            size_cols.append(F.coalesce(F.size(f.name) * 4, F.lit(0)))
        else:
            size_cols.append(F.lit(8))
    row_bytes = size_cols[0]
    for c in size_cols[1:]:
        row_bytes = row_bytes + c
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__bytes", row_bytes.cast("long"))
        .groupBy(F.col("__pid").alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"), F.sum("__bytes").alias("approx_bytes"))
    )


def cell_histogram(cells_df: DataFrame, cell_col: str = "cell") -> DataFrame:
    """Rows per cell — the skew diagnostic feeding hot_threshold."""
    return cells_df.groupBy(cell_col).agg(F.count(F.lit(1)).alias("rows"))


def skew_stats(cells_df: DataFrame, cell_col: str = "cell") -> dict:
    """Summary skew metrics of the cell distribution: quantiles, max,
    and top-cell share (share of all rows in the heaviest cell)."""
    hist = cell_histogram(cells_df, cell_col)
    row = hist.select(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("rows").alias("total_rows"),
        F.max("rows").alias("max_rows"),
        F.expr("percentile_approx(rows, array(5e-1, 9e-1, 99e-2))").alias("q"),
    ).first()
    if row.n_cells == 0:
        return {"n_cells": 0, "total_rows": 0}
    return {
        "n_cells": int(row.n_cells),
        "total_rows": int(row.total_rows),
        "max_cell_rows": int(row.max_rows),
        "p50_cell_rows": float(row.q[0]),
        "p90_cell_rows": float(row.q[1]),
        "p99_cell_rows": float(row.q[2]),
        "top_cell_share": float(row.max_rows) / float(row.total_rows),
    }


def job_metrics_json(result_df: DataFrame, cells_df: DataFrame | None = None) -> str:
    """One JSON blob with per-partition result metrics (+ optional cell
    skew of the index) — what the bench job emits per run."""
    parts = [r.asDict() for r in partition_metrics(result_df).collect()]
    out = {
        "partitions": len(parts),
        "rows": int(sum(p["rows"] for p in parts)),
        "approx_bytes": int(sum(p["approx_bytes"] for p in parts)),
        "max_partition_rows": max((p["rows"] for p in parts), default=0),
        "partition_rows_top_share": (
            max((p["rows"] for p in parts), default=0)
            / max(sum(p["rows"] for p in parts), 1)
        ),
    }
    if cells_df is not None:
        out["cell_skew"] = skew_stats(cells_df)
    return json.dumps(out)
