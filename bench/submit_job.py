#!/usr/bin/env python
"""spark-submit entry point (north rule: 'runs via spark-submit
--py-files on multi-executor clusters').

Usage:
    cd /root/repo && zip -qr /tmp/spatialjoin.zip spatialjoin
    spark-submit --master local[8] --py-files /tmp/spatialjoin.zip \
        bench/submit_job.py /root/testdata/sf0.001

Runs the flagship PIP join + a proximity map + tile assignment through
the packaged module and prints one JSON line with row counts and
per-partition metrics — the same code path a cluster deployment uses
(only --master changes).
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from spatialjoin.index import SpatialIndex
from spatialjoin.metrics import job_metrics_json
from spatialjoin.queries import (
    TILE_EXTENT,
    TILE_ZOOM,
    _points_df,
    _quads_df,
    _rects_df,
)
from spatialjoin.tiles import assign_tiles


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("spatialjoin-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    quads = _quads_df(spark, sf_dir, "supplier", "s_suppkey")
    pts = _points_df(spark, sf_dir, "customer", "c_custkey")
    idx = SpatialIndex.build(spark, quads, validate=True)
    pip = idx.spatial_join(pts, how="contains", big_kinds={0})
    prox_idx = SpatialIndex.build(spark, _points_df(spark, sf_dir, "supplier", "s_suppkey"),
                                  max_distance=2.0, validate=False)
    prox = prox_idx.proximity_map(pts, validate=False, big_kinds={0})
    tiles = assign_tiles(_rects_df(spark, sf_dir, "part", "p_partkey"),
                         zoom=TILE_ZOOM, extent=TILE_EXTENT, validate=False)
    out = {
        "pip_rows": pip.count(),
        "prox_rows": prox.count(),
        "tile_rows": tiles.count(),
        "pip_metrics": json.loads(job_metrics_json(pip, idx.small_cells)),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
