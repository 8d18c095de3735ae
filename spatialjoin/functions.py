"""Registered SQL function surface.

``register_functions(spark)`` exposes the geometry kernels and the cell
grid to Spark SQL so ad-hoc queries can use them without the engine
API:

  sj_intersects(k1, c1, r1, k2, c2, r2)      -> boolean
  sj_contains(k1, c1, r1, k2, c2, r2)        -> boolean  (1 contains 2)
  sj_distance(k1, c1, r1, k2, c2, r2)        -> double
  sj_cell_of(x, y, res, x0, y0, x1, y1)      -> bigint   (grid cell id)

The predicate functions are Arrow-batched pandas UDFs over the same
vectorized kernels the engine's refine uses (semantics identical,
including the reference quirks); sj_cell_of is pure column math wrapped
for SQL ergonomics. These are for exploration/one-off queries — the
engine's join operators remain the scale path (they keep Catalyst in
charge of the filter phase instead of evaluating predicates per pair).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from . import kernels
from .geom import GeomBatch


def _pair_udf(fn, out_dtype, spark_type):
    @pandas_udf(spark_type)
    def udf(k1: pd.Series, c1: pd.Series, r1: pd.Series,
            k2: pd.Series, c2: pd.Series, r2: pd.Series) -> pd.Series:
        n = len(k1)
        if n == 0:
            return pd.Series([], dtype=out_dtype)
        A = GeomBatch.from_columns(k1.to_numpy(), c1.to_list(), r1.to_list())
        B = GeomBatch.from_columns(k2.to_numpy(), c2.to_list(), r2.to_list())
        i = np.arange(n, dtype=np.int64)
        return pd.Series(fn(A, i, B, i))

    return udf


def register_functions(spark: SparkSession) -> None:
    spark.udf.register("sj_intersects", _pair_udf(kernels.intersects, bool, T.BooleanType()))
    spark.udf.register("sj_contains", _pair_udf(kernels.contains, bool, T.BooleanType()))
    spark.udf.register("sj_distance", _pair_udf(kernels.distance, np.float64, T.DoubleType()))

    @pandas_udf(T.LongType())
    def sj_cell_of(x: pd.Series, y: pd.Series, res: pd.Series,
                   x0: pd.Series, y0: pd.Series, x1: pd.Series, y1: pd.Series) -> pd.Series:
        from .grid import Grid

        r = int(res.iloc[0])
        g = Grid((float(x0.iloc[0]), float(y0.iloc[0]), float(x1.iloc[0]), float(y1.iloc[0])))
        return pd.Series(g.cell_of(x.to_numpy(), y.to_numpy(), r))

    spark.udf.register("sj_cell_of", sj_cell_of)
