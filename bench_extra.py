#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (bench.py is FROZEN for
driver measurement; everything exploratory lives here).

Modes (positional arg):
  time  [names...]  - per-query wall via the SAME .count() methodology as
                      bench.py, repeat N (default 3), plus a noop-sink
                      wall (guide section 1.4: eagerly computes every
                      column, no optimizer pruning) for each query.
  plans [names...]  - dump .explain("formatted") of each query to
                      plans/<tag>/<name>_<suffix>.txt  (env
                      SPARK_GRAFT_PLAN_TAG, default r06; suffix env
                      SPARK_GRAFT_PLAN_SUFFIX, default "before").

Env contract matches bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import io
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spatialjoin import queries as Q  # noqa: E402
from spatialjoin.sparkutil import get_spark  # noqa: E402

DEFAULT = [
    "pip_quad_contains", "pip_quad_cogroup", "pip_quad_pairs",
    "pip_rect_contains", "rects_intersect", "rects_intersect_cogroup",
    "prox_points", "knn_points", "tile_assign",
]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "3"))
    spark = get_spark(cpus=cpus, app=f"spatialjoin-extra-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if mode == "plans":
            tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r06")
            suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
            outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "plans", tag)
            os.makedirs(outdir, exist_ok=True)
            for name in names:
                df = Q.QUERIES[name](spark, sf_dir)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                path = os.path.join(outdir, f"{name}_{suffix}.txt")
                with open(path, "w") as fh:
                    fh.write(f"-- {name} @ {sf_dir} cpus={cpus}\n")
                    fh.write(buf.getvalue())
                print("wrote", path)
            return
        # time mode: warmup at tiny scale (JIT + python workers), then
        # best-of-N count() wall (bench.py methodology) + one noop wall
        warm_dir = sf_dir.replace("sf0.1", "sf0.001") if "sf0.1" in sf_dir else sf_dir
        for name in names:
            Q.QUERIES[name](spark, warm_dir).count()
        out = {}
        for name in names:
            fn = Q.QUERIES[name]
            best = None
            for _ in range(max(repeat, 1)):
                spark.sparkContext.setJobDescription(f"time:{name}")
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            out[name] = {"count_best": round(best, 4), "noop": round(noop, 4),
                         "rows": n}
            print(json.dumps({name: out[name]}), flush=True)
        print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "repeat": repeat,
                          "queries": out}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
