#!/usr/bin/env python
"""100x-shaped end-to-end rehearsal (round-4 ask #8): one sf10-scale
generate -> join -> rollup -> parquet-write run, STREAMED (the big side
is generated on the fly and never persisted/cached), under a
deliberately small driver/executor heap to smoke out memory ceilings
the sf0.1 suite cannot see.

Workloads (both write their rollup to parquet, the full pipeline a
training-data job runs):
  * rects_rollup : lineitem rects x SPARK_GRAFT_REHEARSAL_REP (default
    100 -> ~60M probe rects, the sf10 lineitem row count) joined
    against the part index (auto/broadcast; pure-JVM plan), rolled up
    to per-part counts.
  * pip_rollup   : customer points x 40*REP (same ~60M probe points)
    through the NON-broadcast shuffle-pairs route (the r5 production
    plan for slim probes at scale), rolled up to per-quad counts.

Metrics come from Spark's own status REST API after each job: peak JVM
heap over all executors (peakMemoryMetrics.JVMHeapMemory) and the
summed memory/disk spill across stages. Emits one JSON line and writes
BENCH/REHEARSAL.json; bench.py folds that file into its per-round
output so the numbers land in BENCH_r{N}.json without re-running 60M
rows every round.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("SPARK_GRAFT_REHEARSAL_REP", "100"))
# small on purpose: sf10-shaped data through a heap ~8x smaller than
# the sandbox's default 24g proves the pipeline streams instead of
# accumulating (a real executor gets a few GiB, not the whole box)
MEM = os.environ.get("SPARK_DRIVER_MEM", "6g")


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def _metrics(spark) -> dict:
    stages = _rest(spark, "/stages?status=complete")
    execs = _rest(spark, "/executors")
    peak = 0
    for e in execs:
        pm = e.get("peakMemoryMetrics") or {}
        peak = max(peak, int(pm.get("JVMHeapMemory", 0)))
    return {
        "mem_spill_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "disk_spill_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "peak_jvm_heap_bytes": peak,
    }


def main() -> None:
    os.environ["SPARK_DRIVER_MEM"] = MEM
    os.environ["SPARK_GRAFT_UI"] = "1"  # REST metrics need the UI server
    from pyspark.sql import functions as F

    from spatialjoin.index import SpatialIndex
    from spatialjoin.queries import LINEITEM_ID, _points_df, _quads_df, _rects_df
    from spatialjoin.sparkutil import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app="rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    def rep(df, f):
        reps = spark.range(f).select(F.col("id").alias("__rep"))
        return (
            df.crossJoin(F.broadcast(reps))
            .withColumn("id", F.col("id") * f + F.col("__rep"))
            .drop("__rep")
        )

    out: dict = {"rep": REP, "driver_mem": MEM, "sf": SF_DIR, "cpus": cpus}

    # -- 1: sf10-row-count rect join + rollup + write (pure JVM) ------
    li = _rects_df(spark, SF_DIR, "lineitem", f"({LINEITEM_ID})", id_expr=LINEITEM_ID)
    probe = rep(li, REP)  # ~600k x REP rows, generated, never cached
    n_probe = probe.count()
    parts = _rects_df(spark, SF_DIR, "part", "p_partkey")
    idx = SpatialIndex.build(spark, parts, validate=False)
    dest = "/tmp/rehearsal_rects_rollup"
    t0 = time.perf_counter()
    (
        idx.spatial_join(probe, how="intersects", validate=False, big_kinds={4})
        .groupBy("small_id").agg(F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite").parquet(dest)
    )
    dt = time.perf_counter() - t0
    n_out = spark.read.parquet(dest).agg(F.sum("n")).first()[0]
    out["rects_rollup"] = {
        "probe_rows": n_probe, "joined_rows": int(n_out),
        "wall_sec": round(dt, 2),
        "pairs_per_sec": round(n_out / dt, 1), **_metrics(spark),
    }
    idx.unpersist()

    # -- 2: same scale through the NON-broadcast shuffle-pairs PIP ----
    cust = _points_df(spark, SF_DIR, "customer", "c_custkey")
    probe2 = rep(cust, 40 * REP)  # 15k x 4000 = the same ~60M probes
    n_probe2 = probe2.count()
    quads = _quads_df(spark, SF_DIR, "supplier", "s_suppkey")
    idx2 = SpatialIndex.build(spark, quads, validate=False, broadcast=False)
    dest2 = "/tmp/rehearsal_pip_rollup"
    t0 = time.perf_counter()
    (
        idx2.spatial_join(probe2, how="contains", validate=False, big_kinds={0})
        .groupBy("small_id").agg(F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite").parquet(dest2)
    )
    dt2 = time.perf_counter() - t0
    n_out2 = spark.read.parquet(dest2).agg(F.sum("n")).first()[0]
    m2 = _metrics(spark)
    # stage metrics are cumulative across the app; report job-2 deltas
    for k in m2:
        if k != "peak_jvm_heap_bytes":
            m2[k] = m2[k] - out["rects_rollup"][k]
    out["pip_pairs_rollup"] = {
        "probe_rows": n_probe2, "joined_rows": int(n_out2),
        "wall_sec": round(dt2, 2),
        "pairs_per_sec": round(n_out2 / dt2, 1), **m2,
    }
    out["at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "REHEARSAL.json"), "w") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
