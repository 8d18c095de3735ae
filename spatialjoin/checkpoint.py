"""Resumable bucketed execution with per-partition lineage manifests.

North rule: "per-partition lineage checkpoints enabling resume". The
unit of recovery is a BUCKET — a deterministic hash range of a key
column (for spatial joins, the probe id or the cell). Each bucket's
output is written write-audit-publish style:

  1. ONE upstream execution writes every remaining bucket at once via
     ``partitionBy(__bucket)`` into <out>/_tmp_run/ (the upstream
     DataFrame is NOT re-executed per bucket)
  2. per bucket: atomically rename to <out>/bucket=<i>/
  3. per bucket: write lineage manifest <out>/_manifests/bucket-<i>.json
     (rows + bytes from the parquet footers, wall seconds of the write
     pass, engine config lineage)

A re-run with the same ``out_dir`` skips every bucket whose manifest
exists (resume-from-checkpoint == anti-join of done buckets, done
driver-side on the manifest listing), recomputes ONLY the rest in a
single filtered pass, and yields byte-identical union output. Works on
any filesystem Spark can write (local here; object stores via their
committers on a cluster).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ResumableRun:
    def __init__(self, out_dir: str, n_buckets: int = 16, key_col: str = "big_id",
                 lineage: dict | None = None):
        self.out_dir = out_dir
        self.n_buckets = int(n_buckets)
        self.key_col = key_col
        self.lineage = lineage or {}
        os.makedirs(self._mdir, exist_ok=True)

    @property
    def _mdir(self) -> str:
        return os.path.join(self.out_dir, "_manifests")

    def _manifest_path(self, i: int) -> str:
        return os.path.join(self._mdir, f"bucket-{i}.json")

    def done_buckets(self) -> set[int]:
        if not os.path.isdir(self._mdir):
            return set()
        out = set()
        for f in os.listdir(self._mdir):
            if f.startswith("bucket-") and f.endswith(".json"):
                out.add(int(f[len("bucket-"):-len(".json")]))
        return out

    def run(self, df_factory: Callable[[], DataFrame],
            fail_after: int | None = None) -> list[int]:
        """Execute all not-yet-done buckets in ONE upstream pass:
        the result is tagged with pmod(xxhash64(key), n_buckets),
        filtered to the remaining buckets, and written once with
        partitionBy — the upstream join is computed exactly once per
        run() call, not once per bucket. Publication (rename +
        manifest) is per bucket, so a crash mid-publish resumes from
        the first unpublished bucket. Returns buckets published this
        call. ``fail_after`` is test-only fault injection (raises after
        publishing that many buckets)."""
        done = self.done_buckets()
        todo = [i for i in range(self.n_buckets) if i not in done]
        if not todo:
            return []
        t0 = time.perf_counter()
        staged = df_factory().withColumn(
            "__bucket", F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets))
        )
        if len(todo) < self.n_buckets:
            staged = staged.where(F.col("__bucket").isin([int(i) for i in todo]))
        tmp_root = os.path.join(self.out_dir, "_tmp_run")
        shutil.rmtree(tmp_root, ignore_errors=True)
        staged.write.mode("overwrite").partitionBy("__bucket").parquet(tmp_root)
        wall = round(time.perf_counter() - t0, 4)
        computed = []
        try:
            for i in todo:
                src = os.path.join(tmp_root, f"__bucket={i}")
                final = os.path.join(self.out_dir, f"bucket={i}")
                rows = 0
                nbytes = 0
                shutil.rmtree(final, ignore_errors=True)
                if os.path.isdir(src):
                    for root, _, files in os.walk(src):
                        for f in files:
                            if f.endswith(".parquet"):
                                p = os.path.join(root, f)
                                nbytes += os.path.getsize(p)
                                rows += pq.ParquetFile(p).metadata.num_rows
                    os.replace(src, final)
                else:
                    # empty bucket: write a schema-bearing empty parquet
                    # (limit(0) folds to an empty relation — no upstream
                    # execution) so read()'s bucket=* glob always infers
                    # the output schema, even when EVERY bucket is empty
                    staged.drop("__bucket").limit(0).write.mode(
                        "overwrite"
                    ).parquet(final)
                manifest = {
                    "bucket": i,
                    "key_col": self.key_col,
                    "n_buckets": self.n_buckets,
                    "rows": rows,
                    "bytes": nbytes,
                    "wall_sec": wall,  # shared: one write pass covers all buckets
                    "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "lineage": self.lineage,
                }
                tmp_m = self._manifest_path(i) + ".tmp"
                with open(tmp_m, "w") as fh:
                    json.dump(manifest, fh)
                os.replace(tmp_m, self._manifest_path(i))
                computed.append(i)
                if fail_after is not None and len(computed) >= fail_after:
                    raise RuntimeError(f"injected failure after {fail_after} buckets")
        finally:
            shutil.rmtree(tmp_root, ignore_errors=True)
        return computed

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "bucket=*"))
