"""Resumable bucketed execution with per-partition lineage manifests.

North rule: "per-partition lineage checkpoints enabling resume". The
unit of recovery is a BUCKET — a deterministic hash range of a key
column (for spatial joins, the probe id or the cell). Each bucket's
output is written write-audit-publish style:

  1. compute bucket slice -> write to  <out>/_tmp/bucket=<i>/
  2. atomically rename to             <out>/bucket=<i>/
  3. write lineage manifest           <out>/_manifests/bucket-<i>.json
     (rows, bytes, wall seconds, input fingerprint, engine config)

A re-run with the same ``out_dir`` skips every bucket whose manifest
exists (resume-from-checkpoint == anti-join of done buckets, done
driver-side on the manifest listing), recomputes the rest, and yields
byte-identical union output. Works on any filesystem Spark can write
(local here; object stores via their committers on a cluster).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

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
        """Execute all not-yet-done buckets. ``df_factory`` builds the
        full result DataFrame (lazily); each bucket filters it by
        pmod(hash(key), n_buckets). Returns buckets computed this call.
        ``fail_after`` is test-only fault injection."""
        done = self.done_buckets()
        computed = []
        df = df_factory()
        for i in range(self.n_buckets):
            if i in done:
                continue
            t0 = time.perf_counter()
            part = df.where(F.pmod(F.xxhash64(F.col(self.key_col)), self.n_buckets) == i)
            tmp = os.path.join(self.out_dir, "_tmp", f"bucket={i}")
            final = os.path.join(self.out_dir, f"bucket={i}")
            shutil.rmtree(tmp, ignore_errors=True)
            part.write.mode("overwrite").parquet(tmp)
            rows = 0
            nbytes = 0
            for root, _, files in os.walk(tmp):
                for f in files:
                    if f.endswith(".parquet"):
                        nbytes += os.path.getsize(os.path.join(root, f))
            shutil.rmtree(final, ignore_errors=True)
            os.replace(tmp, final)
            manifest = {
                "bucket": i,
                "key_col": self.key_col,
                "n_buckets": self.n_buckets,
                "bytes": nbytes,
                "wall_sec": round(time.perf_counter() - t0, 4),
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
        return computed

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "bucket=*"))
