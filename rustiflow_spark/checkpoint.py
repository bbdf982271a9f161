"""Per-partition checkpoint / resume with lineage + metrics manifests.

North-rule requirement (not in the reference — its resume story is
"rerun", SURVEY.md §4 #4): a long feature-extraction job over 10^12
sequences must be resumable. Work is split into deterministic hash buckets
of the entity key; each completed bucket writes its output under
``out/bucket=<i>/`` plus a manifest row (bucket id, input fingerprint, row
counts, timings). Resume skips buckets whose manifest row exists with a
matching fingerprint — an anti-join of the bucket list against the
manifest, not a data-level anti-join.

At cluster scale each bucket is itself a full Spark job over 1/N of the
keyspace (partition pruning via the bucket predicate pushes the hash filter
into the scan), so the driver-side loop is N jobs of 1/N size — the
standard incremental-backfill shape.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _bucket_expr(key_cols: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets))


def _manifest_path(out_path: str) -> str:
    return os.path.join(out_path, "_checkpoints", "manifest.jsonl")


def read_manifest(out_path: str) -> dict[int, dict]:
    path = _manifest_path(out_path)
    done: dict[int, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                row = json.loads(line)
                done[row["bucket"]] = row
    return done


def run_with_checkpoints(
    df: DataFrame,
    key_cols: list[str],
    out_path: str,
    process_fn: Callable[[DataFrame], DataFrame],
    n_buckets: int = 16,
    input_fingerprint: str | None = None,
) -> dict:
    """Process df bucket-by-bucket, writing parquet per bucket + manifest.

    process_fn maps the bucket's input DataFrame to its output DataFrame.
    Returns a summary dict {completed, skipped, total_rows, seconds}.
    """
    os.makedirs(os.path.join(out_path, "_checkpoints"), exist_ok=True)
    fingerprint = input_fingerprint or "unspecified"
    done = read_manifest(out_path)
    manifest_file = _manifest_path(out_path)

    bucketed = df.withColumn("__bucket", _bucket_expr(key_cols, n_buckets))
    completed, skipped, total_rows = 0, 0, 0
    t_start = time.time()
    with open(manifest_file, "a") as mf:
        for b in range(n_buckets):
            prev = done.get(b)
            if prev is not None and prev.get("fingerprint") == fingerprint:
                skipped += 1
                continue
            t0 = time.time()
            part = bucketed.filter(F.col("__bucket") == b).drop("__bucket")
            result = process_fn(part)
            dest = os.path.join(out_path, f"bucket={b}")
            # row count observed during the write job itself — no re-read of
            # the bucket's output just to count rows
            from pyspark.sql import Observation

            obs = Observation(f"bucket_{b}_rows")
            result = result.observe(obs, F.count(F.lit(1)).alias("n"))
            result.write.mode("overwrite").parquet(dest)
            n = int(obs.get["n"])
            row = {
                "bucket": b,
                "fingerprint": fingerprint,
                "rows": n,
                "seconds": round(time.time() - t0, 3),
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "key_cols": key_cols,
            }
            mf.write(json.dumps(row) + "\n")
            mf.flush()
            completed += 1
            total_rows += n
    return {
        "completed": completed,
        "skipped": skipped,
        "total_rows": total_rows,
        "seconds": round(time.time() - t_start, 3),
    }


def read_output(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_path, "bucket=*"))
