#!/usr/bin/env python3
"""Scaling-efficiency benchmark: the same job on the same input at two
parallelism levels (local[N] vs local[4N]) — the sandbox stand-in for the
north rule's N vs 4N executor criterion (no real cluster available here;
see BASELINE.md "Our target").

Workload: the flagship sessionized-feature extraction over a replicated
events table (input scaled so the job runs long enough to measure), plus
the OI Welford aggregate and the as-of join. Each subprocess prints one
JSON line; the parent computes efficiency = (T_N / T_4N) / 4.

Usage: python tools/scale_bench.py [--rep 10] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO_ROOT"])
from pyspark.sql import functions as F
import __spark_entry__ as em
from rustiflow_spark.session import get_spark
from rustiflow_spark.operators.event_features import sessionize_events
from rustiflow_spark.operators.asof import asof_join

cores = int(os.environ["BENCH_CORES"])
rep = int(os.environ["BENCH_REP"])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(f"scale-{cores}", cores=cores, shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")

ev = em._events(spark, sf_dir)
# replicate input rep x with distinct key space per replica so both data
# volume AND key cardinality scale (no artificial skew collapse)
reps = spark.range(rep).withColumnRenamed("id", "rep")
big = (
    ev.crossJoin(reps)
    .withColumn("user_id", F.col("user_id") + F.col("rep") * 1000)
    .withColumn("event_seq", F.col("event_seq") + F.col("rep") * 10_000_000)
    .drop("rep")
)
big = big.persist()
n = big.count()

def noop(df):
    df.write.mode("overwrite").format("noop").save()

from rustiflow_spark.config import EngineConfig
# flow-like regime: multi-event sessions (2h idle over ~40min mean gaps),
# so session output volume resembles flow extraction rather than the
# one-event-per-session degenerate case
cfg = EngineConfig(active_timeout=10_000_000, idle_timeout=7200, scan_mode="none")
right = big.filter(F.col("event_type") == "signup") \
    .groupBy("user_id", "ts_us").agg(F.max("value").alias("sv"))

jobs = {
    "sessionize": lambda: noop(sessionize_events(big, ["user_id"], cfg, value_col="value")),
    "welford": lambda: noop(big.groupBy("user_id").agg(
        F.count("*"), F.sum("value"), F.avg("value"), F.stddev_pop("value"),
        F.min("value"), F.max("value"))),
    "asof": lambda: noop(asof_join(
        big.select("user_id", "ts_us", "event_seq", "value"), right, by="user_id")),
}
# warmup every job (codegen + one python worker per core)
for fn in jobs.values():
    fn()

import statistics
reps_n = int(os.environ.get("BENCH_REPEATS", "3"))
times = {k: [] for k in jobs}
for _ in range(reps_n):
    for k, fn in jobs.items():
        t0 = time.perf_counter()
        fn()
        times[k].append(time.perf_counter() - t0)
med = {k: statistics.median(v) for k, v in times.items()}
total = sum(med.values())
print(json.dumps({
    "cores": cores, "rows": n,
    "sessionize_sec": round(med["sessionize"], 3),
    "welford_sec": round(med["welford"], 3),
    "asof_sec": round(med["asof"], 3),
    "total_sec": round(total, 3),
    "events_per_sec_sessionize": round(n / med["sessionize"], 1),
}))
spark.stop()
"""


def run(cores: int, rep: int) -> dict:
    env = dict(os.environ)
    env["BENCH_CORES"] = str(cores)
    env["BENCH_REP"] = str(rep)
    env["REPO_ROOT"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, capture_output=True, text=True
    )
    for line in out.stdout.strip().splitlines()[::-1]:
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    lo = run(args.low, args.rep)
    hi = run(args.high, args.rep)
    ratio = args.high // args.low
    eff = {
        k: round((lo[f"{k}_sec"] / hi[f"{k}_sec"]) / ratio, 3)
        for k in ("sessionize", "welford", "asof", "total")
    }
    result = {
        "low": lo,
        "high": hi,
        "parallelism_ratio": ratio,
        "scaling_efficiency": eff,
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
