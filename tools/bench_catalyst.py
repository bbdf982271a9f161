"""Kernel path vs pure-Catalyst path for event sessionization.

Same deterministic input, same config (idle-only + terminators, no scan),
full feature set. The kernel path pays one Arrow round trip per partition
(mapInPandas); the Catalyst path is windows + aggregations inside
whole-stage codegen with zero Python workers. Also reports the
north-rule two-parallelism point for the Catalyst path (local[8] vs
local[32] on the same parquet input).

Usage: python tools/bench_catalyst.py [n_events]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from rustiflow_spark.config import EngineConfig
from rustiflow_spark.operators.event_features import (
    sessionize_events,
    sessionize_events_catalyst,
)
from rustiflow_spark.session import get_spark

CFG = dict(active_timeout=10_000_000, idle_timeout=1800, scan_mode="none")


def build_input(n: int, layout: str = "singleton") -> str:
    """layout='singleton': hashed keys, same-key gaps >> idle cut — every
    event its own session (stresses per-session overhead; output volume ==
    input volume, the documented pathology at large n). layout='blocked':
    200 consecutive events per key at 40 ms gaps — multi-event sessions cut
    by terminators (realistic featurization; output ~1% of input)."""
    spark = get_spark("gen", cores=8, shuffle_partitions=32)
    path = f"/tmp/catalyst_bench_events_{layout}.parquet"
    n_keys = max(200, n // 200)
    key = (
        F.pmod(F.xxhash64("id"), F.lit(n_keys))
        if layout == "singleton"
        else F.expr("id div 200")
    )
    ev = spark.range(n).select(
        key.alias("user_id"),
        (F.col("id") * 40_000).alias("ts_us"),
        F.col("id").alias("event_seq"),
        F.pmod(F.col("id"), F.lit(977)).cast("double").alias("n_tok"),
        F.pmod(F.col("id"), F.lit(5)).isin(0, 1).cast("int").alias("direction"),
        (F.pmod(F.col("id"), F.lit(131)) == 0).cast("int").alias("terminator"),
    )
    ev.write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def run(path: str, cores: int, variant: str) -> float:
    spark = get_spark(f"cat-bench-{variant}-{cores}", cores=cores,
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(path)
    cfg = EngineConfig(**CFG)
    fn = sessionize_events if variant == "kernel" else sessionize_events_catalyst
    feats = fn(ev, ["user_id"], cfg)
    # warmup = one FULL materialization: a limit(1) warmup interrupts the
    # mapInPandas tasks mid-stream, and a reused Python worker can come
    # back desynced on pyspark 4.1's single-threaded runner (observed as a
    # both-sides-reading deadlock on 64M-row runs)
    feats.write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        feats.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    spark.stop()
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    layout = sys.argv[2] if len(sys.argv) > 2 else "singleton"
    path = build_input(n, layout)
    print(f"input built: {n} events ({layout})", file=sys.stderr, flush=True)
    out = {"n_events": n, "layout": layout}
    for variant in ("kernel", "catalyst"):
        sec = run(path, 32, variant)
        out[f"{variant}_32_sec"] = round(sec, 3)
        out[f"{variant}_32_meps"] = round(n / sec / 1e6, 3)
        print(f"{variant}@32: {sec:.2f}s", file=sys.stderr, flush=True)
    sec8 = run(path, 8, "catalyst")
    out["catalyst_8_sec"] = round(sec8, 3)
    out["catalyst_8_meps"] = round(n / sec8 / 1e6, 3)
    out["catalyst_scaling_eff_8_to_32"] = round(
        (n / out["catalyst_32_sec"]) / (n / sec8) / 4.0, 3
    )
    out["speedup_catalyst_vs_kernel_32"] = round(
        out["kernel_32_sec"] / out["catalyst_32_sec"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
