"""assign_sessions kernel path vs pure-Catalyst path, with array payloads.

The point of the Catalyst annotation plan: the kernel path ships every
column — including the token arrays, which are ~97% of the bytes —
through Arrow to Python and back; the window plan never moves them out of
Tungsten rows. Input: n events with a 128-int token array each.

Usage: python tools/bench_annotation.py [n_events]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from rustiflow_spark.config import EngineConfig
from rustiflow_spark.operators.event_features import assign_sessions
from rustiflow_spark.session import get_spark

CFG = dict(active_timeout=10_000_000, idle_timeout=1800, scan_mode="none")


def build_input(n: int) -> str:
    spark = get_spark("gen", cores=8, shuffle_partitions=32)
    path = "/tmp/annotation_bench_events.parquet"
    n_keys = max(200, n // 200)
    ev = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(n_keys)).alias("user_id"),
        (F.col("id") * 40_000).alias("ts_us"),
        F.col("id").alias("event_seq"),
        (F.pmod(F.col("id"), F.lit(131)) == 0).cast("int").alias("terminator"),
        F.transform(
            F.sequence(F.lit(0), F.lit(127)),
            lambda x: F.pmod(F.col("id") * 31 + x.cast("long"), F.lit(50257)).cast("int"),
        ).alias("tokens"),
    )
    ev.write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def run(path: str, cores: int, strategy: str) -> float:
    spark = get_spark(f"ann-bench-{strategy}", cores=cores,
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(path)
    ann = assign_sessions(ev, ["user_id"], EngineConfig(**CFG),
                          strategy=strategy)
    # warmup = one FULL materialization: a limit(1) warmup interrupts
    # mapInPandas tasks mid-stream and a reused Python worker can come
    # back desynced on pyspark 4.1's single-threaded runner (observed as
    # a both-sides-reading deadlock at 64M rows; tools/bench_catalyst.py)
    ann.write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        ann.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    spark.stop()
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    path = build_input(n)
    print(f"input built: {n} events x 128-token arrays", file=sys.stderr, flush=True)
    out = {"n_events": n, "tokens_per_event": 128}
    for strategy in ("kernel", "catalyst"):
        sec = run(path, 32, strategy)
        out[f"{strategy}_32_sec"] = round(sec, 3)
        out[f"{strategy}_32_meps"] = round(n / sec / 1e6, 3)
        print(f"{strategy}@32: {sec:.2f}s", file=sys.stderr, flush=True)
    out["speedup_catalyst_vs_kernel_32"] = round(
        out["kernel_32_sec"] / out["catalyst_32_sec"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
