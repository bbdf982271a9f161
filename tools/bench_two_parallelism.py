"""North-rule two-cluster-size evidence at the Spark level: the same
sessionization job on the same input at local[N] and local[4N], reporting
throughput at both plus scaling efficiency.

The input is sized so each of the 4N cores still gets multi-100k-row
blocks (small inputs saturate below 4N and measure scheduler overhead, not
the engine). Process-level executor scaling lives in tools/kernel_scale.py.

Usage: python tools/bench_two_parallelism.py [n_events] [low_cores]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from rustiflow_spark.config import EngineConfig
from rustiflow_spark.operators.event_features import sessionize_events
from rustiflow_spark.session import get_spark


def build_input(n: int) -> str:
    spark = get_spark("gen", cores=8, shuffle_partitions=32)
    path = "/tmp/two_par_events.parquet"
    ev = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(n // 200)).alias("user_id"),
        (F.col("id") * 40_000).alias("ts_us"),
        F.col("id").alias("event_seq"),
        F.pmod(F.col("id"), F.lit(977)).cast("double").alias("value"),
        F.lit(0).alias("direction"),
        F.lit(0).alias("terminator"),
    )
    ev.write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def run(path: str, cores: int, n: int, strategy: str = "kernel") -> float:
    spark = get_spark(f"two-par-{cores}-{strategy}", cores=cores,
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(path)
    cfg = EngineConfig(active_timeout=10_000_000, idle_timeout=1800,
                       scan_mode="none")
    feats = sessionize_events(ev, ["user_id"], cfg, value_col="value",
                              features=["value", "iat", "subflow"],
                              strategy=strategy)
    # warm up codegen + Python workers, then best-of-2
    # warmup = one FULL materialization: a limit(1) warmup interrupts
    # mapInPandas tasks mid-stream and a reused Python worker can come
    # back desynced on pyspark 4.1's single-threaded runner (observed as
    # a both-sides-reading deadlock at 64M rows; tools/bench_catalyst.py)
    feats.write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        feats.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    spark.stop()
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = low * 4
    path = build_input(n)
    out = {"n_events": n, "low_cores": low, "high_cores": high}
    for strategy in ("kernel", "catalyst"):
        t_low = run(path, low, n, strategy)
        t_high = run(path, high, n, strategy)
        out.update({
            f"{strategy}_low_sec": round(t_low, 2),
            f"{strategy}_high_sec": round(t_high, 2),
            f"{strategy}_low_events_per_sec": round(n / t_low),
            f"{strategy}_high_events_per_sec": round(n / t_high),
            f"{strategy}_scaling_efficiency": round(
                (n / t_high) / (4 * n / t_low), 3
            ),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
