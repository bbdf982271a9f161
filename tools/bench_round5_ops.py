"""Scale bench for the round-5 feature-engineering additions: leakage-free
encoders (target_encode/quantile_bin/zscore/backfill), the multi-table
point-in-time join, and the CDC pair (merge_upsert/scd2).

Inputs are synthesized in-query (spark.range + hash arithmetic) so any
scale point runs without external data. Every operator here is pure
Catalyst — the bench verifies the shapes stay window-one-shuffle /
broadcast-join at scale and records throughput for the two-parallelism
scaling table (run twice: cores=8 and cores=32).

Usage: python tools/bench_round5_ops.py [n_events] [cores]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from rustiflow_spark.operators.asof import point_in_time_join
from rustiflow_spark.operators.cdc import merge_upsert, scd2_history
from rustiflow_spark.operators.encoding import (
    quantile_bin,
    target_encode_expanding,
    zscore_normalize,
)
from rustiflow_spark.operators.windows import forward_fill
from rustiflow_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DAY_US = 86_400_000_000


def synth(spark, n):
    return spark.range(n).select(
        F.col("id").alias("event_seq"),
        F.abs(F.xxhash64("id") % DAY_US).alias("ts_us"),
        F.abs(F.xxhash64("id", F.lit(1)) % 1_000_000).alias("user_id"),
        (F.abs(F.xxhash64("id", F.lit(2)) % 100_000) / 1000.0).alias("value"),
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("cat"),
    )


def timed(label, df, n_rows):
    # checksum EVERY output column: a bare count() lets Catalyst prune the
    # window/join columns entirely and times the scan, not the operator
    t0 = time.time()
    agg = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*df.columns) % 1_000_000_007).alias("chk"),
    ).collect()[0]
    cnt = agg["n"]
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "op": label,
                "rows_in": n_rows,
                "rows_out": cnt,
                "sec": round(dt, 2),
                "mrows_per_sec": round(n_rows / dt / 1e6, 2),
                "cores": CORES,
            }
        ),
        flush=True,
    )
    return dt


def main():
    spark = get_spark("bench-r5", cores=CORES, shuffle_partitions=CORES)
    ev = synth(spark, N)
    ev.write.mode("overwrite").parquet("/tmp/bench_r5_ev.parquet")
    ev = spark.read.parquet("/tmp/bench_r5_ev.parquet")

    total = {}
    total["target_encode"] = timed(
        "target_encode",
        target_encode_expanding(ev, "cat", "value", "ts_us", order_col="event_seq"),
        N,
    )
    total["quantile_bin"] = timed(
        "quantile_bin", quantile_bin(ev, "value", 16, by="cat", order_col="event_seq"), N
    )
    total["zscore"] = timed("zscore", zscore_normalize(ev, ["value"], by="cat"), N)
    total["backfill"] = timed(
        "backfill",
        forward_fill(
            ev.withColumn(
                "v", F.when(F.col("event_seq") % 5 != 0, F.col("value"))
            ),
            ["user_id"],
            "ts_us",
            ["v"],
            order_col="event_seq",
        ),
        N,
    )

    # PIT: spine of N events against two dimension tables of N/100 rows each
    dim1 = ev.where("event_seq % 100 = 0").selectExpr(
        "user_id", "ts_us", "value as f1"
    )
    dim2 = ev.where("event_seq % 100 = 1").selectExpr(
        "user_id", "ts_us", "value as f2"
    )
    total["point_in_time"] = timed(
        "point_in_time_2tables",
        point_in_time_join(
            ev.select("user_id", "ts_us", "event_seq"),
            [(dim1, "_a"), (dim2, "_b")],
            by="user_id",
        ),
        N,
    )

    # CDC: 10% changeset (2 competing versions per touched key) + 1% inserts
    snap = ev.selectExpr("event_seq as k", "user_id", "ts_us", "value")
    chg = (
        snap.where("k % 10 = 0")
        .selectExpr("k", "user_id", "ts_us", "value + 1 as value", "1 as seq",
                    "k % 40 = 0 as is_delete")
        .unionByName(
            snap.where("k % 20 = 0").selectExpr(
                "k", "user_id", "ts_us", "value + 2 as value", "2 as seq",
                "k % 40 = 0 as is_delete"
            )
        )
        .unionByName(
            snap.where("k % 100 = 7").selectExpr(
                f"k + {N * 10} as k", "user_id", "ts_us", "value", "1 as seq",
                "false as is_delete"
            )
        )
    )
    total["merge_upsert"] = timed(
        "merge_upsert_10pct", merge_upsert(snap, chg, ["k"], "seq", "is_delete"), N
    )
    total["scd2"] = timed(
        "scd2_history",
        scd2_history(ev, ["user_id"], "ts_us", ["cat"], order_col="event_seq"),
        N,
    )

    print(
        json.dumps(
            {
                "metric": "round5_ops_total",
                "n": N,
                "cores": CORES,
                "total_sec": round(sum(total.values()), 2),
                "per_op_sec": {k: round(v, 2) for k, v in total.items()},
            }
        ),
        flush=True,
    )
    spark.stop()




def skew_bench():
    """Hot-category comparison: plain expanding encoder (one sort task per
    category) vs the split prefix-scan variant. Run via:
    python -c "import sys; sys.argv=['x','16000000','32']; \
               exec(open('tools/bench_round5_ops.py').read().split('if __name')[0]); skew_bench()"
    or python tools/bench_round5_ops.py N CORES skew
    """
    spark = get_spark("bench-r5-skew", cores=CORES, shuffle_partitions=CORES)
    # 50% of rows land in one category: the adversarial hot key
    ev = spark.range(N).select(
        F.col("id").alias("event_seq"),
        F.abs(F.xxhash64("id") % DAY_US).alias("ts_us"),
        (F.abs(F.xxhash64("id", F.lit(2)) % 100_000)).alias("v_int"),
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 50).cast("string")))
        .alias("cat"),
    )
    ev.write.mode("overwrite").parquet("/tmp/bench_r5_skew.parquet")
    ev = spark.read.parquet("/tmp/bench_r5_skew.parquet")
    timed(
        "target_encode_plain_hotkey",
        target_encode_expanding(ev, "cat", "v_int", "ts_us", order_col="event_seq"),
        N,
    )
    from rustiflow_spark.operators.encoding import target_encode_expanding_split

    timed(
        "target_encode_split_hotkey",
        target_encode_expanding_split(
            ev, "cat", "v_int", "ts_us", chunk_us=DAY_US // 256,
            order_col="event_seq",
        ),
        N,
    )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "skew":
        skew_bench()
    else:
        main()
