"""Scale bench for the round-4 analytics operators: range_join, the
time-bucket rollup cascade, and the deterministic HLL sketch.

Inputs are synthesized in-query (spark.range + deterministic arithmetic),
so any scale point runs without external data. Each section reports wall
seconds and the property that matters at 100 TB:

- range_join: events x intervals via the bucketized equi-join; the
  comparison theta join (BETWEEN) is run only at the small sanity scale —
  at the bench scale Spark would plan a broadcast-nested-loop.
- rollup: the coarse resolution computed FROM the materialized fine
  rollup vs re-aggregating the raw table — the cascade touches ~1/60th
  of the rows.
- hll: sketch estimate vs exact count(distinct) — the sketch shuffles at
  most (groups x 4096) register rows, exact shuffles every distinct key.

Usage: python tools/bench_new_ops.py [n_events] [cores]
(run twice, e.g. cores=8 and cores=32, for the two-parallelism record)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from rustiflow_spark.operators.intervals import (
    range_join,
    rollup_coarser,
    time_bucket_rollup,
)
from rustiflow_spark.operators.sketches import hll_count_distinct
from rustiflow_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_IV = max(1000, N // 320)  # intervals scale with events
DAY_US = 86_400_000_000


def synth_events(spark, n):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        # ~n/86400 events per second across 1 day, sprayed by a hash
        (F.xxhash64("id") % DAY_US).alias("ts_us"),
        (F.xxhash64("id", F.lit(1)) % 1_000_000).alias("user_id"),
        (F.xxhash64("id", F.lit(2)) % 100).cast("double").alias("value"),
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("event_type"),
    ).withColumn("ts_us", F.abs("ts_us")).withColumn(
        "user_id", F.abs("user_id")
    )


def synth_intervals(spark, n_iv):
    # mean length ~90 s, deterministic spread over the same day
    return spark.range(n_iv).select(
        F.col("id").alias("interval_id"),
        (F.abs(F.xxhash64("id", F.lit(7))) % DAY_US).alias("lo_us"),
    ).withColumn(
        "hi_us",
        F.col("lo_us") + 30_000_000 + (F.abs(F.xxhash64("interval_id", F.lit(8))) % 120_000_000),
    )


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def main():
    spark = get_spark("bench-new-ops", cores=CORES, shuffle_partitions=max(32, CORES * 4))
    spark.sparkContext.setLogLevel("ERROR")
    ev = synth_events(spark, N)
    iv = synth_intervals(spark, N_IV)
    ev.write.mode("overwrite").parquet("/tmp/bno_events.parquet")
    iv.write.mode("overwrite").parquet("/tmp/bno_intervals.parquet")
    ev = spark.read.parquet("/tmp/bno_events.parquet")
    iv = spark.read.parquet("/tmp/bno_intervals.parquet")
    res = {"n_events": N, "n_intervals": N_IV, "cores": CORES}

    # --- range join ---------------------------------------------------------
    rj = range_join(ev, iv, "ts_us", "lo_us", "hi_us", bucket_width_us=90_000_000)
    (n_pairs, w) = t(lambda: rj.count())
    res["range_join"] = {"pairs": n_pairs, "sec": w, "pairs_per_sec": round(n_pairs / w)}

    # sanity at small scale: bucketized == naive BETWEEN
    evs, ivs = ev.limit(200_000), iv.limit(500)
    small = range_join(evs, ivs, "ts_us", "lo_us", "hi_us", 90_000_000).count()
    naive = (
        evs.alias("e")
        .join(
            ivs.alias("i"),
            F.col("e.ts_us").between(F.col("i.lo_us"), F.col("i.hi_us")),
        )
        .count()
    )
    res["range_join"]["sanity_equal"] = bool(small == naive)

    # --- rollup cascade -----------------------------------------------------
    fine = time_bucket_rollup(ev, "ts_us", 60, ["event_type"], "value")
    _, w_fine = t(lambda: fine.write.mode("overwrite").parquet("/tmp/bno_fine.parquet"))
    finep = spark.read.parquet("/tmp/bno_fine.parquet")
    (n_coarse, w_casc) = t(lambda: rollup_coarser(finep, 3600, ["event_type"], fine_width_s=60).count())
    (_, w_direct) = t(lambda: time_bucket_rollup(ev, "ts_us", 3600, ["event_type"], "value").count())
    res["rollup"] = {
        "fine_build_sec": w_fine,
        "coarse_from_fine_sec": w_casc,
        "coarse_from_raw_sec": w_direct,
        "cascade_speedup": round(w_direct / w_casc, 2),
        "coarse_rows": n_coarse,
    }

    # --- hll ----------------------------------------------------------------
    (est, w_hll) = t(
        lambda: hll_count_distinct(ev, "user_id", ["event_type"], p=12).collect()
    )
    (exact, w_exact) = t(
        lambda: ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("x")).collect()
    )
    est_m = {r["event_type"]: r["hll_estimate"] for r in est}
    ex_m = {r["event_type"]: r["x"] for r in exact}
    err = max(abs(est_m[k] - ex_m[k]) / ex_m[k] for k in ex_m)
    res["hll"] = {
        "sketch_sec": w_hll,
        "exact_sec": w_exact,
        "speedup": round(w_exact / w_hll, 2),
        "max_rel_err": round(err, 4),
    }

    # --- hdr quantiles ------------------------------------------------------
    from rustiflow_spark.operators.sketches import hdr_histogram, hdr_quantiles

    (qs, w_hdr) = t(
        lambda: hdr_quantiles(
            hdr_histogram(ev.where("value >= 0"), "value", ["event_type"]),
            ["event_type"],
            [0.5, 0.99],
        ).collect()
    )
    (_, w_pq) = t(
        lambda: ev.where("value >= 0")
        .groupBy("event_type")
        .agg(F.expr("approx_percentile(value, array(0.5, 0.99))"))
        .collect()
    )
    res["hdr"] = {"sketch_sec": w_hdr, "spark_approx_percentile_sec": w_pq}

    # --- cms ----------------------------------------------------------------
    from rustiflow_spark.operators.sketches import cms_estimate, cms_sketch

    def run_cms():
        sk = cms_sketch(ev, "user_id", ["event_type"], depth=4, width_bits=14)
        probe = ev.select("user_id").where("user_id < 50").distinct()
        return cms_estimate(
            sk, probe, "user_id", ["event_type"], depth=4, width_bits=14
        ).collect()

    (_, w_cms) = t(run_cms)
    (_, w_gb) = t(
        lambda: ev.where("user_id < 50")
        .groupBy("event_type", "user_id")
        .count()
        .collect()
    )
    res["cms"] = {"sketch_sec": w_cms, "exact_filtered_groupby_sec": w_gb}

    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
