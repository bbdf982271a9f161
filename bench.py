#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the no-op sink so every column is computed
but nothing is collected to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from rustiflow_spark.session import get_spark

BENCH_QUERIES = [
    "session_features",
    "session_features_catalyst",
    "session_annotation",
    "session_annotation_catalyst",
    "welford_stats",
    "iat_window",
    "flag_counts",
    "asof_join",
    "lag_features",
    "rolling_features",
    "dedup_exact",
    "text_stats",
    "similarity_topk",
    "token_pipeline",
    "flow_cic_udp",
    "flow_tcp_rst",
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("rustiflow-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    qmap = entrymod.queries()
    timings: dict[str, float] = {}
    # warmup: JVM codegen + Python/Arrow worker spin-up (workers are reused
    # afterwards, so steady-state throughput is what gets measured)
    materialize(qmap["welford_stats"](spark, sf_dir).limit(10))
    materialize(qmap["session_features"](spark, sf_dir))

    # best-of-2 per query: this sandbox shows 3-4x run-to-run variance from
    # hypervisor CPU steal (see BENCH.md); min-of-2 recovers the plan's
    # actual cost rather than the noise floor
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qmap[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        total += best

    # round-5 flagship additions, timed the same way but reported OUTSIDE
    # the total so "value" stays comparable across rounds (the original
    # 16-query set is unchanged)
    extra: dict[str, float] = {}
    for name in [
        "point_in_time", "target_encode_split", "merge_upsert", "scd2",
        "bm25_search", "table_profile", "quota_sample", "random_projection",
        "semantic_dedup", "dup_token_spans", "repetition_stats",
        "dsir_weights", "pq_adc", "hybrid_search", "histogram_drift",
    ]:
        fn = qmap[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        extra[name] = round(best, 3)

    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    result = {
        "metric": "headline_queries_total_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "extra_queries_not_in_total": extra,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cores": cores,
        "events": n_events,
        "events_per_sec_sessionize": round(n_events / timings["session_features"], 1),
        "pkts_per_sec_flow_tcp": round(n_events / timings["flow_tcp_rst"], 1),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
