#!/usr/bin/env python3
"""Per-query isolation bench + plan capture (guide §1.4/§1.5/§7.2).

NOT the driver contract — bench.py is frozen for measurement; this tool
exists so optimization work can time any single declared query with the
noop sink, repeat it, and dump .explain("formatted") for the plan files
under plans/r06/.

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--explain LABEL] [--cores N] name [name...]
  python bench_extra.py --all            # every bench.py query + extras

Prints one JSON line {"sf_dir": ..., "queries": {name: best_sec}}.
With --explain LABEL also writes plans/r06/<name>_<LABEL>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from rustiflow_spark.session import get_spark

DEFAULT_SET = [
    "session_features", "session_features_catalyst", "session_annotation",
    "session_annotation_catalyst", "welford_stats", "iat_window",
    "flag_counts", "asof_join", "lag_features", "rolling_features",
    "dedup_exact", "text_stats", "similarity_topk", "token_pipeline",
    "flow_cic_udp", "flow_tcp_rst",
    "point_in_time", "target_encode_split", "merge_upsert", "scd2",
    "bm25_search", "table_profile", "quota_sample", "random_projection",
    "semantic_dedup", "dup_token_spans", "repetition_stats",
    "dsir_weights", "pq_adc", "hybrid_search", "histogram_drift",
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="*")
    p.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--explain", default=None, help="write plans/r06/<name>_<label>.txt")
    p.add_argument("--explain-only", action="store_true")
    p.add_argument("--all", action="store_true")
    p.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = p.parse_args()

    names = DEFAULT_SET if args.all else args.names
    if not names:
        p.error("no query names given (or use --all)")

    spark = get_spark("rustiflow-bench-extra", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    # warmup: JVM codegen + Arrow worker spin-up
    if not args.explain_only:
        qmap["welford_stats"](spark, args.sf).limit(10).write.mode(
            "overwrite").format("noop").save()

    out: dict[str, float] = {}
    for name in names:
        fn = qmap[name]
        if args.explain:
            df = fn(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.explain}.txt"), "w") as f:
                f.write(txt)
        if args.explain_only:
            continue
        best = float("inf")
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}", file=sys.stderr)

    print(json.dumps({"sf_dir": args.sf, "cores": args.cores, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
