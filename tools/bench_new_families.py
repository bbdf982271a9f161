#!/usr/bin/env python3
"""Scale bench for the round-5 late additions (retrieval, profiling,
hashing, sampling splits, random projection).

Usage: python tools/bench_new_families.py [sf_dir] [cores]
Default sf_dir /root/testdata/sf0.1, cores 32. Prints one JSON line per
query (best of 2 — this sandbox shows 2-4x hypervisor steal).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from rustiflow_spark.session import get_spark

QUERIES = [
    "tfidf_search",
    "bm25_search",
    "table_profile",
    "hash_cross_features",
    "quota_sample",
    "time_split",
    "random_projection",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("bench-new-families", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # warmup
    qmap["table_profile"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cores": cores,
                "docs": n_docs,
                "events": n_events,
                "sec": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
