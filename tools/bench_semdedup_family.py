"""Scale bench for the SemDeDup / token-span-dedup / repetition family at
sf10 (500k documents, 200k x 64 embeddings) in their PRODUCTION modes:
xxhash64 gram keys, sampled IVF fit, Arrow matmul assignment with a
SemDeDup-sized codebook (K=512 — the Catalyst expression path would pay
K array aggregates per row; the matmul pays one BLAS call per batch).

Usage: python tools/bench_semdedup_family.py [sf_dir] [cores]
Run at two cores values (8 and 32) for the scaling-efficiency table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def timed(label, df, n_src):
    t0 = time.time()
    agg = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*df.columns) % 1_000_000_007).alias("chk"),
    ).collect()[0]
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "op": label,
                "sec": round(dt, 2),
                "rows_out": agg["n"],
                "chk": int(agg["chk"]),
                "src_rows": n_src,
                "krows_per_s": round(n_src / dt / 1e3, 1),
                "cores": CORES,
            }
        ),
        flush=True,
    )


def main() -> None:
    from rustiflow_spark.operators.dedup import (
        duplicate_token_spans,
        semantic_dedup,
    )
    from rustiflow_spark.operators.similarity import ivf_fit
    from rustiflow_spark.operators.textstats import repetition_stats
    from rustiflow_spark.session import get_spark

    spark = get_spark("bench-semdedup", cores=CORES, shuffle_partitions=CORES)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_docs, n_vecs = docs.count(), emb.count()

    toks = docs.select(
        "doc_id",
        F.expr(
            "transform(split(text, ' '), w -> CAST(length(w) * 31 + ascii(w) AS INT))"
        ).alias("tokens"),
    )
    timed(
        "dup_token_spans(w=5,xxhash64)",
        duplicate_token_spans(toks, "doc_id", "tokens", window=5, min_count=2),
        n_docs,
    )
    timed("repetition_stats", repetition_stats(docs, "doc_id", "text"), n_docs)

    # SemDeDup production shape: 1% sampled Lloyd fit, K=512 lists,
    # Arrow matmul assignment, cluster cap bounding the pair fan-out
    t0 = time.time()
    cents = ivf_fit(
        emb, n_lists=512, iters=2,
        seed_ids=None, sample_fraction=0.01, sample_seed=7,
        assign_mode="arrow",
    )
    fit_s = time.time() - t0
    print(json.dumps({"op": "ivf_fit(K=512,1% sample,arrow)",
                      "sec": round(fit_s, 2), "cores": CORES}), flush=True)
    timed(
        "semantic_dedup(K=512,arrow+arrow)",
        semantic_dedup(
            emb, "vec_id", "embedding", cents,
            tau_num=4, tau_den=5, max_cluster_size=5000,
            assign_mode="arrow", pair_mode="arrow",
        ),
        n_vecs,
    )

    # PQ production shape: 8 subspaces x 256 codes (64-dim -> 8 bytes per
    # vector, 32x smaller than float32), sampled arrow fits, arrow encode,
    # ADC scan for an 8-query batch
    from rustiflow_spark.operators.similarity import pq_adc_topk, pq_fit

    t0 = time.time()
    books = pq_fit(
        emb, m=8, k_codes=256, iters=2,
        sample_fraction=0.05, assign_mode="arrow",
    )
    fit_s = time.time() - t0
    print(json.dumps({"op": "pq_fit(m=8,k=256,5% sample,arrow)",
                      "sec": round(fit_s, 2), "cores": CORES}), flush=True)
    timed(
        "pq_adc_topk(8 queries,arrow encode)",
        pq_adc_topk(
            emb, emb.where("vec_id < 8"), books, k=10, encode_mode="arrow"
        ),
        n_vecs,
    )


if __name__ == "__main__":
    main()
