"""One large capture through the split pcap source: generate a >=1 GB
classic pcap, decode it with byte-range splits (read_pcap split_size=...),
and check the result against the single-task whole-file decode.

Usage: python tools/bench_pcap_split.py [target_gb]
Prints one JSON line: sizes, task counts, times, row-count + checksum match.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from rustiflow_spark.session import get_spark
from rustiflow_spark.sources.pcap import read_pcap
from rustiflow_spark.sources.pcap_write import encode_pcap_bytes


def generate(path: str, target_bytes: int) -> int:
    """Append deterministic chunks until the capture exceeds target_bytes."""
    rng = np.random.default_rng(7)
    base = 1_700_000_000_000_000
    written = 0
    chunk_rows = 200_000
    with open(path, "wb") as f:
        first = True
        while written < target_bytes:
            n = chunk_rows
            pdf = pd.DataFrame({
                "ts_us": base + np.cumsum(rng.integers(10, 3000, n)),
                "proto": rng.choice([6, 17], n),
                "v6": np.zeros(n, bool), "vlan": rng.random(n) < 0.2,
                "ext": np.zeros(n, bool),
                "src_ip": np.where(rng.random(n) < 0.5, "10.1.2.3", "10.4.5.6"),
                "dst_ip": "172.16.0.9",
                "src_port": rng.integers(1024, 60000, n), "dst_port": 443,
                "dlen": rng.integers(0, 1400, n),
                "fin": np.zeros(n, int),
                "syn": (rng.random(n) < 0.05).astype(int),
                "rst": np.zeros(n, int),
                "psh": (rng.random(n) < 0.4).astype(int),
                "ack": np.ones(n, int), "hdr_opt": 0,
                "seq": rng.integers(0, 2**32, n),
                "ack_seq": rng.integers(0, 2**32, n),
                "window": rng.integers(0, 65535, n),
                "icmp_type": 0, "icmp_code": 0,
                "inject_frag": np.zeros(n, bool),
                "inject_arp": np.zeros(n, bool),
            })
            base = int(pdf["ts_us"].iloc[-1]) + 1000
            data = encode_pcap_bytes(pdf)
            if not first:
                data = data[24:]  # strip the repeated global header
            f.write(data)
            written += len(data)
            first = False
    return written


def main() -> None:
    target_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    path = "/tmp/rustiflow_big_capture.pcap"
    t0 = time.time()
    size = generate(path, int(target_gb * (1 << 30)))
    gen_s = time.time() - t0

    spark = get_spark("pcap-split-bench", cores=8, shuffle_partitions=16)

    from pyspark.sql import functions as F

    def checksum(df):
        # sum(ts_us) would overflow int64 at 10^6 rows; mod-sum is stable
        return df.agg(
            F.count("*").alias("n"),
            F.sum(F.col("ts_us") % 1_000_003).alias("ts_mod"),
            F.sum("length").alias("len_sum"),
        ).collect()[0]

    t0 = time.time()
    split_df = read_pcap(spark, path, split_size=64 << 20)
    n_tasks = split_df.rdd.getNumPartitions()
    split_agg = checksum(split_df)
    split_s = time.time() - t0

    # Ground truth: the driver-side sequential decoder. The whole-file
    # Spark mode (binaryFile) is NOT used for comparison at this size: a
    # single >1 GB binary row grinds through Arrow serialization for tens
    # of minutes — exactly the ceiling the split mode removes.
    from rustiflow_spark.sources.pcap import decode_pcap

    t0 = time.time()
    ref = decode_pcap(path)
    ref_s = time.time() - t0
    ref_n = len(ref)
    ref_ts_mod = int((ref["ts_us"] % 1_000_003).sum())
    ref_len = int(ref["length"].sum())

    print(json.dumps({
        "capture_bytes": size,
        "generate_sec": round(gen_s, 1),
        "split_tasks": n_tasks,
        "split_decode_sec": round(split_s, 2),
        "driver_sequential_decode_sec": round(ref_s, 2),
        "rows": split_agg["n"],
        "rows_match": split_agg["n"] == ref_n,
        "checksums_match": (
            split_agg["ts_mod"] == ref_ts_mod
            and split_agg["len_sum"] == ref_len
        ),
        "speedup_vs_sequential": round(ref_s / split_s, 2),
    }))
    spark.stop()
    os.unlink(path)


if __name__ == "__main__":
    main()
