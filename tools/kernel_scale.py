#!/usr/bin/env python3
"""Kernel concurrency scaling — the honest multi-executor analog.

Runs the segment-vectorized kernels (event path and packet path) as
independent OS processes (multiprocessing spawn pool): exactly how cluster
executors run them — no shared JVM, no shared Python, each process owns its
blocks. Reports aggregate throughput at two pool sizes and the N->4N
scaling efficiency (north-rule criterion; no real cluster in this sandbox,
see BENCH.md caveats).

Usage: python tools/kernel_scale.py [--low 8] [--high 32] [--rows 1000000]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _event_block(rows: int, keys: int, seed: int):
    rng = np.random.default_rng(seed)
    key_ids = np.sort(rng.integers(0, keys, size=rows))
    gaps = rng.integers(1000, 3_000_000, size=rows).astype(np.int64)
    ts = 1_700_000_000_000_000 + np.cumsum(gaps)
    # per-key ascending is what the kernel requires; global cumsum + sorted
    # keys satisfies it
    value = rng.uniform(1, 500, size=rows)
    direction = rng.integers(0, 2, size=rows).astype(np.int64)
    terminator = (rng.random(rows) < 0.02).astype(np.int64)
    return key_ids, ts, value, direction, terminator


def run_event_kernel(args):
    rows, seed = args
    from rustiflow_spark.config import EngineConfig
    from rustiflow_spark.kernel.segmented import featurize_block

    key_ids, ts, value, direction, terminator = _event_block(rows, rows // 400, seed)
    cfg = EngineConfig(active_timeout=10_000_000, idle_timeout=1800, scan_mode="none")
    t0 = time.perf_counter()
    featurize_block(
        key_ids, ts, value, direction, terminator, cfg,
        np.empty(0, dtype=np.int64), int(ts[-1]),
    )
    return rows, time.perf_counter() - t0


def _packet_block(rows: int, seed: int):
    rng = np.random.default_rng(seed)
    per = 50
    groups = rows // per
    key_id = np.repeat(np.arange(groups), per)
    gaps = rng.integers(1000, 3_000_000, size=rows)
    ts = 1_700_000_000_000_000 + np.concatenate(
        [np.cumsum(gaps[i * per:(i + 1) * per]) for i in range(groups)]
    )
    g = {
        "key_id": key_id,
        "ts_us": ts.astype(np.int64),
        "protocol": np.full(rows, 6, dtype=np.int64),
        "dir_a": rng.integers(0, 2, size=rows).astype(bool),
        "event_seq": np.arange(rows, dtype=np.int64),
        "data_length": rng.integers(0, 1400, size=rows),
        "header_length": np.full(rows, 20, dtype=np.int64),
        "length": rng.integers(40, 1460, size=rows),
        "window_size": rng.integers(1, 65536, size=rows),
        "sequence_number": (np.arange(rows, dtype=np.int64) * 3000) % (2**32),
        "sequence_number_ack": np.zeros(rows, dtype=np.int64),
        "icmp_type": np.full(rows, -1, dtype=np.int64),
        "icmp_code": np.full(rows, -1, dtype=np.int64),
    }
    for f in ("fin", "syn", "rst", "psh", "ack", "urg", "cwr", "ece"):
        g[f + "_flag"] = np.zeros(rows, dtype=np.int64)
    g["syn_flag"][::per] = 1
    g["rst_flag"] = (rng.random(rows) < 0.02).astype(np.int64)
    g["flags"] = (g["rst_flag"] * 4 + g["syn_flag"] * 2).astype(np.int64)
    keys = {
        "key_ip_a": np.array([f"10.0.{int(k) % 256}.{int(k) // 256}" for k in key_id], dtype=object),
        "key_port_a": np.full(rows, 1024, dtype=np.int64),
        "key_ip_b": np.array(["172.16.0.9"] * rows, dtype=object),
        "key_port_b": np.full(rows, 443, dtype=np.int64),
    }
    return g, keys


def run_packet_kernel(args):
    rows, seed = args
    from rustiflow_spark.config import EngineConfig
    from rustiflow_spark.kernel.packet_segmented import featurize_packet_block

    g, keys = _packet_block(rows, seed)
    cfg = EngineConfig(active_timeout=3600, idle_timeout=120, scan_mode="none")
    t0 = time.perf_counter()
    featurize_packet_block(g, keys, cfg, np.empty(0, dtype=np.int64), int(g["ts_us"].max()))
    return rows, time.perf_counter() - t0


def measure(fn, nprocs: int, rows: int, blocks_per_proc: int = 2) -> float:
    """Aggregate rows/s with nprocs concurrent worker processes."""
    ctx = mp.get_context("spawn")
    work = [(rows, 100 + i) for i in range(nprocs * blocks_per_proc)]
    with ctx.Pool(nprocs) as pool:
        pool.map(fn, work[:nprocs])  # warmup: imports + allocator
        t0 = time.perf_counter()
        res = pool.map(fn, work)
        wall = time.perf_counter() - t0
    total_rows = sum(r for r, _ in res)
    return total_rows / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--rows", type=int, default=1_000_000)
    args = ap.parse_args()

    out = {"low_procs": args.low, "high_procs": args.high, "rows_per_block": args.rows}
    for name, fn in (("event", run_event_kernel), ("packet", run_packet_kernel)):
        lo = measure(fn, args.low, args.rows)
        hi = measure(fn, args.high, args.rows)
        out[name] = {
            "low_rows_per_s": round(lo, 1),
            "high_rows_per_s": round(hi, 1),
            "efficiency": round((hi / lo) / (args.high / args.low), 3),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
