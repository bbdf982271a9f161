"""Long-flow early-export microbenchmark: prefix-cumulative vs
gather-expansion snapshot featurization.

The worst case for gather-expansion (round-2 design) is one long-lived flow
whose early-export threshold is crossed early: every packet past the
threshold duplicates its whole session prefix, i.e. O(n^2/2) gathered rows.
The prefix-cumulative path (round 3) is O(n). Reference cost model:
~0.2 us per snapshot accumulator clone (flow_table.rs:162-173).

Usage: python tools/bench_early_export.py [n_packets]
Prints one JSON line with both times and the speedup.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from rustiflow_spark.config import EngineConfig
from rustiflow_spark.kernel.packet_segmented import featurize_packet_block


def one_long_flow(n: int) -> tuple[dict, dict]:
    rng = np.random.default_rng(7)
    ts = np.cumsum(rng.integers(100, 2000, size=n)).astype(np.int64)
    g = {
        "ts_us": ts,
        "fin_flag": np.zeros(n, np.int64),
        "syn_flag": np.zeros(n, np.int64),
        "rst_flag": np.zeros(n, np.int64),
        "psh_flag": np.zeros(n, np.int64),
        "ack_flag": np.zeros(n, np.int64),
        "urg_flag": np.zeros(n, np.int64),
        "cwr_flag": np.zeros(n, np.int64),
        "ece_flag": np.zeros(n, np.int64),
        "flags": np.zeros(n, np.int64),
        "data_length": rng.integers(0, 1400, size=n).astype(np.int64),
        "header_length": np.full(n, 28, np.int64),
        "length": rng.integers(28, 1500, size=n).astype(np.int64),
        "window_size": np.zeros(n, np.int64),
        "sequence_number": np.zeros(n, np.int64),
        "sequence_number_ack": np.zeros(n, np.int64),
        "protocol": np.full(n, 17, np.int64),
        "event_seq": np.arange(n, dtype=np.int64),
        "icmp_type": np.full(n, -1, np.int64),
        "icmp_code": np.full(n, -1, np.int64),
        "dir_a": (rng.random(n) < 0.5),
        "key_id": np.zeros(n, np.int64),
    }
    keys = {
        "key_ip_a": np.full(n, "10.0.0.1", object),
        "key_port_a": np.full(n, 1234, object),
        "key_ip_b": np.full(n, "10.0.0.2", object),
        "key_port_b": np.full(n, 443, object),
    }
    return g, keys


def run(impl: str, n: int) -> tuple[float, int]:
    g, keys = one_long_flow(n)
    cfg = EngineConfig(
        active_timeout=10**9, idle_timeout=10**6, scan_mode="none",
        early_export=5, early_export_impl=impl,
    )
    flush = int(g["ts_us"][-1])
    t0 = time.perf_counter()
    out = featurize_packet_block(g, keys, cfg, np.empty(0, np.int64), flush)
    dt = time.perf_counter() - t0
    return dt, int(out["first_ts_us"].size)


def main() -> None:
    # gather-expansion is O(n^2/2) in rows AND memory (every snapshot
    # duplicates its whole prefix), so it is only feasible at small n;
    # the prefix path is additionally timed at 10x to show linearity.
    n_match = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_big = n_match * 10
    # warm-up numpy paths on a small case
    run("prefix", 2000)
    run("gather", 2000)
    t_prefix, rows_p = run("prefix", n_match)
    t_gather, rows_g = run("gather", n_match)
    assert rows_p == rows_g, (rows_p, rows_g)
    t_big, rows_big = run("prefix", n_big)
    print(json.dumps({
        "n_packets": n_match,
        "rows_out": rows_p,
        "gather_sec": round(t_gather, 3),
        "prefix_sec": round(t_prefix, 4),
        "speedup_at_matched_n": round(t_gather / t_prefix, 1),
        "prefix_sec_at_10x_n": round(t_big, 4),
        "prefix_rows_at_10x_n": rows_big,
    }))


if __name__ == "__main__":
    main()
