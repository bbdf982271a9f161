"""Feature-module unit tests mirroring the reference's own test cases
case-for-case (rustiflow/src/tests/flows/feature_modules_test.rs), asserted
against BOTH engine kernels (simple per-group and segment-vectorized).

Each case builds a single biflow whose packets reproduce the reference test
inputs; flows are kept alive until shutdown flush so module state matches
the reference test's direct module calls.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from rustiflow_spark.config import ACK_FLAG, FIN_FLAG, SYN_FLAG, EngineConfig
from test_kernel_parity import run_kernel_all_groups
from test_packet_vectorized import run_vectorized

CFG = EngineConfig(active_timeout=10_000_000, idle_timeout=10_000_000, scan_mode="none")


def mk_packets(rows: list[dict]) -> pd.DataFrame:
    """rows: dicts with ts_us, fwd (bool) + overrides."""
    base = {
        "protocol": 6,
        "fin_flag": 0, "syn_flag": 0, "rst_flag": 0, "psh_flag": 0,
        "ack_flag": 0, "urg_flag": 0, "cwr_flag": 0, "ece_flag": 0,
        "flags": 0, "data_length": 0, "header_length": 20, "length": 0,
        "window_size": 0, "sequence_number": 0, "sequence_number_ack": 0,
        "icmp_type": None, "icmp_code": None,
    }
    out = []
    for i, r in enumerate(rows):
        d = dict(base)
        d.update({k: v for k, v in r.items() if k not in ("fwd",)})
        fwd = r.get("fwd", True)
        d["src_ip"], d["dst_ip"] = ("10.0.0.1", "10.0.0.2") if fwd else ("10.0.0.2", "10.0.0.1")
        d["src_port"], d["dst_port"] = (1000, 2000) if fwd else (2000, 1000)
        d["event_seq"] = i
        out.append(d)
    return pd.DataFrame(out)


def run_both(pdf: pd.DataFrame, cfg: EngineConfig = CFG, n_sessions: int = 1) -> list[dict]:
    simple = sorted(run_kernel_all_groups(pdf, cfg), key=lambda r: r["first_ts_us"])
    vec = sorted(run_vectorized(pdf, cfg), key=lambda r: r["first_ts_us"])
    assert len(simple) == len(vec) == n_sessions
    for s, v in zip(simple, vec):
        for k, val in s.items():
            if k in v:
                if isinstance(val, float):
                    assert np.isclose(val, v[k], equal_nan=True), (k, val, v[k])
                else:
                    assert val == v[k], (k, val, v[k])
    return simple


def test_packet_length_pooled_directional_variance():
    # feature_modules_test.rs:71-93
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True, "length": 60},
        {"ts_us": 1_000_500, "fwd": False, "length": 30},
        {"ts_us": 1_001_000, "fwd": True, "length": 90},
        {"ts_us": 1_001_500, "fwd": False, "length": 150},
    ])
    r = run_both(pdf)[0] if False else run_both(pdf)[0]
    vals = np.array([60.0, 30.0, 90.0, 150.0])
    # pooled flow stats are derived at projection time; check directional
    assert r["fwd_packet_len_mean"] == 75.0
    assert r["bwd_packet_len_mean"] == 90.0
    # pooled variance via the schema expression path
    n1 = n2 = 2
    m1, m2 = 75.0, 90.0
    v1 = np.mean((np.array([60.0, 90.0]) - m1) ** 2)
    v2 = np.mean((np.array([30.0, 150.0]) - m2) ** 2)
    cm = 82.5
    pooled = (n1 * v1 + n2 * v2 + n1 * (m1 - cm) ** 2 + n2 * (m2 - cm) ** 2) / 4
    assert np.isclose(math.sqrt(pooled), np.std(vals))


def test_icmp_first_type_code_and_behavior_counts():
    # feature_modules_test.rs:96-130
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True, "protocol": 1, "icmp_type": 8, "icmp_code": 0},
        {"ts_us": 2_000_000, "fwd": False, "protocol": 1, "icmp_type": 3, "icmp_code": 1},
        {"ts_us": 3_000_000, "fwd": True, "protocol": 1, "icmp_type": 129, "icmp_code": 0},
        {"ts_us": 4_000_000, "fwd": False, "protocol": 1, "icmp_type": 1, "icmp_code": 4},
    ])
    # NOTE: the reference test mixes Icmp and Icmpv6 protocols in one flow;
    # a real flow has one protocol, so v6 rows here use the v4 code map.
    r = run_both(pdf)[0]
    assert r["icmp_type"] == 8 and r["icmp_code"] == 0
    assert r["icmp_echo_request_count"] == 1
    assert r["icmp_echo_reply_count"] == 0  # 129 is not a v4 echo reply
    assert r["icmp_destination_unreachable_count"] == 1


def test_retransmission_overlap_by_direction():
    # feature_modules_test.rs:133-186: pure ACKs and non-TCP excluded;
    # partial overlap counts; duplicate SYN counts in its direction
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True, "flags": ACK_FLAG, "ack_flag": 1,
         "sequence_number": 11},
        {"ts_us": 1_000_100, "fwd": True, "flags": ACK_FLAG, "ack_flag": 1,
         "sequence_number": 11},
        {"ts_us": 2_000_000, "fwd": True, "sequence_number": 100, "data_length": 100},
        {"ts_us": 2_100_000, "fwd": True, "sequence_number": 150, "data_length": 100},
        {"ts_us": 2_500_000, "fwd": False, "flags": SYN_FLAG, "syn_flag": 1,
         "sequence_number": 200},
        {"ts_us": 2_600_000, "fwd": False, "flags": SYN_FLAG, "syn_flag": 1,
         "sequence_number": 200},
    ])
    r = run_both(pdf)[0]
    assert r["fwd_retransmission_count"] == 1
    assert r["bwd_retransmission_count"] == 1


def test_retransmission_fin_sequence_space():
    # feature_modules_test.rs:189-211
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True, "flags": FIN_FLAG | ACK_FLAG,
         "fin_flag": 1, "ack_flag": 1, "sequence_number": 500},
        {"ts_us": 1_100_000, "fwd": True, "flags": FIN_FLAG | ACK_FLAG,
         "fin_flag": 1, "ack_flag": 1, "sequence_number": 500},
    ])
    r = run_both(pdf)[0]
    assert r["fwd_retransmission_count"] == 1
    assert r["bwd_retransmission_count"] == 0


def test_retransmission_adjacent_not_counted_later_overlap_counted():
    # feature_modules_test.rs:213-236
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True, "sequence_number": 100, "data_length": 100},
        {"ts_us": 1_050_000, "fwd": True, "sequence_number": 200, "data_length": 100},
        {"ts_us": 1_100_000, "fwd": True, "sequence_number": 150, "data_length": 100},
    ])
    r = run_both(pdf)[0]
    assert r["fwd_retransmission_count"] == 1


def test_window_size_initial_per_direction():
    # feature_modules_test.rs:239-262
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True, "window_size": 1024},
        {"ts_us": 1_100_000, "fwd": False, "window_size": 2048},
        {"ts_us": 1_200_000, "fwd": True, "window_size": 512},
    ])
    r = run_both(pdf)[0]
    assert r["fwd_init_window_size"] == 1024
    assert r["bwd_init_window_size"] == 2048


def test_dup_ack_and_zero_window():
    # feature_modules_test.rs:290-352: window change breaks the duplicate
    # run; payload packet resets the comparator; UDP zero-window ignored
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True, "flags": ACK_FLAG, "ack_flag": 1,
         "sequence_number_ack": 500, "window_size": 4096},
        {"ts_us": 1_000_500, "fwd": True, "flags": ACK_FLAG, "ack_flag": 1,
         "sequence_number_ack": 500, "window_size": 4096},
        {"ts_us": 1_001_000, "fwd": True, "flags": ACK_FLAG, "ack_flag": 1,
         "sequence_number_ack": 500, "window_size": 2048},
        {"ts_us": 1_001_500, "fwd": False, "flags": ACK_FLAG, "ack_flag": 1,
         "sequence_number_ack": 800, "window_size": 0},
        {"ts_us": 1_002_000, "fwd": False, "flags": ACK_FLAG, "ack_flag": 1,
         "sequence_number_ack": 800, "window_size": 0},
        {"ts_us": 1_002_500, "fwd": True, "flags": ACK_FLAG, "ack_flag": 1,
         "sequence_number_ack": 500, "data_length": 32, "window_size": 4096},
    ])
    r = run_both(pdf)[0]
    assert r["fwd_duplicate_ack_count"] == 1
    assert r["bwd_duplicate_ack_count"] == 1
    assert r["fwd_zero_window_count"] == 0
    assert r["bwd_zero_window_count"] == 2


def test_subflow_gap_strictly_greater_than_one_second():
    # feature_modules_test.rs:355-372: gap of exactly 1.0 s does not count;
    # 1.000001 s does
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True},
        {"ts_us": 2_000_000, "fwd": False},
        {"ts_us": 3_000_001, "fwd": True},
    ])
    r = run_both(pdf)[0]
    assert r["subflow_count"] == 2


def test_active_idle_gap_and_close_semantics():
    # feature_modules_test.rs:374-391 adapted to the engine surface: a
    # 6 s gap records one idle period; the trailing idle gap up to the
    # close-observation timestamp is added only for Idle-Timeout closes
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True},
        {"ts_us": 7_000_000, "fwd": False},
        {"ts_us": 21_000_000, "fwd": True},  # observes expiry of session 1
    ])
    cfg = EngineConfig(active_timeout=10_000_000, idle_timeout=10, scan_mode="none",
                       expiration_check_interval=10_000_000)
    sessions = run_both(pdf, cfg, n_sessions=2)
    r = sessions[0]
    assert r["cause"] == "Idle Timeout"
    # idle periods: the 6 s in-session gap + trailing (21s - 7s) = 14 s
    assert r["idle_count"] == 2
    assert np.isclose(r["idle_total"], 6_000.0 + 14_000.0)
    # both active spans have zero duration -> none recorded
    assert r["active_count"] == 0


def test_active_idle_exact_threshold_and_sub_ms_precision():
    # feature_modules_test.rs:393-408: gap of exactly 5.0 s is NOT an idle
    # split (strict >); 5.0005 s is, preserving sub-ms precision
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True},
        {"ts_us": 6_000_000, "fwd": False},
        {"ts_us": 11_000_500, "fwd": True},
    ])
    r = run_both(pdf)[0]
    assert r["active_count"] >= 1
    assert np.isclose(r["active_total"], 5_000.0)  # [1s, 6s] span
    assert r["idle_count"] == 1
    assert np.isclose(r["idle_total"], 5_000.5)


def test_iat_sub_millisecond_precision():
    # feature_modules_test.rs:411-427
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True},
        {"ts_us": 1_000_500, "fwd": True},
        {"ts_us": 1_001_250, "fwd": False},
    ])
    r = run_both(pdf)[0]
    assert r["fwd_iat_count"] == 1
    assert np.isclose(r["fwd_iat_mean"], 0.5)
    assert r["iat_count"] == 2
    assert np.isclose(r["iat_total"], 1.25)


def test_timing_sub_millisecond_precision():
    # feature_modules_test.rs:430-449
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True},
        {"ts_us": 1_000_750, "fwd": True},
        {"ts_us": 1_001_250, "fwd": False},
        {"ts_us": 1_002_125, "fwd": False},
    ])
    r = run_both(pdf)[0]
    assert np.isclose(r["first_ts_fwd_ms"], 1_000.0)
    assert np.isclose(r["last_ts_fwd_ms"], 1_000.75)
    assert np.isclose(r["fwd_duration_ms"], 0.75)
    assert np.isclose(r["bwd_duration_ms"], 0.875)


def test_welford_population_std_order_invariance():
    # feature_modules_test.rs:42-68 — payload stats over permuted values
    vals = [100, 50, 0, 75, 200, 125]
    for order in (vals, vals[::-1]):
        pdf = mk_packets(
            [
                {"ts_us": 1_000_000 + i * 1000, "fwd": True, "data_length": v}
                for i, v in enumerate(order)
            ]
        )
        r = run_both(pdf)[0]
        assert r["payload_len_count"] == 6
        assert np.isclose(r["payload_len_total"], sum(vals))
        assert np.isclose(r["payload_len_mean"], np.mean(vals))
        assert np.isclose(r["payload_len_std"], np.std(vals))
        assert r["payload_len_min"] == 0.0
        assert r["payload_len_max"] == 200.0


def test_degenerate_inputs():
    """Ties, single packet, u32 saturation edge — both kernels agree."""
    # identical timestamps: event_seq breaks the order deterministically
    pdf = mk_packets([{"ts_us": 1_000_000, "fwd": True, "data_length": i} for i in range(5)])
    r = run_both(pdf)[0]
    assert r["payload_len_total"] == 10

    pdf = mk_packets([{"ts_us": 1_000_000, "fwd": True}])
    r = run_both(pdf)[0]
    assert r["duration_us"] == 0 and r["subflow_count"] == 1 and r["iat_count"] == 0

    # sequence range saturates at u32 max (retransmission_stats.rs:122)
    pdf = mk_packets([
        {"ts_us": 1_000_000, "fwd": True, "sequence_number": 2**32 - 50, "data_length": 100},
        {"ts_us": 1_100_000, "fwd": True, "sequence_number": 2**32 - 50, "data_length": 100},
    ])
    r = run_both(pdf)[0]
    assert r["fwd_retransmission_count"] == 1
