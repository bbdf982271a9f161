"""Expiry-scan timeline unit tests (timeline.py): exact recursion semantics
(flow_table.rs:207-219) and the bucketed approximation's error bound."""

from __future__ import annotations

import numpy as np

from rustiflow_spark.timeline import scan_times_from_bucket_mins, scan_times_from_sorted


def test_exact_scan_recursion():
    # first event fires a scan; next scan at first event >= prev + interval
    ts = np.array([5, 10, 64, 65, 131, 300], dtype=np.int64)
    scans = scan_times_from_sorted(ts, interval_us=60)
    assert scans.tolist() == [5, 65, 131, 300]


def test_exact_scan_empty_and_single():
    assert scan_times_from_sorted(np.array([], dtype=np.int64), 60).size == 0
    assert scan_times_from_sorted(np.array([42], dtype=np.int64), 60).tolist() == [42]


def test_bucket_mode_error_bound():
    rng = np.random.RandomState(4)
    ts = np.sort(rng.randint(0, 10_000_000, 5000).astype(np.int64))
    interval = 60_000
    exact = scan_times_from_sorted(ts, interval)
    bucket_us = interval // 64
    buckets = ts // bucket_us
    mins = np.array(
        [ts[buckets == b].min() for b in np.unique(buckets)], dtype=np.int64
    )
    approx = scan_times_from_bucket_mins(mins, interval, bucket_us)
    # each approximate scan is a real event time and within one bucket of an
    # exact scan's neighborhood; counts match within rounding drift
    assert np.isin(approx, ts).all()
    assert abs(len(approx) - len(exact)) <= max(2, len(exact) // 20)
