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


def test_parquet_footer_flush_matches_aggregate(spark):
    """parquet_column_max (footer statistics, zero data pages) must agree
    with the aggregate max the engine would otherwise compute per query."""
    import datetime

    from pyspark.sql import functions as F

    from rustiflow_spark.sources.tables import parquet_column_max

    path = "/root/testdata/sf0.01/events.parquet"
    mx = parquet_column_max(path, "ts")
    assert mx is not None
    td = mx - datetime.datetime(1970, 1, 1)
    footer_us = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
    agg = (
        spark.read.parquet(path)
        .agg(
            F.expr(
                "max(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))"
            ).alias("mx")
        )
        .collect()[0]["mx"]
    )
    assert footer_us == int(agg)
    assert parquet_column_max(path, "no_such_column") is None


def test_sessionize_with_explicit_flush_matches_default(spark):
    """Passing the footer-derived flush_ts must not change any output."""
    import __spark_entry__ as em
    from rustiflow_spark.operators.event_features import sessionize_events

    ev = em._events(spark, "/root/testdata/sf0.001")
    cfg = em._engine_cfg()
    base = sessionize_events(ev, ["user_id"], cfg, value_col="value").toPandas()
    flush = em._events_flush_us("/root/testdata/sf0.001")
    assert flush is not None
    fast = sessionize_events(
        ev, ["user_id"], cfg, value_col="value", flush_ts=flush
    ).toPandas()
    key = ["user_id", "first_ts_us"]
    base = base.sort_values(key).reset_index(drop=True)
    fast = fast.sort_values(key).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(base, fast)
