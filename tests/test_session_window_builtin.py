"""Spark's built-in session_window must reproduce the kernel's idle-only
segmentation exactly: the reference's cut rule
`(t - last)/1e6 > idle` (truncating) ⇔ `t >= last + (idle+1)s`, which is
precisely session_window's close condition with gap = (idle+1) seconds.

This pins the engine to Catalyst's native sessionization where semantics
align (and documents why the custom kernel is still needed: active
timeouts, terminators, TCP cuts, close causes)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from rustiflow_spark.config import EngineConfig
from rustiflow_spark.operators.event_features import sessionize_events
from rustiflow_spark.sources.synth import generate_token_sequences


def test_builtin_session_window_equivalence(spark):
    idle_s = 60
    pdf = generate_token_sequences(n_docs=50, seed=14)
    sdf = spark.createDataFrame(pdf)
    cfg = EngineConfig(
        active_timeout=10_000_000, idle_timeout=idle_s, scan_mode="none"
    )
    ours = (
        sessionize_events(
            sdf, ["source", "doc_id"], cfg, terminator_col=None
        )
        .select("source", "doc_id", "first_ts_us", "last_ts_us", "event_count")
        .toPandas()
    )

    builtin = (
        sdf.withColumn("event_time", F.timestamp_micros("ts_us"))
        .groupBy(
            "source",
            "doc_id",
            F.session_window("event_time", f"{idle_s + 1} seconds"),
        )
        .agg(
            F.min("ts_us").alias("first_ts_us"),
            F.max("ts_us").alias("last_ts_us"),
            F.count("*").cast("int").alias("event_count"),
        )
        .drop("session_window")
        .toPandas()
    )

    key = ["source", "doc_id", "first_ts_us"]
    a = ours.sort_values(key).reset_index(drop=True)
    b = builtin.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a[key + ["last_ts_us", "event_count"]],
                                  b[key + ["last_ts_us", "event_count"]])
