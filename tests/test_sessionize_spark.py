"""End-to-end Spark sessionization vs the pure-Python oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from oracle_flow import OracleFlowTable
from rustiflow_spark.config import EngineConfig
from rustiflow_spark.operators.sessionize import sessionize_packets
from rustiflow_spark.schema import PACKET_EVENT_SCHEMA
from rustiflow_spark.sources.synth import generate_packet_events
from test_kernel_parity import compare_flow_sets, df_to_packets


def make_events_df(spark, pdf: pd.DataFrame):
    pdf = pdf.copy()
    for col in ("icmp_type", "icmp_code"):
        pdf[col] = pdf[col].astype("object").where(pdf[col].notna(), None)
    # createDataFrame(pandas, schema) maps by POSITION — align column order
    pdf = pdf[[f.name for f in PACKET_EVENT_SCHEMA.fields]]
    return spark.createDataFrame(pdf, schema=PACKET_EVENT_SCHEMA)


def test_sessionize_spark_matches_oracle(spark):
    pdf = generate_packet_events(n_flows=60, seed=5, long_flow_packets=200)
    cfg = EngineConfig()
    sdf = make_events_df(spark, pdf)
    result = sessionize_packets(sdf, cfg).toPandas()

    oracle = OracleFlowTable(
        cfg.active_timeout, cfg.idle_timeout, cfg.early_export, cfg.expiration_check_interval
    )
    oracle_rows = oracle.run(df_to_packets(pdf))
    kernel_rows = result.to_dict("records")
    compare_flow_sets(oracle_rows, kernel_rows)


def test_sessionize_partition_invariance(spark):
    """Result must not depend on shuffle partitioning (scale invariant)."""
    pdf = generate_packet_events(n_flows=40, seed=11, long_flow_packets=100)
    cfg = EngineConfig(active_timeout=60, idle_timeout=10, expiration_check_interval=7)
    sdf = make_events_df(spark, pdf)
    r1 = sessionize_packets(sdf, cfg, num_partitions=1).toPandas()
    r2 = sessionize_packets(sdf, cfg, num_partitions=16).toPandas()
    key = ["flow_key", "first_ts_us", "last_ts_us"]
    r1 = r1.sort_values(key).reset_index(drop=True)
    r2 = r2.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(r1, r2)
