"""Kernel column pruning parity: sessionize_packets(columns=...) must emit
bit-identical values to the full-superset run restricted to those columns,
for every output schema's referenced-column set.

This is the scale lever for narrow schemas (the reference's "serialization
dominates" finding, engineering-notes.md:671-699): the Arrow batch out of the
Python kernel carries only what the downstream projection reads, and the
skipped feature blocks (bulk runs, retransmission scans, ICMP maps,
active/idle spans) are never computed.
"""

from __future__ import annotations

import pandas as pd
import pytest

from rustiflow_spark.config import EngineConfig
from rustiflow_spark.flows.schemas import SCHEMAS
from rustiflow_spark.operators.sessionize import sessionize_packets
from rustiflow_spark.schema import (
    FLOW_SUPERSET_COLUMNS,
    projection_superset_columns,
    pruned_superset_schema,
)
from rustiflow_spark.sources.synth import generate_packet_events
from test_sessionize_spark import make_events_df


@pytest.fixture(scope="module")
def events(spark):
    pdf = generate_packet_events(n_flows=40, seed=77, long_flow_packets=80)
    return make_events_df(spark, pdf).cache()


@pytest.fixture(scope="module")
def full(events):
    return (
        sessionize_packets(events, EngineConfig())
        .toPandas()
        .sort_values("flow_key")
        .reset_index(drop=True)
    )


def _assert_frames_equal(pruned: pd.DataFrame, expect: pd.DataFrame):
    assert list(pruned.columns) == list(expect.columns)
    pd.testing.assert_frame_equal(pruned, expect, check_exact=True)


@pytest.mark.parametrize("schema_name", sorted(SCHEMAS))
def test_pruned_matches_full_per_schema(spark, events, full, schema_name):
    fn = SCHEMAS[schema_name]
    cols = projection_superset_columns(spark, fn)
    # every schema must prune something except the 203-col superset layout
    if schema_name in ("basic", "cidds"):
        assert len(cols) < 40, (schema_name, len(cols))
    keep = [c for c in FLOW_SUPERSET_COLUMNS if c in cols]
    sort_by = keep
    pruned = (
        sessionize_packets(events, EngineConfig(), columns=cols)
        .toPandas()
        .sort_values(sort_by)
        .reset_index(drop=True)
    )
    _assert_frames_equal(pruned, full[keep].sort_values(sort_by).reset_index(drop=True))
    # and the projected schema itself is value-identical on the pruned input
    out_p = fn(sessionize_packets(events, EngineConfig(), columns=cols)).toPandas()
    out_f = fn(sessionize_packets(events, EngineConfig())).toPandas()
    sort_col = out_p.columns[0]
    pd.testing.assert_frame_equal(
        out_p.sort_values(list(out_p.columns[:4])).reset_index(drop=True),
        out_f.sort_values(list(out_f.columns[:4])).reset_index(drop=True),
        check_exact=True,
    )


def test_explicit_narrow_set(spark, events, full):
    cols = {
        "flow_key", "first_ts_us", "last_ts_us", "duration_us",
        "fwd_packet_len_count", "bwd_packet_len_count", "cause",
    }
    pruned = (
        sessionize_packets(events, EngineConfig(), columns=cols)
        .toPandas()
        .sort_values("flow_key")
        .reset_index(drop=True)
    )
    keep = [c for c in FLOW_SUPERSET_COLUMNS if c in cols]
    assert list(pruned.columns) == keep
    _assert_frames_equal(pruned, full[keep])


def test_early_export_forces_full_compute(spark):
    """Snapshot prefixes reuse every family's aux arrays; pruning must not
    corrupt early-export rows (kernel falls back to full compute, output
    projection still applies)."""
    pdf = generate_packet_events(n_flows=12, seed=5, long_flow_packets=200)
    ev = make_events_df(spark, pdf)
    cfg = EngineConfig(early_export=0.2)
    cols = {"flow_key", "first_ts_us", "duration_us", "cause", "fwd_bulk_rate"}
    pruned = (
        sessionize_packets(ev, cfg, columns=cols)
        .toPandas()
        .sort_values(["flow_key", "first_ts_us"])
        .reset_index(drop=True)
    )
    fullp = (
        sessionize_packets(ev, cfg)
        .toPandas()
        .sort_values(["flow_key", "first_ts_us"])
        .reset_index(drop=True)
    )
    keep = [c for c in FLOW_SUPERSET_COLUMNS if c in cols]
    _assert_frames_equal(pruned, fullp[keep])


def test_unknown_column_raises():
    with pytest.raises(ValueError):
        pruned_superset_schema({"flow_key", "nope_col"})
