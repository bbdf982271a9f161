"""Differential test: segment-vectorized block kernel (kernel/segmented.py)
must equal the simple per-key reference kernel (kernel/event_kernel.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rustiflow_spark.config import EngineConfig
from rustiflow_spark.kernel.event_kernel import EVENT_FEATURE_COLUMNS, featurize_key_events
from rustiflow_spark.kernel.segmented import featurize_block
from rustiflow_spark.sources.synth import generate_token_sequences
from rustiflow_spark.timeline import scan_times_from_sorted


@pytest.mark.parametrize("seed", [2, 42])
@pytest.mark.parametrize(
    "cfg",
    [
        EngineConfig(),
        EngineConfig(active_timeout=35, idle_timeout=7, expiration_check_interval=5),
        EngineConfig(active_timeout=10_000_000, idle_timeout=1800, scan_mode="none"),
    ],
)
def test_block_kernel_matches_reference_kernel(seed, cfg):
    pdf = generate_token_sequences(n_docs=70, seed=seed)
    pdf = pdf.sort_values(["source", "doc_id", "ts_us", "event_seq"], kind="mergesort")
    ts_sorted = np.sort(pdf["ts_us"].to_numpy(np.int64))
    scans = (
        scan_times_from_sorted(ts_sorted, cfg.check_interval_us)
        if cfg.scan_mode == "exact"
        else np.empty(0, np.int64)
    )
    flush_ts = int(ts_sorted[-1])

    # reference: per-key simple kernel
    expected = []
    for key, grp in pdf.groupby(["source", "doc_id"], sort=True):
        rows = featurize_key_events(
            grp["ts_us"].to_numpy(np.int64),
            grp["n_tok"].to_numpy(np.float64),
            grp["direction"].to_numpy(np.int64),
            grp["terminator"].to_numpy(np.int64),
            cfg,
            scans,
            flush_ts,
        )
        for r in rows:
            r["source"], r["doc_id"] = key
            expected.append(r)
    edf = pd.DataFrame(expected)

    # block kernel over the whole sorted frame at once
    key_ids = pd.factorize(pd.MultiIndex.from_frame(pdf[["source", "doc_id"]]))[0]
    res = featurize_block(
        key_ids.astype(np.int64),
        pdf["ts_us"].to_numpy(np.int64),
        pdf["n_tok"].to_numpy(np.float64),
        pdf["direction"].to_numpy(np.int64),
        pdf["terminator"].to_numpy(np.int64),
        cfg,
        scans,
        flush_ts,
    )
    rows = res.pop("session_row")
    bdf = pd.DataFrame({k: v for k, v in res.items() if k in EVENT_FEATURE_COLUMNS})
    bdf["source"] = pdf["source"].to_numpy()[rows]
    bdf["doc_id"] = pdf["doc_id"].to_numpy()[rows]

    key = ["source", "doc_id", "session_index"]
    edf = edf.sort_values(key).reset_index(drop=True)
    bdf = bdf.sort_values(key).reset_index(drop=True)
    assert len(edf) == len(bdf)
    for col in EVENT_FEATURE_COLUMNS:
        e, b = edf[col], bdf[col]
        if e.dtype == object:
            assert (e == b).all(), f"column {col} differs"
        else:
            assert np.allclose(
                e.astype(float), b.astype(float), rtol=1e-9, atol=1e-9
            ), f"column {col} differs: {e[(~np.isclose(e.astype(float), b.astype(float))).to_numpy()].head()} vs {b[(~np.isclose(e.astype(float), b.astype(float))).to_numpy()].head()}"


# ---------------------------------------------------------------------------
# Property-based fuzz: ANY event stream, tiny timeouts, equal timestamps,
# terminator soup — block kernel must equal the per-key reference kernel.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st


@st.composite
def event_stream(draw):
    n_keys = draw(st.integers(min_value=1, max_value=4))
    rows = []
    for k in range(n_keys):
        n = draw(st.integers(min_value=1, max_value=25))
        ts = 1_000_000
        for i in range(n):
            ts += draw(st.integers(min_value=0, max_value=12_000_000))
            rows.append(
                (
                    f"k{k}",
                    ts,
                    float(draw(st.integers(min_value=0, max_value=500))),
                    draw(st.integers(min_value=0, max_value=1)),
                    draw(st.integers(min_value=0, max_value=1)),
                    i,
                )
            )
    return pd.DataFrame(
        rows, columns=["key", "ts_us", "n_tok", "direction", "terminator", "event_seq"]
    )


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    pdf=event_stream(),
    active=st.integers(min_value=1, max_value=30),
    idle=st.integers(min_value=1, max_value=12),
    scan=st.booleans(),
)
def test_event_kernel_fuzz(pdf, active, idle, scan):
    cfg = EngineConfig(
        active_timeout=active,
        idle_timeout=idle,
        expiration_check_interval=3,
        scan_mode="exact" if scan else "none",
    )
    pdf = pdf.sort_values(["key", "ts_us", "event_seq"], kind="mergesort")
    ts_sorted = np.sort(pdf["ts_us"].to_numpy(np.int64))
    scans = (
        scan_times_from_sorted(ts_sorted, cfg.check_interval_us)
        if cfg.scan_mode == "exact"
        else np.empty(0, np.int64)
    )
    flush_ts = int(ts_sorted[-1])

    expected = []
    for key, grp in pdf.groupby("key", sort=True):
        for r in featurize_key_events(
            grp["ts_us"].to_numpy(np.int64),
            grp["n_tok"].to_numpy(np.float64),
            grp["direction"].to_numpy(np.int64),
            grp["terminator"].to_numpy(np.int64),
            cfg,
            scans,
            flush_ts,
        ):
            r["key"] = key
            expected.append(r)
    edf = pd.DataFrame(expected)

    key_ids = pd.factorize(pdf["key"])[0]
    res = featurize_block(
        key_ids.astype(np.int64),
        pdf["ts_us"].to_numpy(np.int64),
        pdf["n_tok"].to_numpy(np.float64),
        pdf["direction"].to_numpy(np.int64),
        pdf["terminator"].to_numpy(np.int64),
        cfg,
        scans,
        flush_ts,
    )
    rows = res.pop("session_row")
    bdf = pd.DataFrame({k: v for k, v in res.items() if k in EVENT_FEATURE_COLUMNS})
    bdf["key"] = pdf["key"].to_numpy()[rows]

    order = ["key", "session_index"]
    edf = edf.sort_values(order).reset_index(drop=True)
    bdf = bdf.sort_values(order).reset_index(drop=True)
    assert len(edf) == len(bdf)
    for col in EVENT_FEATURE_COLUMNS:
        e, b = edf[col], bdf[col]
        if e.dtype == object:
            assert (e == b).all(), f"column {col} differs"
        else:
            assert np.allclose(
                e.astype(float), b.astype(float), rtol=1e-9, atol=1e-9
            ), f"column {col} differs"
