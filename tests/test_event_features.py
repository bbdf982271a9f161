"""Event/token sessionization: kernel vs an independent slow oracle, plus
the Spark operator end-to-end with the token-equality invariant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rustiflow_spark.config import (
    CAUSE_ACTIVE,
    CAUSE_IDLE,
    CAUSE_SHUTDOWN,
    CAUSE_TCP_TERM,
    EngineConfig,
)
from rustiflow_spark.kernel.event_kernel import featurize_key_events, segment_events
from rustiflow_spark.sources.synth import generate_token_sequences
from rustiflow_spark.timeline import scan_times_from_sorted


def slow_event_table(events_by_key: dict, cfg: EngineConfig):
    """Independent event-time simulation of the reference FlowTable over
    keyed events (terminator = TCP-termination analog). Processes the global
    ts-ordered stream with the periodic scan, like flow_table.rs:56-245."""
    all_events = []
    for key, evs in events_by_key.items():
        for ts, term in evs:
            all_events.append((ts, key, term))
    all_events.sort()
    live: dict = {}  # key -> [first, last, [events]]
    exported = []
    next_check = None
    interval = cfg.check_interval_us

    def is_expired(state, t):
        if (t - state[0]) // 1_000_000 > cfg.active_timeout:
            return True, CAUSE_ACTIVE
        if (t - state[1]) // 1_000_000 > cfg.idle_timeout:
            return True, CAUSE_IDLE
        return False, None

    for t, key, term in all_events:
        if next_check is None or t >= next_check:
            for k in list(live):
                exp, cause = is_expired(live[k], t)
                if exp:
                    st = live.pop(k)
                    exported.append((k, st[2], cause, t, True))
            next_check = t + interval
        st = live.get(key)
        if st is not None:
            exp, cause = is_expired(st, t)
            if exp:
                live.pop(key)
                exported.append((key, st[2], cause, t, True))
                st = None
        if st is None:
            st = [t, t, []]
            live[key] = st
        st[1] = t
        st[2].append(t)
        if term:
            live.pop(key)
            exported.append((key, st[2], CAUSE_TCP_TERM, t, False))
    last_ts = all_events[-1][0] if all_events else 0
    for k, st in sorted(live.items(), key=lambda kv: kv[1][0]):
        exported.append((k, st[2], CAUSE_SHUTDOWN, last_ts, True))
    return exported


@pytest.mark.parametrize("seed", [1, 42])
@pytest.mark.parametrize(
    "cfg",
    [
        EngineConfig(),
        EngineConfig(active_timeout=40, idle_timeout=9, expiration_check_interval=6),
    ],
)
def test_segmentation_matches_slow_oracle(seed, cfg):
    pdf = generate_token_sequences(n_docs=80, seed=seed)
    events_by_key = {}
    for r in pdf.itertuples(index=False):
        events_by_key.setdefault((r.source, r.doc_id), []).append((r.ts_us, r.terminator))
    expected = slow_event_table(events_by_key, cfg)

    ts_sorted = np.sort(pdf["ts_us"].to_numpy(np.int64))
    scans = scan_times_from_sorted(ts_sorted, cfg.check_interval_us)
    flush_ts = int(ts_sorted[-1])

    got = []
    for key, grp in pdf.groupby(["source", "doc_id"]):
        grp = grp.sort_values(["ts_us", "event_seq"], kind="mergesort")
        ts = grp["ts_us"].to_numpy(np.int64)
        term = grp["terminator"].to_numpy(np.int64)
        for s, e, cause, close_ts, closed in segment_events(ts, term, cfg, scans, flush_ts):
            got.append((key, list(ts[s:e]), cause, close_ts, closed))

    def norm(rows):
        return sorted((tuple(k), tuple(evs), c, ct, cl) for k, evs, c, ct, cl in rows)

    assert norm(expected) == norm(got)


def test_feature_values_basic():
    cfg = EngineConfig(active_timeout=1000, idle_timeout=100)
    ts = np.array([0, 1_000_000, 3_000_000, 10_000_000], dtype=np.int64) + 1_700_000_000_000_000
    value = np.array([10, 20, 30, 40], dtype=np.float64)
    direction = np.array([0, 1, 0, 1], dtype=np.int64)
    term = np.zeros(4, dtype=np.int64)
    rows = featurize_key_events(
        ts, value, direction, term, cfg, np.empty(0, np.int64), int(ts[-1])
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["event_count"] == 4
    assert r["fwd_event_count"] == 2 and r["bwd_event_count"] == 2
    assert r["n_tok_total"] == 100.0
    assert r["n_tok_mean"] == 25.0
    assert np.isclose(r["n_tok_std"], np.std([10, 20, 30, 40]))
    assert r["duration_us"] == 10_000_000
    assert np.isclose(r["iat_mean"], (1000 + 2000 + 7000) / 3)
    assert np.isclose(r["tok_per_s"], 100 / 10.0)
    assert r["subflow_count"] == 1 + 2  # gaps 2s and 7s exceed 1s
    assert r["down_up_ratio"] == 1.0
    # active/idle: gap 7s > 5s splits spans [0,3s] and [10s,10s]
    assert np.isclose(r["active_total"], 3000.0)
    assert np.isclose(r["idle_total"], 7000.0)


def test_spark_event_features_and_token_passthrough(spark):
    from rustiflow_spark.operators.event_features import assign_sessions, sessionize_events

    pdf = generate_token_sequences(n_docs=60, seed=4)
    sdf = spark.createDataFrame(pdf)
    cfg = EngineConfig()

    feats = sessionize_events(sdf, ["source", "doc_id"], cfg).toPandas()
    assert (feats["event_count"] >= 1).all()
    assert set(feats["cause"]).issubset(
        {CAUSE_ACTIVE, CAUSE_IDLE, CAUSE_TCP_TERM, CAUSE_SHUTDOWN}
    )
    # session count consistency vs direct kernel run
    total_events = feats["event_count"].sum()
    assert total_events == len(pdf)

    annotated = assign_sessions(sdf, ["source", "doc_id"], cfg).toPandas()
    assert len(annotated) == len(pdf)
    # exact token-array passthrough (input_hint invariant)
    left = pdf.sort_values("event_seq").reset_index(drop=True)
    right = annotated.sort_values("event_seq").reset_index(drop=True)
    for i in range(len(left)):
        assert list(left["tokens"][i]) == list(right["tokens"][i])
    assert (right.groupby(["source", "doc_id"])["session_index"].min() == 0).all()
