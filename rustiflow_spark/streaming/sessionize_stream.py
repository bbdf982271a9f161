"""Structured Streaming sessionization — the realtime-path analog of the
reference's eBPF pipeline (SURVEY.md §2.1 S6/S7; rustiflow/src/realtime.rs).

The reference drains kernel ring buffers into sharded in-memory flow tables;
the Spark-native re-expression is ``readStream -> groupBy(key) ->
applyInPandasWithState`` with event-time timeouts:

  * per-key state = the open (not yet exported) session's event buffer
  * every micro-batch merges buffered + new events, runs the SAME
    segmentation kernel as the batch path (kernel/event_kernel.py), emits
    all sessions that are provably closed (a successor event observed their
    expiry, or a terminator event ended them)
  * the trailing open session stays in state; an event-time timeout set at
    its idle-expiry instant flushes it with cause Idle Timeout when the
    watermark passes

Differences vs batch (documented, not hidden): close timestamps for
timeout-flushed sessions are the idle-expiry instant rather than the
reference's scan-time (the periodic scan is a single-process construct);
segmentation and all feature values are identical — asserted by the
equivalence test in tests/test_streaming.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from rustiflow_spark.config import CAUSE_ACTIVE, CAUSE_IDLE, EngineConfig
from rustiflow_spark.kernel.event_kernel import featurize_key_events, segment_events

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.ArrayType(T.LongType())),
        T.StructField("value", T.ArrayType(T.DoubleType())),
        T.StructField("direction", T.ArrayType(T.LongType())),
        T.StructField("terminator", T.ArrayType(T.LongType())),
        T.StructField("session_base", T.LongType()),
    ]
)


def output_schema(key_fields: list[T.StructField]) -> T.StructType:
    from rustiflow_spark.kernel.event_kernel import EVENT_FEATURE_COLUMNS

    fields = list(key_fields)
    for name in EVENT_FEATURE_COLUMNS:
        if name in ("session_index", "event_count", "fwd_event_count", "bwd_event_count",
                    "subflow_count"):
            fields.append(T.StructField(name, T.IntegerType()))
        elif name in ("first_ts_us", "last_ts_us", "duration_us"):
            fields.append(T.StructField(name, T.LongType()))
        elif name == "cause":
            fields.append(T.StructField(name, T.StringType()))
        else:
            fields.append(T.StructField(name, T.DoubleType()))
    return T.StructType(fields)


def sessionize_stream(
    events: DataFrame,
    key_cols: list[str],
    cfg: EngineConfig | None = None,
    ts_col: str = "ts_us",
    value_col: str = "n_tok",
    direction_col: str = "direction",
    terminator_col: str = "terminator",
    watermark_delay: str = "10 seconds",
    ordinal_ttl_s: int = 3600,
) -> DataFrame:
    """Streaming session features. `events` must be a streaming DataFrame.

    Late data beyond `watermark_delay` is dropped by the watermark — the
    batch path has no such loss (it sorts globally), which is the standard
    streaming-vs-batch tradeoff.

    ordinal_ttl_s bounds state for fully-flushed keys: the per-key session
    ordinal is kept in an empty state entry so session_index stays
    continuous across micro-batches, and that entry expires ordinal_ttl_s
    of event time after the key's last event (past the horizon a returning
    key restarts session_index at 0 — documented divergence; without the
    TTL the state store would grow without bound on high-cardinality
    ephemeral keys)."""
    cfg = cfg or EngineConfig()
    key_fields = [f for f in events.schema.fields if f.name in key_cols]
    out_schema = output_schema(key_fields)
    out_cols = [f.name for f in out_schema.fields]
    no_scans = np.empty(0, dtype=np.int64)

    def func(key: tuple, pdfs, state: GroupState):
        if state.exists:
            ts_b, val_b, dir_b, term_b, base = state.get
        else:
            ts_b, val_b, dir_b, term_b, base = [], [], [], [], 0

        new = [pd.DataFrame({
            "ts": pdf[ts_col].to_numpy(np.int64),
            "v": pdf[value_col].to_numpy(np.float64),
            "d": pdf[direction_col].to_numpy(np.int64),
            "t": pdf[terminator_col].to_numpy(np.int64),
        }) for pdf in pdfs]

        buf = pd.DataFrame({
            "ts": np.asarray(ts_b, dtype=np.int64),
            "v": np.asarray(val_b, dtype=np.float64),
            "d": np.asarray(dir_b, dtype=np.int64),
            "t": np.asarray(term_b, dtype=np.int64),
        })
        allev = pd.concat([buf] + new, ignore_index=True) if new else buf
        if not len(allev):
            if state.hasTimedOut:
                state.remove()
            return
        allev = allev.sort_values("ts", kind="mergesort")
        ts = allev["ts"].to_numpy(np.int64)
        val = allev["v"].to_numpy(np.float64)
        dr = allev["d"].to_numpy(np.int64)
        tm = allev["t"].to_numpy(np.int64)

        flush_all = state.hasTimedOut
        # closed sessions = every session except the trailing open one,
        # unless we are flushing on timeout
        sessions = segment_events(ts, tm, cfg, no_scans, int(ts[-1]))
        n_emit = len(sessions) if flush_all else len(sessions) - 1
        # a trailing session ended by a terminator is closed too
        if not flush_all and sessions and sessions[-1][2] == "TCP Normal Termination":
            n_emit = len(sessions)

        rows = []
        if n_emit > 0:
            feats = featurize_key_events(ts, val, dr, tm, cfg, no_scans, int(ts[-1]))
            for i in range(n_emit):
                r = feats[i]
                if flush_all and i == len(sessions) - 1 and r["cause"] == "Exporter Shutdown":
                    # timeout flush: the watermark passed the earlier of the
                    # two expiries; active is checked first (basic_flow.rs:361)
                    r = dict(r)
                    s0, e0 = sessions[i][0], sessions[i][1]
                    active_exp = cfg.active_expiry_us(int(ts[s0]))
                    idle_exp = cfg.idle_expiry_us(int(ts[e0 - 1]))
                    r["cause"] = CAUSE_ACTIVE if active_exp <= idle_exp else CAUSE_IDLE
                rows.append(r)

        # event-time timeouts must land strictly past the current watermark
        # (a backlog replay can make an expiry predate the stream head, and
        # Spark rejects timestamps <= watermark with IllegalArgumentException)
        def set_timeout(at_us: int) -> None:
            state.setTimeoutTimestamp(
                max(at_us // 1000, state.getCurrentWatermarkMs() + 1)
            )

        if n_emit >= len(sessions):
            # keep the per-key session ordinal across micro-batches: an
            # empty buffer + the advanced base. Removing state here would
            # restart session_index at 0 for the key's next event and emit
            # duplicate (key, session_index) rows, diverging from the batch
            # path's continuous ordinal. The entry expires after
            # ordinal_ttl_s of event time (the timeout handler sees an
            # empty buffer and removes it) so state stays bounded.
            state.update(([], [], [], [], base + n_emit))
            set_timeout(int(ts[-1]) + ordinal_ttl_s * 1_000_000)
        else:
            s, e = sessions[-1][0], sessions[-1][1]
            state.update((
                [int(x) for x in ts[s:e]],
                [float(x) for x in val[s:e]],
                [int(x) for x in dr[s:e]],
                [int(x) for x in tm[s:e]],
                base + n_emit,
            ))
            # flush at whichever expiry comes first: idle (vs last event) or
            # active (vs the open session's first event)
            expiry_us = min(
                cfg.idle_expiry_us(int(ts[e - 1])), cfg.active_expiry_us(int(ts[s]))
            )
            set_timeout(expiry_us)

        if rows:
            out = pd.DataFrame(rows)
            out["session_index"] = out["session_index"] + base
            for col, v in zip(key_cols, key):
                out[col] = v
            yield out.reindex(columns=out_cols)

    with_watermark = events.withColumn(
        "__event_time", F.timestamp_micros(F.col(ts_col))
    ).withWatermark("__event_time", watermark_delay)

    return with_watermark.groupBy(*key_cols).applyInPandasWithState(
        func,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Packet-path streaming (the realtime eBPF pipeline analog for flows)
# ---------------------------------------------------------------------------

_PKT_STATE_COLS = [
    "ts_us", "fin_flag", "syn_flag", "rst_flag", "psh_flag", "ack_flag",
    "urg_flag", "cwr_flag", "ece_flag", "flags", "data_length",
    "header_length", "length", "window_size", "sequence_number",
    "sequence_number_ack", "protocol", "event_seq", "icmp_type", "icmp_code",
]

PACKET_STATE_SCHEMA = T.StructType(
    [T.StructField(c, T.ArrayType(T.LongType())) for c in _PKT_STATE_COLS]
    + [T.StructField("dir_a", T.ArrayType(T.BooleanType()))]
)


def sessionize_packets_stream(
    events: DataFrame,
    cfg: EngineConfig | None = None,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming flow extraction: packet events -> full feature-superset
    flow rows, one open flow buffered per biflow key.

    Mirrors the reference's realtime path (rustiflow/src/realtime.rs): a
    flow is exported as soon as it is provably closed — a successor packet
    observed its expiry, or TCP termination (FIN sequence / RST) ended it —
    and the trailing open flow flushes on an event-time timeout at its
    idle/active expiry instant. Same documented close-ts divergence as the
    event path (expiry instant instead of scan time)."""
    from rustiflow_spark.config import CAUSE_TCP_RESET, CAUSE_TCP_TERM
    from rustiflow_spark.kernel.flow_kernel import (
        compute_session_features,
        segment_biflow,
    )
    from rustiflow_spark.operators.sessionize import with_canonical_key
    from rustiflow_spark.schema import FLOW_SUPERSET_COLUMNS, FLOW_SUPERSET_SCHEMA

    cfg = cfg or EngineConfig()
    key_cols = ["key_ip_a", "key_port_a", "key_ip_b", "key_port_b", "protocol"]
    no_scans = np.empty(0, dtype=np.int64)
    proto_tcp = 6

    def func(key: tuple, pdfs, state: GroupState):
        if state.exists:
            stored = state.get
            bufs = {c: np.asarray(stored[i], dtype=np.int64)
                    for i, c in enumerate(_PKT_STATE_COLS)}
            bufs["dir_a"] = np.asarray(stored[len(_PKT_STATE_COLS)], dtype=bool)
        else:
            bufs = {c: np.empty(0, dtype=np.int64) for c in _PKT_STATE_COLS}
            bufs["dir_a"] = np.empty(0, dtype=bool)

        parts = [bufs]
        for pdf in pdfs:
            g = {}
            for c in _PKT_STATE_COLS:
                if c in ("icmp_type", "icmp_code"):
                    g[c] = pdf[c].to_numpy(dtype=np.float64, na_value=-1).astype(np.int64)
                else:
                    g[c] = pdf[c].to_numpy(dtype=np.int64, na_value=0)
            g["dir_a"] = pdf["dir_a"].to_numpy(dtype=bool)
            parts.append(g)
        merged = {
            c: np.concatenate([p[c] for p in parts])
            for c in (*_PKT_STATE_COLS, "dir_a")
        }
        n = merged["ts_us"].size
        if n == 0:
            if state.hasTimedOut:
                state.remove()
            return
        order = np.lexsort((merged["event_seq"], merged["ts_us"]))
        merged = {c: v[order] for c, v in merged.items()}

        ts = merged["ts_us"]
        protocol = int(merged["protocol"][0])
        tcp_ctl = None
        if protocol == proto_tcp:
            tcp_ctl = {
                "fin": merged["fin_flag"], "rst": merged["rst_flag"],
                "syn": merged["syn_flag"], "ack": merged["ack_flag"],
                "seq": merged["sequence_number"],
                "ack_seq": merged["sequence_number_ack"],
                "data_len": merged["data_length"],
            }
        flush_all = state.hasTimedOut
        all_sessions = segment_biflow(
            ts, merged["dir_a"], protocol, tcp_ctl, cfg, no_scans, int(ts[-1])
        )
        # early-export snapshots (snapshot_of >= 0) ride at the tail of the
        # session list and must not drive the emit/keep logic: a snapshot is
        # emitted exactly once, alongside the close of its parent session
        # (snapshots of the still-open trailing flow regenerate next batch).
        sessions = [x for x in all_sessions if x.snapshot_of < 0]
        snaps = [x for x in all_sessions if x.snapshot_of >= 0]
        n_emit = len(sessions) if flush_all else len(sessions) - 1
        if not flush_all and sessions and sessions[-1].cause in (
            CAUSE_TCP_TERM, CAUSE_TCP_RESET,
        ):
            n_emit = len(sessions)

        rows = []
        if n_emit > 0:
            gm = dict(merged)
            gm.update({
                "src_ip_a": key[0], "src_port_a": int(key[1]),
                "dst_ip_a": key[2], "dst_port_a": int(key[3]),
            })
            emitted_end = sessions[n_emit - 1].end
            for i in range(n_emit):
                r = compute_session_features(gm, sessions[i], cfg)
                if (
                    flush_all
                    and i == len(sessions) - 1
                    and r["cause"] == "Exporter Shutdown"
                ):
                    s0, e0 = sessions[i].start, sessions[i].end
                    active_exp = cfg.active_expiry_us(int(ts[s0]))
                    idle_exp = cfg.idle_expiry_us(int(ts[e0 - 1]))
                    r = dict(r)
                    r["cause"] = (
                        CAUSE_ACTIVE if active_exp <= idle_exp else CAUSE_IDLE
                    )
                rows.append(r)
            for snap in snaps:
                if flush_all or snap.end <= emitted_end:
                    rows.append(compute_session_features(gm, snap, cfg))

        if n_emit >= len(sessions):
            state.remove()  # flows carry no per-key ordinal; nothing to keep
        else:
            s, e = sessions[-1].start, sessions[-1].end
            state.update(tuple(
                [[int(x) for x in merged[c][s:e]] for c in _PKT_STATE_COLS]
                + [[bool(x) for x in merged["dir_a"][s:e]]]
            ))
            expiry_us = min(
                cfg.idle_expiry_us(int(ts[e - 1])), cfg.active_expiry_us(int(ts[s]))
            )
            # clamp strictly past the watermark (backlog replay can put an
            # idle expiry behind the stream head; Spark rejects <= watermark)
            state.setTimeoutTimestamp(
                max(expiry_us // 1000, state.getCurrentWatermarkMs() + 1)
            )

        if rows:
            yield pd.DataFrame(rows).reindex(columns=FLOW_SUPERSET_COLUMNS)

    keyed = with_canonical_key(events).withColumn(
        "__event_time", F.timestamp_micros(F.col("ts_us"))
    ).withWatermark("__event_time", watermark_delay)

    return keyed.groupBy(*key_cols).applyInPandasWithState(
        func,
        outputStructType=FLOW_SUPERSET_SCHEMA,
        stateStructType=PACKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
