"""Structured Streaming sessionization — the realtime-path analog of the
reference's eBPF pipeline (SURVEY.md §2.1 S6/S7; rustiflow/src/realtime.rs).

The reference drains kernel ring buffers into sharded in-memory flow tables;
the Spark-native re-expression is ``readStream -> groupBy(key) ->
applyInPandasWithState`` with event-time timeouts:

  * per-key state = an O(1) feature ACCUMULATOR for the open session's
    watermark-frozen prefix (kernel/event_accum.py — the reference's
    "state never holds raw packets" rule, flow_table.rs:24) plus only the
    raw events still inside the watermark horizon, where late data may yet
    interleave. State size is O(watermark_delay x event_rate), independent
    of session length: a key emitting 10k ev/s inside a 1-hour active
    window holds ~delay-seconds of raw events, not 36M.
  * every micro-batch sorts the horizon buffer + new events, segments them
    with the SAME cut rules as the batch kernel (prefix-aware variant of
    kernel/event_kernel.py:segment_events), emits every session that is
    provably closed (a successor event observed its expiry, or a
    terminator event ended it), folds the surviving open session's
    now-frozen events (ts < current watermark) into the accumulator and
    keeps the rest raw
  * the trailing open session stays in state; an event-time timeout set at
    its idle/active-expiry instant flushes it when the watermark passes

Differences vs batch (documented, not hidden): close timestamps for
timeout-flushed sessions are the idle-expiry instant rather than the
reference's scan-time (the periodic scan is a single-process construct);
statistic blocks of sessions spanning micro-batches are Chan-merged
partials, equal to the batch two-pass values up to float associativity
(np.isclose-asserted by the equivalence tests in tests/test_streaming.py;
the contract query rounds emitted floats).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from rustiflow_spark.config import (
    CAUSE_ACTIVE,
    CAUSE_IDLE,
    CAUSE_SHUTDOWN,
    CAUSE_TCP_TERM,
    US_PER_S,
    EngineConfig,
)
from rustiflow_spark.kernel.event_accum import acc_finalize, acc_fold
from rustiflow_spark.kernel.event_kernel import segment_events
from rustiflow_spark.kernel.flow_kernel import _timeout_close

STATE_SCHEMA = T.StructType(
    [
        T.StructField("acc_i", T.ArrayType(T.LongType())),
        T.StructField("acc_f", T.ArrayType(T.DoubleType())),
        T.StructField("ts", T.ArrayType(T.LongType())),
        T.StructField("value", T.ArrayType(T.DoubleType())),
        T.StructField("direction", T.ArrayType(T.LongType())),
        T.StructField("terminator", T.ArrayType(T.LongType())),
        T.StructField("session_base", T.LongType()),
    ]
)

_NO_SCANS = np.empty(0, dtype=np.int64)


def _segment_tail_with_prefix(
    acc_first: int,
    acc_last: int,
    ts: np.ndarray,
    terminator: np.ndarray,
    cfg: EngineConfig,
    flush_ts: int,
) -> tuple[int, str, int, bool, bool]:
    """Where does the accumulator-anchored open session end within the raw
    tail? Mirrors segment_events' cut precedence (event_kernel.py:39) with
    the session's first event virtualized at acc_first and the previous
    event at acc_last. Returns (n_tail_events_in_session, cause, close_ts,
    closed, still_open)."""
    n = ts.size
    if n == 0:
        cause, close_ts = _timeout_close(
            cfg, acc_first, acc_last, -1, _NO_SCANS, flush_ts
        )
        return 0, cause, close_ts, True, True
    active_us = (cfg.active_timeout + 1) * US_PER_S
    idle_us = (cfg.idle_timeout + 1) * US_PER_S
    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = ts[0] - acc_last
    if n > 1:
        gaps[1:] = np.diff(ts)
    idle_pos = np.flatnonzero(gaps >= idle_us)
    next_idle = int(idle_pos[0]) if idle_pos.size else n
    next_active = int(np.searchsorted(ts, acc_first + active_us, side="left"))
    e = min(next_idle, next_active, n)
    term_pos = np.flatnonzero(terminator > 0)
    next_term = int(term_pos[0]) + 1 if term_pos.size else n + 1
    if next_term <= e:
        return next_term, CAUSE_TCP_TERM, int(ts[next_term - 1]), False, False
    last = int(ts[e - 1]) if e > 0 else acc_last
    if e >= n:
        cause, close_ts = _timeout_close(
            cfg, acc_first, last, -1, _NO_SCANS, flush_ts
        )
        return n, cause, close_ts, True, True
    cause, close_ts = _timeout_close(
        cfg, acc_first, last, int(ts[e]), _NO_SCANS, flush_ts
    )
    return e, cause, close_ts, True, False


def _advance_event_key(
    acc: tuple[np.ndarray, np.ndarray] | None,
    ts: np.ndarray,
    val: np.ndarray,
    dr: np.ndarray,
    tm: np.ndarray,
    cfg: EngineConfig,
    watermark_us: int,
    flush_all: bool,
) -> tuple[list[dict], tuple[np.ndarray, np.ndarray] | None, dict | None]:
    """Pure per-key micro-batch transition (unit-testable without Spark).

    Inputs: the open session's accumulator (or None), the sorted raw event
    arrays (horizon buffer + this batch), the current watermark and whether
    this is a timeout flush. Returns (emitted_rows, new_acc, new_tail) with
    new_tail a dict of arrays holding ONLY events >= watermark_us (None
    alongside new_acc=None when every session closed)."""
    from rustiflow_spark.kernel.event_accum import I_FIRST_TS, I_LAST_TS

    n = ts.size
    if acc is None and n == 0:
        return [], None, None
    flush_ts = int(ts[-1]) if n else int(acc[0][I_LAST_TS])

    # (start, end, cause, close_ts, closed, uses_acc) over the raw tail
    sessions: list[tuple[int, int, str, int, bool, bool]] = []
    if acc is not None:
        e0, cause0, cts0, closed0, open0 = _segment_tail_with_prefix(
            int(acc[0][I_FIRST_TS]), int(acc[0][I_LAST_TS]), ts, tm, cfg, flush_ts
        )
        sessions.append((0, e0, cause0, cts0, closed0, True))
        rest_from = e0 if not open0 else n
    else:
        rest_from = 0
    if rest_from < n:
        for s, e, cause, close_ts, closed in segment_events(
            ts[rest_from:], tm[rest_from:], cfg, _NO_SCANS, flush_ts
        ):
            sessions.append(
                (s + rest_from, e + rest_from, cause, close_ts, closed, False)
            )

    n_emit = len(sessions) if flush_all else len(sessions) - 1
    if not flush_all and sessions and sessions[-1][2] == CAUSE_TCP_TERM:
        n_emit = len(sessions)

    rows: list[dict] = []
    for i in range(n_emit):
        s, e, cause, close_ts, closed, uses_acc = sessions[i]
        a = acc_fold(acc if uses_acc else None, ts[s:e], val[s:e], dr[s:e])
        row = acc_finalize(a, cause, close_ts, closed)
        if (
            flush_all
            and i == len(sessions) - 1
            and cause == CAUSE_SHUTDOWN
        ):
            # timeout flush: the watermark passed the earlier of the two
            # expiries; active is checked first (basic_flow.rs:361). The
            # relabel happens AFTER finalize — the feature values stay the
            # batch kernel's shutdown-flush values (no trailing idle gap).
            first = int(acc[0][I_FIRST_TS]) if uses_acc else int(ts[s])
            last = int(ts[e - 1]) if e > s else int(acc[0][I_LAST_TS])
            active_exp = cfg.active_expiry_us(first)
            idle_exp = cfg.idle_expiry_us(last)
            row["cause"] = CAUSE_ACTIVE if active_exp <= idle_exp else CAUSE_IDLE
        row["session_index"] = i
        rows.append(row)

    if n_emit >= len(sessions):
        return rows, None, None

    # trailing open session: fold its watermark-frozen prefix, keep the rest
    s, e, _, _, _, uses_acc = sessions[-1]
    frozen_end = s + int(np.searchsorted(ts[s:e], watermark_us, side="left"))
    new_acc = acc if uses_acc else None
    if frozen_end > s:
        new_acc = acc_fold(
            new_acc, ts[s:frozen_end], val[s:frozen_end], dr[s:frozen_end]
        )
    tail = {
        "ts": ts[frozen_end:e],
        "value": val[frozen_end:e],
        "direction": dr[frozen_end:e],
        "terminator": tm[frozen_end:e],
    }
    return rows, new_acc, tail


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

    def func(key: tuple, pdfs, state: GroupState):
        from rustiflow_spark.kernel.event_accum import I_FIRST_TS, I_LAST_TS

        if state.exists:
            acc_i, acc_f, ts_b, val_b, dir_b, term_b, base = state.get
            acc = (
                (np.asarray(acc_i, dtype=np.int64),
                 np.asarray(acc_f, dtype=np.float64))
                if acc_i else None
            )
        else:
            acc, ts_b, val_b, dir_b, term_b, base = None, [], [], [], [], 0

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
        if not len(allev) and acc is None:
            if state.hasTimedOut:
                state.remove()
            return
        allev = allev.sort_values("ts", kind="mergesort")

        wm_us = state.getCurrentWatermarkMs() * 1000
        rows, new_acc, tail = _advance_event_key(
            acc,
            allev["ts"].to_numpy(np.int64),
            allev["v"].to_numpy(np.float64),
            allev["d"].to_numpy(np.int64),
            allev["t"].to_numpy(np.int64),
            cfg,
            wm_us,
            state.hasTimedOut,
        )

        # event-time timeouts must land strictly past the current watermark
        # (a backlog replay can make an expiry predate the stream head, and
        # Spark rejects timestamps <= watermark with IllegalArgumentException)
        def set_timeout(at_us: int) -> None:
            state.setTimeoutTimestamp(
                max(at_us // 1000, state.getCurrentWatermarkMs() + 1)
            )

        if new_acc is None and tail is None:
            # keep the per-key session ordinal across micro-batches: an
            # empty entry + the advanced base. Removing state here would
            # restart session_index at 0 for the key's next event and emit
            # duplicate (key, session_index) rows, diverging from the batch
            # path's continuous ordinal. The entry expires after
            # ordinal_ttl_s of event time (the timeout handler sees an
            # empty entry and removes it) so state stays bounded.
            last_ts = int(allev["ts"].iloc[-1]) if len(allev) else wm_us
            state.update(([], [], [], [], [], [], base + len(rows)))
            set_timeout(last_ts + ordinal_ttl_s * 1_000_000)
        else:
            ai = new_acc[0] if new_acc is not None else None
            first_ts = (
                int(ai[I_FIRST_TS]) if ai is not None else int(tail["ts"][0])
            )
            last_ts = (
                int(tail["ts"][-1]) if tail["ts"].size
                else int(ai[I_LAST_TS])
            )
            state.update((
                [int(x) for x in new_acc[0]] if new_acc is not None else [],
                [float(x) for x in new_acc[1]] if new_acc is not None else [],
                [int(x) for x in tail["ts"]],
                [float(x) for x in tail["value"]],
                [int(x) for x in tail["direction"]],
                [int(x) for x in tail["terminator"]],
                base + len(rows),
            ))
            # flush at whichever expiry comes first: idle (vs last event) or
            # active (vs the open session's first event)
            expiry_us = min(
                cfg.idle_expiry_us(last_ts), cfg.active_expiry_us(first_ts)
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

# acc mode: fixed-size accumulator + retrans range lists + the raw
# watermark-horizon buffer
PACKET_ACC_STATE_SCHEMA = T.StructType(
    [
        T.StructField("acc_i", T.ArrayType(T.LongType())),
        T.StructField("acc_f", T.ArrayType(T.DoubleType())),
        T.StructField("rf_s", T.ArrayType(T.LongType())),
        T.StructField("rf_e", T.ArrayType(T.LongType())),
        T.StructField("rb_s", T.ArrayType(T.LongType())),
        T.StructField("rb_e", T.ArrayType(T.LongType())),
    ]
    + [T.StructField(c, T.ArrayType(T.LongType())) for c in _PKT_STATE_COLS]
    + [T.StructField("dir_a", T.ArrayType(T.BooleanType()))]
)


def _segment_flow_tail_with_prefix(acc: dict, g: dict, cfg: EngineConfig,
                                   flush_ts: int):
    """Continue the accumulator-anchored open flow's segmentation over the
    raw tail — the resume twin of flow_kernel.segment_biflow's per-session
    loop, with the session's first packet virtualized at the accumulator's
    first_ts and the TCP lifecycle machine restored from the accumulator.
    Returns (n_tail_pkts_in_flow, cause, close_ts, closed, still_open, st);
    st is a COPY advanced over tail[0:n_tail_pkts] (the durable machine in
    the accumulator only advances at fold time)."""
    from rustiflow_spark.kernel import flow_accum as fa
    from rustiflow_spark.config import PROTO_TCP

    ai = acc["i"]
    first = int(ai[fa.I_FIRST_TS])
    acc_last = int(ai[fa.I_LAST_TS])
    fwd_dir = bool(ai[fa.I_FIRST_DIR_A])
    protocol = int(ai[fa.I_PROTOCOL])
    st = fa.tcp_state_from_acc(ai)
    ts = g["ts_us"]
    n = ts.size
    if n == 0:
        cause, close_ts = _timeout_close(
            cfg, first, acc_last, -1, _NO_SCANS, flush_ts
        )
        return 0, cause, close_ts, True, True, st
    active_us = (cfg.active_timeout + 1) * US_PER_S
    idle_us = (cfg.idle_timeout + 1) * US_PER_S
    act_lim = first + active_us

    if protocol != PROTO_TCP:
        gaps = np.empty(n, dtype=np.int64)
        gaps[0] = ts[0] - acc_last
        if n > 1:
            gaps[1:] = np.diff(ts)
        idle_pos = np.flatnonzero(gaps >= idle_us)
        next_idle = int(idle_pos[0]) if idle_pos.size else n
        next_active = int(np.searchsorted(ts, act_lim, side="left"))
        e = min(next_idle, next_active, n)
        last = int(ts[e - 1]) if e > 0 else acc_last
        if e >= n:
            cause, close_ts = _timeout_close(
                cfg, first, last, -1, _NO_SCANS, flush_ts
            )
            return n, cause, close_ts, True, True, st
        cause, close_ts = _timeout_close(
            cfg, first, last, int(ts[e]), _NO_SCANS, flush_ts
        )
        return e, cause, close_ts, True, False, st

    # TCP: the per-packet lifecycle loop (segment_biflow's slow path with
    # the expiry check applied from packet 0 — mid-session resume)
    from rustiflow_spark.config import CAUSE_TCP_RESET

    ts_l = ts.tolist()
    dir_l = g["dir_a"].tolist()
    fin = g["fin_flag"].tolist()
    rst = g["rst_flag"].tolist()
    syn = g["syn_flag"].tolist()
    ack = g["ack_flag"].tolist()
    seq = g["sequence_number"].tolist()
    ack_seq = g["sequence_number_ack"].tolist()
    data_len = g["data_length"].tolist()
    prev_t = acc_last
    i = 0
    terminated = False
    term_cause = ""
    while i < n:
        t = ts_l[i]
        if t >= act_lim or t - prev_t >= idle_us:
            break
        fwd = dir_l[i] == fwd_dir
        if syn[i] or ack[i]:
            st.observe_handshake(fwd, syn[i] > 0, ack[i] > 0, seq[i], ack_seq[i])
        if (fin[i] or st.state_fwd or st.state_bwd) and st.is_finished(
            fwd, fin[i] > 0, seq[i], ack_seq[i], data_len[i]
        ):
            terminated = True
            term_cause = CAUSE_TCP_TERM
            i += 1
            break
        if rst[i]:
            if st.handshake:
                st.reset_after = True
            else:
                st.reset_before = True
            terminated = True
            term_cause = CAUSE_TCP_RESET
            i += 1
            break
        prev_t = t
        i += 1
    if terminated:
        return i, term_cause, ts_l[i - 1], False, False, st
    last = ts_l[i - 1] if i > 0 else acc_last
    if i >= n:
        cause, close_ts = _timeout_close(
            cfg, first, last, -1, _NO_SCANS, flush_ts
        )
        return n, cause, close_ts, True, True, st
    cause, close_ts = _timeout_close(
        cfg, first, last, int(ts_l[i]), _NO_SCANS, flush_ts
    )
    return i, cause, close_ts, True, False, st


def _advance_packet_key(
    acc: dict | None,
    g: dict[str, np.ndarray],
    cfg: EngineConfig,
    watermark_us: int,
    flush_all: bool,
    meta: dict,
) -> tuple[list[dict], dict | None, dict | None]:
    """Pure per-key micro-batch transition for the packet path (acc mode).
    Same contract as _advance_event_key: returns (rows, new_acc, new_tail)
    with the tail holding only packets >= watermark_us."""
    from rustiflow_spark.config import CAUSE_TCP_RESET, PROTO_TCP
    from rustiflow_spark.kernel import flow_accum as fa
    from rustiflow_spark.kernel.flow_kernel import segment_biflow

    ts = g["ts_us"]
    n = ts.size
    if acc is None and n == 0:
        return [], None, None
    flush_ts = int(ts[-1]) if n else int(acc["i"][fa.I_LAST_TS])

    # (s, e, cause, close_ts, closed, uses_acc, handshake, rst_before,
    #  rst_after, close_style)
    entries: list[tuple] = []
    trailing_open = False
    if acc is not None:
        e0, cause0, cts0, closed0, open0, st0 = _segment_flow_tail_with_prefix(
            acc, g, cfg, flush_ts
        )
        entries.append((
            0, e0, cause0, cts0, closed0, True,
            st0.handshake, st0.reset_before, st0.reset_after,
            st0.close_style(cause0),
        ))
        rest_from = n if open0 else e0
        trailing_open = open0
    else:
        rest_from = 0
    if rest_from < n:
        sub = {c: v[rest_from:] for c, v in g.items()}
        protocol = int(sub["protocol"][0])
        tcp_ctl = None
        if protocol == PROTO_TCP:
            tcp_ctl = {
                "fin": sub["fin_flag"], "rst": sub["rst_flag"],
                "syn": sub["syn_flag"], "ack": sub["ack_flag"],
                "seq": sub["sequence_number"],
                "ack_seq": sub["sequence_number_ack"],
                "data_len": sub["data_length"],
            }
        sessions = [
            x for x in segment_biflow(
                sub["ts_us"], sub["dir_a"], protocol, tcp_ctl, cfg,
                _NO_SCANS, flush_ts,
            )
            if x.snapshot_of < 0  # acc mode requires early_export=None
        ]
        for sess in sessions:
            entries.append((
                sess.start + rest_from, sess.end + rest_from, sess.cause,
                sess.close_ts, sess.closed, False, sess.handshake_completed,
                sess.reset_before_handshake, sess.reset_after_handshake,
                sess.close_style,
            ))
        trailing_open = sessions[-1].cause not in (
            CAUSE_TCP_TERM, CAUSE_TCP_RESET,
        )

    n_emit = len(entries) - 1 if (trailing_open and not flush_all) else len(entries)

    rows: list[dict] = []
    for i in range(n_emit):
        s, e, cause, cts, closed, uses_acc, hs, rb, ra, style = entries[i]
        a = fa.flow_acc_fold(
            acc if uses_acc else None, {c: v[s:e] for c, v in g.items()}
        )
        row = fa.flow_acc_finalize(a, meta, cause, cts, closed, hs, rb, ra, style)
        if flush_all and i == len(entries) - 1 and cause == CAUSE_SHUTDOWN:
            first = int(a["i"][fa.I_FIRST_TS])
            last = int(a["i"][fa.I_LAST_TS])
            active_exp = cfg.active_expiry_us(first)
            idle_exp = cfg.idle_expiry_us(last)
            row["cause"] = CAUSE_ACTIVE if active_exp <= idle_exp else CAUSE_IDLE
        rows.append(row)

    if n_emit >= len(entries):
        return rows, None, None

    s, e, _, _, _, uses_acc, _, _, _, _ = entries[-1]
    frozen_end = s + int(np.searchsorted(ts[s:e], watermark_us, side="left"))
    new_acc = acc if uses_acc else None
    if frozen_end > s:
        new_acc = fa.flow_acc_fold(
            new_acc, {c: v[s:frozen_end] for c, v in g.items()}
        )
    tail = {c: v[frozen_end:e] for c, v in g.items()}
    return rows, new_acc, tail


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
    event path (expiry instant instead of scan time).

    State (default): an O(1) FlowAccum (kernel/flow_accum.py) for the open
    flow's watermark-frozen prefix plus only the raw packets inside the
    watermark horizon — the reference's state-never-holds-raw-packets rule
    (flow_table.rs:24). With ``cfg.early_export`` set, the legacy raw
    buffer is used instead: early export re-exports the live flow's full
    prefix per packet past the threshold, so snapshots there are
    regenerated from the buffered packets each batch."""
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
    use_acc = cfg.early_export is None

    def _read_batches(pdfs) -> list[dict]:
        parts = []
        for pdf in pdfs:
            p = {}
            for c in _PKT_STATE_COLS:
                if c in ("icmp_type", "icmp_code"):
                    p[c] = pdf[c].to_numpy(dtype=np.float64, na_value=-1).astype(np.int64)
                else:
                    p[c] = pdf[c].to_numpy(dtype=np.int64, na_value=0)
            p["dir_a"] = pdf["dir_a"].to_numpy(dtype=bool)
            parts.append(p)
        return parts

    def func_acc(key: tuple, pdfs, state: GroupState):
        from rustiflow_spark.kernel import flow_accum as fa

        acc = None
        if state.exists:
            stored = state.get
            if stored[0]:
                acc = {
                    "i": np.asarray(stored[0], dtype=np.int64),
                    "f": np.asarray(stored[1], dtype=np.float64),
                    "rf_s": list(stored[2]), "rf_e": list(stored[3]),
                    "rb_s": list(stored[4]), "rb_e": list(stored[5]),
                }
            bufs = {c: np.asarray(stored[6 + i], dtype=np.int64)
                    for i, c in enumerate(_PKT_STATE_COLS)}
            bufs["dir_a"] = np.asarray(
                stored[6 + len(_PKT_STATE_COLS)], dtype=bool
            )
        else:
            bufs = {c: np.empty(0, dtype=np.int64) for c in _PKT_STATE_COLS}
            bufs["dir_a"] = np.empty(0, dtype=bool)

        parts = [bufs] + _read_batches(pdfs)
        merged = {
            c: np.concatenate([p[c] for p in parts])
            for c in (*_PKT_STATE_COLS, "dir_a")
        }
        if merged["ts_us"].size == 0 and acc is None:
            if state.hasTimedOut:
                state.remove()
            return
        order = np.lexsort((merged["event_seq"], merged["ts_us"]))
        merged = {c: v[order] for c, v in merged.items()}
        meta = {
            "src_ip_a": key[0], "src_port_a": int(key[1]),
            "dst_ip_a": key[2], "dst_port_a": int(key[3]),
        }
        wm_us = state.getCurrentWatermarkMs() * 1000
        rows, new_acc, tail = _advance_packet_key(
            acc, merged, cfg, wm_us, state.hasTimedOut, meta
        )

        if new_acc is None and tail is None:
            state.remove()  # flows carry no per-key ordinal; nothing to keep
        else:
            if new_acc is not None:
                acc_cols = (
                    [int(x) for x in new_acc["i"]],
                    [float(x) for x in new_acc["f"]],
                    [int(x) for x in new_acc["rf_s"]],
                    [int(x) for x in new_acc["rf_e"]],
                    [int(x) for x in new_acc["rb_s"]],
                    [int(x) for x in new_acc["rb_e"]],
                )
                first_ts = int(new_acc["i"][fa.I_FIRST_TS])
                last_ts = (
                    int(tail["ts_us"][-1]) if tail["ts_us"].size
                    else int(new_acc["i"][fa.I_LAST_TS])
                )
            else:
                acc_cols = ([], [], [], [], [], [])
                first_ts = int(tail["ts_us"][0])
                last_ts = int(tail["ts_us"][-1])
            state.update(acc_cols + tuple(
                [[int(x) for x in tail[c]] for c in _PKT_STATE_COLS]
                + [[bool(x) for x in tail["dir_a"]]]
            ))
            expiry_us = min(
                cfg.idle_expiry_us(last_ts), cfg.active_expiry_us(first_ts)
            )
            # clamp strictly past the watermark (backlog replay can put an
            # idle expiry behind the stream head; Spark rejects <= watermark)
            state.setTimeoutTimestamp(
                max(expiry_us // 1000, state.getCurrentWatermarkMs() + 1)
            )

        if rows:
            yield pd.DataFrame(rows).reindex(columns=FLOW_SUPERSET_COLUMNS)

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
        func_acc if use_acc else func,
        outputStructType=FLOW_SUPERSET_SCHEMA,
        stateStructType=PACKET_ACC_STATE_SCHEMA if use_acc else PACKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
