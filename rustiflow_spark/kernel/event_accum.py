"""Incremental per-session feature accumulator for the event path.

This is the streaming-state analog of the reference's core design rule:
flow-table state never holds raw packets, only O(1) online accumulators
(flow_table.rs:24; every A1-A14 feature module in flows/features/* is
single-pass). The batch kernel (kernel/event_kernel.py:featurize_key_events)
computes each session's statistics from the full raw event slice; this
module computes the *same* statistics from a fixed-size accumulator that
is folded one sorted chunk at a time:

  * value / IAT / active / idle statistic blocks are (n, sum, M2, max, min)
    partials merged with the exact Chan/Welford parallel formula — the same
    math the reference uses to pool directional variances
    (packet_stats.rs:63-91) and that operators/skew.py uses for salted
    aggregation; equal to the two-pass batch stats up to float
    associativity (and bit-equal when a session folds in one chunk).
  * the active/idle segmentation (active_idle_stats.rs semantics) is kept
    as a tiny state machine: the open active-span's start plus closed-span
    partials; idle gaps fold as they are observed.
  * directional IAT needs only the last fwd/bwd timestamps, not the
    directional event lists.

The streaming sessionizer stores ONE accumulator per open session plus only
the raw events still inside the watermark horizon (late data may yet
interleave among those), so per-key state is O(1) + O(watermark_delay x
event_rate) — independent of session length.
"""

from __future__ import annotations

import numpy as np

from rustiflow_spark.config import (
    ACTIVE_IDLE_TIMEOUT_US,
    CAUSE_IDLE,
    SUBFLOW_TIMEOUT_US,
)

# integer slots
I_FIRST_TS = 0
I_LAST_TS = 1
I_COUNT = 2
I_FWD_COUNT = 3
I_BWD_COUNT = 4
I_FIRST_FWD_TS = 5
I_LAST_FWD_TS = 6
I_FIRST_BWD_TS = 7
I_LAST_BWD_TS = 8
I_SPAN_START = 9
I_SUBFLOW_GAPS = 10
ACC_I_LEN = 11

# float statistic blocks: each 5 slots (n, sum, M2, max, min)
_BLOCKS = ("v_all", "v_fwd", "v_bwd", "iat_all", "iat_fwd", "iat_bwd",
           "active", "idle")
_BLOCK_OFF = {name: i * 5 for i, name in enumerate(_BLOCKS)}
ACC_F_LEN = len(_BLOCKS) * 5


def acc_new() -> tuple[np.ndarray, np.ndarray]:
    ai = np.full(ACC_I_LEN, -1, dtype=np.int64)
    ai[I_COUNT] = ai[I_FWD_COUNT] = ai[I_BWD_COUNT] = 0
    ai[I_SUBFLOW_GAPS] = 0
    return ai, np.zeros(ACC_F_LEN, dtype=np.float64)


def _chunk_stats(x: np.ndarray) -> tuple[float, float, float, float, float]:
    """(n, sum, M2, max, min) of a chunk — two-pass like stats6 so a
    single-chunk session finalizes to the identical values."""
    n = x.size
    if n == 0:
        return 0.0, 0.0, 0.0, 0.0, 0.0
    s = float(x.sum())
    mean = s / n
    m2 = float(((x - mean) ** 2).sum())
    return float(n), s, m2, float(x.max()), float(x.min())


def _merge_block(af: np.ndarray, name: str, st) -> None:
    n2, s2, m2_2, mx2, mn2 = st
    if n2 == 0:
        return
    off = _BLOCK_OFF[name]
    n1 = af[off]
    if n1 == 0:
        af[off:off + 5] = (n2, s2, m2_2, mx2, mn2)
        return
    s1, m2_1 = af[off + 1], af[off + 2]
    delta = s2 / n2 - s1 / n1
    af[off + 2] = m2_1 + m2_2 + delta * delta * n1 * n2 / (n1 + n2)
    af[off] = n1 + n2
    af[off + 1] = s1 + s2
    af[off + 3] = max(af[off + 3], mx2)
    af[off + 4] = min(af[off + 4], mn2)


def _fold_value(af: np.ndarray, name: str, x: np.ndarray) -> None:
    _merge_block(af, name, _chunk_stats(x))


def acc_fold(
    acc: tuple[np.ndarray, np.ndarray] | None,
    ts: np.ndarray,
    value: np.ndarray,
    direction: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Fold a sorted chunk of one session's events into the accumulator.

    Chunks must arrive in timestamp order (every ts >= the previously
    folded last_ts) — the watermark guarantees this for the frozen prefix.
    """
    if acc is None:
        ai, af = acc_new()
    else:
        ai, af = acc
    if ts.size == 0:
        return ai, af
    value = value.astype(np.float64)
    fwd = direction == 0
    bwd = ~fwd

    fresh = ai[I_COUNT] == 0
    if fresh:
        ai[I_FIRST_TS] = int(ts[0])
        ai[I_SPAN_START] = int(ts[0])
        t_ext = ts
    else:
        t_ext = np.concatenate(([ai[I_LAST_TS]], ts))

    # value stats
    _fold_value(af, "v_all", value)
    _fold_value(af, "v_fwd", value[fwd])
    _fold_value(af, "v_bwd", value[bwd])

    # IAT over the extended timeline (boundary gap included)
    gaps = np.diff(t_ext)
    _fold_value(af, "iat_all", gaps / 1000.0)
    tf = ts[fwd]
    if ai[I_LAST_FWD_TS] >= 0 and tf.size:
        tf_ext = np.concatenate(([ai[I_LAST_FWD_TS]], tf))
    else:
        tf_ext = tf
    _fold_value(af, "iat_fwd", np.diff(tf_ext) / 1000.0)
    tb = ts[bwd]
    if ai[I_LAST_BWD_TS] >= 0 and tb.size:
        tb_ext = np.concatenate(([ai[I_LAST_BWD_TS]], tb))
    else:
        tb_ext = tb
    _fold_value(af, "iat_bwd", np.diff(tb_ext) / 1000.0)

    # active/idle state machine (active_idle_stats.rs): an idle gap closes
    # the open active span and starts a new one at the gap's far edge
    idle_pos = np.flatnonzero(gaps > ACTIVE_IDLE_TIMEOUT_US)
    if idle_pos.size:
        _fold_value(af, "idle", gaps[idle_pos] / 1000.0)
        close_ends = t_ext[idle_pos]
        close_starts = np.concatenate(
            ([ai[I_SPAN_START]], t_ext[idle_pos[:-1] + 1])
        )
        spans = (close_ends - close_starts).astype(np.float64)
        _fold_value(af, "active", spans[spans > 0] / 1000.0)
        ai[I_SPAN_START] = int(t_ext[idle_pos[-1] + 1])

    ai[I_SUBFLOW_GAPS] += int(np.count_nonzero(gaps > SUBFLOW_TIMEOUT_US))
    ai[I_COUNT] += int(ts.size)
    ai[I_FWD_COUNT] += int(fwd.sum())
    ai[I_BWD_COUNT] += int(bwd.sum())
    ai[I_LAST_TS] = int(ts[-1])
    if tf.size:
        if ai[I_FIRST_FWD_TS] < 0:
            ai[I_FIRST_FWD_TS] = int(tf[0])
        ai[I_LAST_FWD_TS] = int(tf[-1])
    if tb.size:
        if ai[I_FIRST_BWD_TS] < 0:
            ai[I_FIRST_BWD_TS] = int(tb[0])
        ai[I_LAST_BWD_TS] = int(tb[-1])
    return ai, af


def _emit_block(row: dict, out_name: str, af: np.ndarray, name: str) -> None:
    off = _BLOCK_OFF[name]
    n = af[off]
    if n == 0:
        row[f"{out_name}_total"] = 0.0
        row[f"{out_name}_mean"] = 0.0
        row[f"{out_name}_std"] = 0.0
        row[f"{out_name}_max"] = 0.0
        row[f"{out_name}_min"] = 0.0
        return
    s = af[off + 1]
    row[f"{out_name}_total"] = s
    row[f"{out_name}_mean"] = s / n
    row[f"{out_name}_std"] = float(np.sqrt(max(af[off + 2], 0.0) / n))
    row[f"{out_name}_max"] = af[off + 3]
    row[f"{out_name}_min"] = af[off + 4]


def acc_finalize(
    acc: tuple[np.ndarray, np.ndarray],
    cause: str,
    close_ts: int,
    closed: bool,
) -> dict:
    """Feature row from the accumulator — identical field set and semantics
    to featurize_key_events (event_kernel.py:115), incl. the final active
    span excluded on terminator-closed sessions and the trailing idle gap
    appended on idle-timeout close. Does NOT mutate the accumulator."""
    ai, af = acc
    af = af.copy()
    first, last = int(ai[I_FIRST_TS]), int(ai[I_LAST_TS])
    dur_us = last - first

    final_span = last - int(ai[I_SPAN_START])
    if closed and final_span > 0:
        _fold_value(af, "active", np.array([final_span / 1000.0]))
    if closed and cause == CAUSE_IDLE:
        _fold_value(af, "idle", np.array([(close_ts - last) / 1000.0]))

    nf, nb = int(ai[I_FWD_COUNT]), int(ai[I_BWD_COUNT])
    row: dict = {
        "first_ts_us": first,
        "last_ts_us": last,
        "duration_us": dur_us,
        "cause": cause,
        "event_count": int(ai[I_COUNT]),
        "fwd_event_count": nf,
        "bwd_event_count": nb,
    }
    _emit_block(row, "n_tok", af, "v_all")
    _emit_block(row, "fwd_n_tok", af, "v_fwd")
    _emit_block(row, "bwd_n_tok", af, "v_bwd")
    _emit_block(row, "iat", af, "iat_all")
    _emit_block(row, "fwd_iat", af, "iat_fwd")
    _emit_block(row, "bwd_iat", af, "iat_bwd")
    _emit_block(row, "active", af, "active")
    _emit_block(row, "idle", af, "idle")
    row["subflow_count"] = 1 + int(ai[I_SUBFLOW_GAPS])

    dur_s = dur_us / 1_000_000.0
    v_sum = af[_BLOCK_OFF["v_all"] + 1]
    vf_sum = af[_BLOCK_OFF["v_fwd"] + 1]
    vb_sum = af[_BLOCK_OFF["v_bwd"] + 1]
    row["tok_per_s"] = float(v_sum / dur_s) if dur_us else 0.0
    row["events_per_s"] = float(ai[I_COUNT] / dur_s) if dur_us else 0.0
    row["fwd_tok_per_s"] = float(vf_sum / dur_s) if dur_us else 0.0
    row["bwd_tok_per_s"] = float(vb_sum / dur_s) if dur_us else 0.0
    row["down_up_ratio"] = nb / nf if nf else 0.0
    row["fwd_duration_ms"] = (
        float(ai[I_LAST_FWD_TS] - ai[I_FIRST_FWD_TS]) / 1000.0 if nf else 0.0
    )
    row["bwd_duration_ms"] = (
        float(ai[I_LAST_BWD_TS] - ai[I_FIRST_BWD_TS]) / 1000.0 if nb else 0.0
    )
    return row
