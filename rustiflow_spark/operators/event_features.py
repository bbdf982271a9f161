"""Generic keyed-event sessionization + feature extraction operator.

The production north-rule pipeline: an Iceberg/parquet table of keyed,
timestamped events (e.g. pre-tokenized training sequences keyed by
(source, doc_id), or a user-event stream keyed by user_id) is sessionized
with the reference's timeout semantics and reduced to one feature vector
per session.

Plan shape (one shuffle):

    scan -> groupBy(key).applyInPandas(event kernel) -> feature rows

``assign_sessions`` instead returns the input rows annotated with
(session_index, session_cause) — the payload columns (e.g. ``tokens``)
pass through byte-identical, which the tests assert per the input_hint
token-equality invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from rustiflow_spark.config import EngineConfig
from rustiflow_spark.kernel.event_kernel import EVENT_FEATURE_COLUMNS
from rustiflow_spark.timeline import compute_timeline


_BLOCK_OF_COLUMN = {}

# active timeouts at/above this (seconds) are treated as "disabled" by
# strategy='auto' — ~116 days of continuous single-session activity
_ACTIVE_DISABLED_S = 10_000_000


def _column_block(name: str) -> str | None:
    """Feature block owning a column (None = always-on core column)."""
    if name.startswith(("n_tok", "fwd_n_tok", "bwd_n_tok")):
        return "value"
    if "iat" in name:
        return "iat"
    if name.startswith(("active_", "idle_")):
        return "active_idle"
    if name == "subflow_count":
        return "subflow"
    if name.endswith("_per_s") or name == "down_up_ratio":
        return "rates"
    if name in ("fwd_event_count", "bwd_event_count", "fwd_duration_ms", "bwd_duration_ms"):
        return "direction"
    return None


def _feature_schema(
    df: DataFrame, key_cols: list[str], blocks: frozenset | None = None
) -> T.StructType:
    from rustiflow_spark.kernel.segmented import FEATURE_BLOCKS

    want = frozenset(FEATURE_BLOCKS) if blocks is None else frozenset(blocks)
    fields = [f for f in df.schema.fields if f.name in key_cols]
    for name in EVENT_FEATURE_COLUMNS:
        blk = _column_block(name)
        if blk is not None and blk not in want:
            continue
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


def sessionize_events(
    df: DataFrame,
    key_cols: list[str],
    cfg: EngineConfig | None = None,
    ts_col: str = "ts_us",
    value_col: str = "n_tok",
    direction_col: str | None = "direction",
    terminator_col: str | None = "terminator",
    order_col: str | None = "event_seq",
    num_partitions: int | None = None,
    features: list[str] | None = None,
    next_ts_col: str | None = None,
    flush_ts: int | None = None,
    strategy: str = "kernel",
) -> DataFrame:
    """One row per session with the event feature vector (EVENT_FEATURE_COLUMNS).

    Scale path: hash-repartition by key, sort within partitions by
    (key, ts, seq), then a mapInPandas pass over the sorted stream feeds the
    segment-vectorized block kernel (kernel/segmented.py). Arrow batches that
    split a key are stitched by buffering the trailing (possibly incomplete)
    key of each batch — so the plan is exactly one shuffle and the Python
    stage does no per-session work.

    features: optional subset of kernel.segmented.FEATURE_BLOCKS — prunes
    both computation and the Arrow-returned columns (the session output can
    exceed the input volume for sparse keys; see the module docstring of
    kernel/segmented.py).

    strategy: 'kernel' (default) always runs the Arrow block kernel;
    'catalyst' forces the zero-Python windows+aggregations plan
    (sessionize_events_catalyst, same output, raises if the configuration
    needs the kernel); 'auto' picks the Catalyst plan when the
    configuration permits it — scan_mode 'none', no episode handoff
    (next_ts_col), and the active timeout effectively disabled
    (>= _ACTIVE_DISABLED_S). Either way the result is identical; the
    Catalyst path additionally carries a runtime guard that fails loudly
    (rather than diverging) if a session ever reaches the active cut.
    """
    from rustiflow_spark.kernel.segmented import featurize_block

    cfg = cfg or EngineConfig()
    if strategy not in ("kernel", "catalyst", "auto"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy != "kernel":
        eligible = cfg.scan_mode == "none" and next_ts_col is None
        if strategy == "catalyst" and not eligible:
            raise ValueError(
                "strategy='catalyst' requires scan_mode='none' and no "
                "next_ts_col (episode handoff); use the kernel path"
            )
        if eligible and (
            strategy == "catalyst" or cfg.active_timeout >= _ACTIVE_DISABLED_S
        ):
            out = sessionize_events_catalyst(
                df,
                key_cols,
                cfg,
                ts_col=ts_col,
                value_col=value_col,
                direction_col=direction_col,
                terminator_col=terminator_col,
                order_col=order_col,
            )
            schema = _feature_schema(
                df, key_cols, None if features is None else frozenset(features)
            )
            return out.selectExpr(
                *[
                    f"cast(`{f.name}` as {f.dataType.simpleString()}) as `{f.name}`"
                    for f in schema.fields
                ]
            )
    blocks = None if features is None else frozenset(features)
    scan_times, flush_ts = compute_timeline(df, ts_col, cfg, flush_ts=flush_ts)
    schema = _feature_schema(df, key_cols, blocks)
    out_cols = [f.name for f in schema.fields]
    sort_cols = key_cols + [ts_col] + ([order_col] if order_col else [])
    needed = list(
        dict.fromkeys(
            key_cols
            + [ts_col, value_col]
            + ([direction_col] if direction_col else [])
            + ([terminator_col] if terminator_col else [])
            + ([order_col] if order_col else [])
            + ([next_ts_col] if next_ts_col else [])
        )
    )

    def process_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        value = pdf[value_col].to_numpy(dtype=np.float64)
        direction = (
            pdf[direction_col].to_numpy(dtype=np.int64)
            if direction_col
            else np.zeros(ts.size, dtype=np.int64)
        )
        terminator = (
            pdf[terminator_col].to_numpy(dtype=np.int64)
            if terminator_col
            else np.zeros(ts.size, dtype=np.int64)
        )
        # dense key ids from the (already grouped) key columns
        key_frame = pdf[key_cols]
        key_ids = pd.factorize(pd.MultiIndex.from_frame(key_frame))[0] if len(key_cols) > 1 else pd.factorize(key_frame[key_cols[0]])[0]
        next_after = (
            pdf[next_ts_col].to_numpy(dtype=np.int64) if next_ts_col else None
        )
        res = featurize_block(
            key_ids.astype(np.int64), ts, value, direction, terminator, cfg,
            scan_times, flush_ts, blocks=blocks, next_after=next_after,
        )
        rows = res.pop("session_row")
        out = pd.DataFrame(res)
        for col in key_cols:
            out[col] = pdf[col].to_numpy()[rows]
        return out.reindex(columns=out_cols)

    def run_partition(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the trailing key — it may continue in the next batch
            last_key = tuple(pdf[c].iloc[-1] for c in key_cols)
            mask = np.ones(len(pdf), dtype=bool)
            for c, v in zip(key_cols, last_key):
                mask &= (pdf[c] == v).to_numpy()
            boundary = int(np.flatnonzero(mask)[0])
            carry = pdf.iloc[boundary:]
            head = pdf.iloc[:boundary]
            if len(head):
                yield process_block(head)
        if carry is not None and len(carry):
            yield process_block(carry)

    keyed = df.select(*needed)
    parts = num_partitions
    if parts:
        keyed = keyed.repartition(parts, *key_cols)
    else:
        keyed = keyed.repartition(*key_cols)
    keyed = keyed.sortWithinPartitions(*sort_cols)
    return keyed.mapInPandas(run_partition, schema=schema)


def assign_sessions(
    df: DataFrame,
    key_cols: list[str],
    cfg: EngineConfig | None = None,
    ts_col: str = "ts_us",
    terminator_col: str | None = "terminator",
    order_col: str | None = "event_seq",
    flush_ts: int | None = None,
    strategy: str = "kernel",
) -> DataFrame:
    """Annotate events with (session_index, session_cause); every input
    column — including array payloads like ``tokens`` — passes through
    unchanged (exact-equality invariant, BASELINE.json input_hint).

    strategy: as in sessionize_events — 'auto' takes the zero-Python
    window plan (assign_sessions_catalyst) when scan is off and the active
    timeout is effectively disabled, which keeps the payload bytes out of
    the Arrow round trip entirely.
    """
    from rustiflow_spark.kernel.segmented import (
        _CAUSE_STRINGS,
        _per_key_ordinal,
        close_sessions,
        segment_block,
    )

    cfg = cfg or EngineConfig()
    if strategy not in ("kernel", "catalyst", "auto"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy != "kernel":
        eligible = cfg.scan_mode == "none"
        if strategy == "catalyst" and not eligible:
            raise ValueError(
                "strategy='catalyst' requires scan_mode='none'; use the "
                "kernel path"
            )
        if eligible and (
            strategy == "catalyst" or cfg.active_timeout >= _ACTIVE_DISABLED_S
        ):
            return assign_sessions_catalyst(
                df,
                key_cols,
                cfg,
                ts_col=ts_col,
                terminator_col=terminator_col,
                order_col=order_col,
            )
    scan_times, flush_ts = compute_timeline(df, ts_col, cfg, flush_ts=flush_ts)
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("session_index", T.IntegerType()),
            T.StructField("session_cause", T.StringType()),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]
    sort_cols = key_cols + [ts_col] + ([order_col] if order_col else [])

    def process_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        terminator = (
            pdf[terminator_col].to_numpy(dtype=np.int64)
            if terminator_col
            else np.zeros(ts.size, dtype=np.int64)
        )
        key_frame = pdf[key_cols]
        key_ids = (
            pd.factorize(pd.MultiIndex.from_frame(key_frame))[0]
            if len(key_cols) > 1
            else pd.factorize(key_frame[key_cols[0]])[0]
        ).astype(np.int64)
        starts = segment_block(key_ids, ts, terminator, cfg)
        ends = np.append(starts[1:], ts.size)
        cause, _, _ = close_sessions(
            starts, ends, key_ids, ts, terminator, cfg, scan_times, flush_ts
        )
        ordinal = _per_key_ordinal(key_ids[starts])
        lengths = ends - starts
        pdf = pdf[in_cols].copy()
        pdf["session_index"] = np.repeat(ordinal, lengths).astype(np.int32)
        pdf["session_cause"] = np.repeat(_CAUSE_STRINGS[cause], lengths)
        return pdf

    def run_partition(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_key = tuple(pdf[c].iloc[-1] for c in key_cols)
            mask = np.ones(len(pdf), dtype=bool)
            for c, v in zip(key_cols, last_key):
                mask &= (pdf[c] == v).to_numpy()
            boundary = int(np.flatnonzero(mask)[0])
            carry = pdf.iloc[boundary:].reset_index(drop=True)
            head = pdf.iloc[:boundary]
            if len(head):
                yield process_block(head)
        if carry is not None and len(carry):
            yield process_block(carry)

    keyed = df.repartition(*key_cols).sortWithinPartitions(*sort_cols)
    return keyed.mapInPandas(run_partition, schema=schema)


def sessionize_events_catalyst(
    df: DataFrame,
    key_cols: list[str],
    cfg: EngineConfig | None = None,
    ts_col: str = "ts_us",
    value_col: str = "n_tok",
    direction_col: str | None = "direction",
    terminator_col: str | None = "terminator",
    order_col: str | None = "event_seq",
) -> DataFrame:
    """Pure-Catalyst sessionization fast path — no Python workers at all.

    When the configuration allows it, the whole operator is windows +
    aggregations that stay inside whole-stage codegen: the Arrow round trip
    (the single largest cost of the kernel path at high core counts, see
    BENCH.md round 3) disappears. Output schema and values match
    ``sessionize_events`` (asserted by tests/test_catalyst_sessionize.py).

    Restrictions (use the kernel path otherwise):
      * ``scan_mode`` must be 'none' (the periodic-scan close timestamps
        are a sequential construct);
      * the active timeout must never trigger — sessions are cut at idle
        gaps and terminators only. Guarded at runtime: any session whose
        duration reaches the active cut raises rather than returning rows
        the kernel would have split (active-timeout recursion is inherently
        sequential and not window-expressible).

    Sizing: the window sorts must fit execution memory — over-provision
    spark.sql.shuffle.partitions (AQE coalesces small partitions but never
    splits large ones) or this path goes spill-bound below the kernel
    (BENCH.md 64M table: 5.5M ev/s at 256 partitions, 1.7M at 64).

    Skew: a heavy-hitter key serializes inside one window task here, same
    as it would in any partitionBy(key) plan. For skewed keyspaces use the
    kernel path with the episode pre-split
    (operators/skew.py:with_episodes + next_ts_col), which this plan
    deliberately does not attempt — the cross-episode ordinal/cause
    handoff would reintroduce a join against the single-sort shape that
    makes this path fast.
    """
    from rustiflow_spark.config import (
        ACTIVE_IDLE_TIMEOUT_US,
        CAUSE_IDLE,
        CAUSE_SHUTDOWN,
        CAUSE_TCP_TERM,
        SUBFLOW_TIMEOUT_US,
    )

    cfg = cfg or EngineConfig()
    if cfg.scan_mode != "none":
        raise ValueError(
            "sessionize_events_catalyst requires scan_mode='none'; the "
            "periodic expiry scan needs the kernel path"
        )
    idle_cut = (cfg.idle_timeout + 1) * 1_000_000
    active_cut = (cfg.active_timeout + 1) * 1_000_000

    # The whole plan is built from SQL strings (one py4j round trip per
    # expression) rather than Column trees: Column-by-Column construction
    # of this many expressions costs ~1 s of pure driver-side py4j latency
    # per query invocation. Every window rides the SAME (key, ts, seq)
    # sort order, so Catalyst plans exactly one Exchange + one Sort for
    # all of them.
    AIT = ACTIVE_IDLE_TIMEOUT_US
    SFT = SUBFLOW_TIMEOUT_US
    kq = ", ".join(f"`{c}`" for c in key_cols)
    keysel = [f"`{c}`" for c in key_cols]
    wk_in = f"PARTITION BY {kq} ORDER BY `{ts_col}`" + (
        f", `{order_col}`" if order_col else ""
    )
    fwd = f"(`{direction_col}` = 0)" if direction_col else "true"
    term = f"`{terminator_col}`" if terminator_col else "0"
    rows = df.selectExpr(
        *keysel,
        f"`{ts_col}` as __ts",
        *([f"`{order_col}` as __seq"] if order_col else []),
        f"cast(`{value_col}` as double) as __val",
        f"{fwd} as __fwd",
        f"{term} as __t",
        f"`{ts_col}` - lag(`{ts_col}`) OVER ({wk_in}) as __gap",
    )

    ob = "__ts" + (", __seq" if order_col else "")
    wk = f"PARTITION BY {kq} ORDER BY {ob}"
    new_sess = (
        f"case when __gap is null or __gap >= {idle_cut}L then 1 "
        + (f"when lag(__t) OVER ({wk}) > 0 then 1 " if terminator_col else "")
        + "else 0 end"
    )
    rows = rows.selectExpr("*", f"{new_sess} as __new")
    run = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    rows = rows.selectExpr(
        "*",
        f"sum(__new) OVER ({wk} {run}) as __sid",
        "case when __new = 1 then null else __gap end as __ig",
        # span start: first event of the session, or a big (>5s) gap;
        # __gap is null only on session-opening rows, where __new = 1
        f"(__new = 1 or __gap > {AIT}L) as __sstart",
    )
    ws = f"PARTITION BY {kq}, __sid ORDER BY {ob}"
    allf = "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    prev = "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    rows = rows.selectExpr(
        "*",
        f"last(case when __sstart then __ts end, true) OVER ({ws} {run}) as __span_ts",
        f"last(__t) OVER ({ws} {allf}) as __term_last",
        f"last(case when __fwd then __ts end, true) OVER ({ws} {prev}) as __pf",
        f"last(case when not __fwd then __ts end, true) OVER ({ws} {prev}) as __pb",
        f"lead(__sstart) OVER ({ws}) as __lead_sstart",
    ).selectExpr(
        "*",
        "case when __fwd then __ts - __pf else __ts - __pb end as __dgap",
        "coalesce(__lead_sstart, true) as __send",
        "__lead_sstart is null as __strail",
    )

    aggs: list[str] = []

    def st(x: str, pre: str) -> None:
        aggs.extend([
            f"coalesce(sum({x}), 0.0D) as {pre}_total",
            f"coalesce(avg({x}), 0.0D) as {pre}_mean",
            f"coalesce(stddev_pop({x}), 0.0D) as {pre}_std",
            f"coalesce(max({x}), 0.0D) as {pre}_max",
            f"coalesce(min({x}), 0.0D) as {pre}_min",
        ])

    vf = "(case when __fwd then __val end)"
    vb = "(case when not __fwd then __val end)"
    # active spans, evaluated on span-end rows (no extra grouping level or
    # join): span duration = __ts - running span-start ts; the trailing
    # span counts only when the session is closed (every non-terminator
    # session here, since scan_mode is 'none')
    dk = (
        "(case when __send and ((__ts - __span_ts) / 1000.0D) > 0.0D "
        "and ((not __strail) or __term_last = 0) "
        "then (__ts - __span_ts) / 1000.0D end)"
    )
    big = f"(case when __ig > {AIT} then __ig / 1000.0D end)"
    aggs.extend([
        "min(__ts) as first_ts_us",
        "max(__ts) as last_ts_us",
        "count(*) as event_count",
        f"count({vf}) as fwd_event_count",
        f"count({vb}) as bwd_event_count",
        "max(__term_last) as __term",
    ])
    st(dk, "active")
    st("__val", "n_tok")
    st(vf, "fwd_n_tok")
    st(vb, "bwd_n_tok")
    st("(__ig / 1000.0D)", "iat")
    st("(case when __fwd then __dgap / 1000.0D end)", "fwd_iat")
    st("(case when not __fwd then __dgap / 1000.0D end)", "bwd_iat")
    aggs.extend([
        f"1 + count(case when __ig > {SFT} then 1 end) as subflow_count",
        f"count({big}) as __b_n",
        f"coalesce(sum({big}), 0.0D) as __b_s",
        f"coalesce(avg({big}), 0.0D) as __b_mean",
        f"coalesce(var_pop({big}), 0.0D) * count({big}) as __b_m2",
        f"max({big}) as __b_max",
        f"min({big}) as __b_min",
        "max(case when __fwd then __ts end) - min(case when __fwd then __ts end) as __f_dur",
        "max(case when not __fwd then __ts end) - min(case when not __fwd then __ts end) as __b_dur",
    ])
    agg = rows.groupBy(*key_cols, "__sid").agg(*[F.expr(s) for s in aggs])

    # trailing idle gap (closed idle-cause sessions): merge ONE value into
    # the big-gap moments with the exact Chan single-element update
    agg = agg.selectExpr(
        "*",
        f"lead(first_ts_us) OVER (PARTITION BY {kq} ORDER BY __sid) as __next_first",
    ).selectExpr(
        "*",
        "case when __term > 0 or __next_first is null then null "
        "else (__next_first - last_ts_us) / 1000.0D end as __tr",
    )

    terr = (
        "raise_error('sessionize_events_catalyst: a session reached the "
        "active timeout; active-timeout recursion needs the kernel path "
        "(sessionize_events)')"
    )
    cause = (
        f"case when last_ts_us - first_ts_us >= {active_cut}L then {terr} "
        f"when __term > 0 then '{CAUSE_TCP_TERM}' "
        f"when __next_first is not null then '{CAUSE_IDLE}' "
        f"else '{CAUSE_SHUTDOWN}' end as cause"
    )
    i_m2 = "(__b_m2 + (__tr - __b_mean) * (__tr - __b_mean) * __b_n / (__b_n + 1))"
    dur_s = "((last_ts_us - first_ts_us) / 1000000.0D)"

    def rate(x: str, name: str) -> str:
        return (
            f"case when last_ts_us - first_ts_us > 0 then {x} / {dur_s} "
            f"else 0.0D end as {name}"
        )

    out_exprs = [
        *[f"`{c}`" for c in key_cols],
        "cast(__sid - 1 as int) as session_index",
        "first_ts_us",
        "last_ts_us",
        "last_ts_us - first_ts_us as duration_us",
        cause,
        "cast(event_count as int) as event_count",
        "cast(fwd_event_count as int) as fwd_event_count",
        "cast(bwd_event_count as int) as bwd_event_count",
        *[f"{b}_{s}"
          for b in ("n_tok", "fwd_n_tok", "bwd_n_tok", "iat", "fwd_iat", "bwd_iat")
          for s in ("total", "mean", "std", "max", "min")],
        "active_total", "active_mean", "active_std", "active_max", "active_min",
        "case when __tr is not null then __b_s + __tr else __b_s end as idle_total",
        "case when __tr is not null then (__b_s + __tr) / (__b_n + 1) "
        "else __b_mean end as idle_mean",
        f"case when __tr is not null then sqrt(greatest({i_m2} / (__b_n + 1), 0.0D)) "
        "else sqrt(greatest(case when __b_n > 0 then __b_m2 / __b_n else 0.0D end, 0.0D)) "
        "end as idle_std",
        "case when __tr is not null then greatest(coalesce(__b_max, __tr), __tr) "
        "else coalesce(__b_max, 0.0D) end as idle_max",
        "case when __tr is not null then least(coalesce(__b_min, __tr), __tr) "
        "else coalesce(__b_min, 0.0D) end as idle_min",
        "cast(subflow_count as int) as subflow_count",
        rate("n_tok_total", "tok_per_s"),
        rate("cast(event_count as double)", "events_per_s"),
        rate("fwd_n_tok_total", "fwd_tok_per_s"),
        rate("bwd_n_tok_total", "bwd_tok_per_s"),
        "case when fwd_event_count > 0 "
        "then bwd_event_count / cast(fwd_event_count as double) "
        "else 0.0D end as down_up_ratio",
        "coalesce(__f_dur / 1000.0D, 0.0D) as fwd_duration_ms",
        "coalesce(__b_dur / 1000.0D, 0.0D) as bwd_duration_ms",
    ]
    return agg.selectExpr(*out_exprs)


def assign_sessions_catalyst(
    df: DataFrame,
    key_cols: list[str],
    cfg: EngineConfig | None = None,
    ts_col: str = "ts_us",
    terminator_col: str | None = "terminator",
    order_col: str | None = "event_seq",
) -> DataFrame:
    """Pure-Catalyst row-level session annotation — payload stays JVM-side.

    The kernel path (assign_sessions) ships EVERY column — including array
    payloads like ``tokens`` — through Arrow to Python and back; this plan
    annotates (session_index, session_cause) with window expressions over
    one (key, ts, seq) sort, so the payload bytes never leave Tungsten
    rows. Output equals assign_sessions exactly (tests).

    Same restrictions as sessionize_events_catalyst: scan_mode 'none', and
    a runtime guard raises if any session reaches the active cut.
    """
    from pyspark.sql import Window

    from rustiflow_spark.config import (
        CAUSE_IDLE,
        CAUSE_SHUTDOWN,
        CAUSE_TCP_TERM,
    )

    cfg = cfg or EngineConfig()
    if cfg.scan_mode != "none":
        raise ValueError(
            "assign_sessions_catalyst requires scan_mode='none'; the "
            "periodic expiry scan needs the kernel path"
        )
    idle_cut = (cfg.idle_timeout + 1) * 1_000_000
    active_cut = (cfg.active_timeout + 1) * 1_000_000

    order = [F.asc(ts_col)] + ([F.asc(order_col)] if order_col else [])
    wk = Window.partitionBy(*key_cols).orderBy(*order)
    wk_all = wk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    gap = F.col(ts_col) - F.lag(ts_col).over(wk)
    prev_term = (
        F.lag(terminator_col).over(wk) if terminator_col else F.lit(None)
    )
    new_sess = (
        F.when(gap.isNull() | (gap >= idle_cut), 1)
        .when(prev_term > 0, 1)
        .otherwise(0)
    )
    sid = F.sum(new_sess).over(
        wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ann = df.withColumn("__sid", sid)
    ws_all = (
        Window.partitionBy(*key_cols, "__sid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    has_term = (
        F.max(terminator_col).over(ws_all) if terminator_col else F.lit(0)
    )
    max_sid = F.max("__sid").over(wk_all)
    dur = F.max(ts_col).over(ws_all) - F.min(ts_col).over(ws_all)
    cause = (
        F.when(
            dur >= active_cut,
            F.raise_error(
                "assign_sessions_catalyst: a session reached the active "
                "timeout; use assign_sessions (kernel path)"
            ),
        )
        .when(has_term > 0, F.lit(CAUSE_TCP_TERM))
        .when(F.col("__sid") < max_sid, F.lit(CAUSE_IDLE))
        .otherwise(F.lit(CAUSE_SHUTDOWN))
    )
    in_cols = [f.name for f in df.schema.fields]
    return ann.select(
        *in_cols,
        (F.col("__sid") - 1).cast("int").alias("session_index"),
        cause.alias("session_cause"),
    )
