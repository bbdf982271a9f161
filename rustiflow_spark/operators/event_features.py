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
            return out.select(
                *[F.col(f.name).cast(f.dataType) for f in schema.fields]
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
    """
    from pyspark.sql import Window

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

    order = [F.asc(ts_col)] + ([F.asc(order_col)] if order_col else [])
    wk = Window.partitionBy(*key_cols).orderBy(*order)
    gap = F.col(ts_col) - F.lag(ts_col).over(wk)
    prev_term = (
        F.lag(terminator_col).over(wk) if terminator_col else F.lit(None)
    )
    new_sess = (
        F.when(gap.isNull() | (gap >= idle_cut), 1)
        .when(prev_term > 0, 1)
        .otherwise(0)
        if terminator_col
        else F.when(gap.isNull() | (gap >= idle_cut), 1).otherwise(0)
    )
    fwd = (F.col(direction_col) == 0) if direction_col else F.lit(True)
    rows = (
        df.withColumn("__gap", gap)
        .withColumn("__new", new_sess)
        .withColumn("__fwd", fwd)
        .withColumn(
            "__sid",
            F.sum("__new").over(
                wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    rows = rows.withColumn(
        "__ig", F.when(F.col("__new") == 1, F.lit(None)).otherwise(F.col("__gap"))
    )
    # Everything below rides the SAME (key, ts, seq) sort order as wk, so
    # Catalyst plans exactly one Exchange + one Sort for all window exprs.
    ws = Window.partitionBy(*key_cols, "__sid").orderBy(*order)
    ws_all = ws.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ws_run = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ws_prev = ws.rowsBetween(Window.unboundedPreceding, -1)

    span_start = F.col("__ig").isNull() | (F.col("__ig") > ACTIVE_IDLE_TIMEOUT_US)
    prev_f = F.last(F.when(F.col("__fwd"), F.col(ts_col)), ignorenulls=True).over(ws_prev)
    prev_b = F.last(F.when(~F.col("__fwd"), F.col(ts_col)), ignorenulls=True).over(ws_prev)
    rows = (
        rows.withColumn("__sstart", span_start)
        .withColumn(
            "__span_ts",
            F.last(F.when(span_start, F.col(ts_col)), ignorenulls=True).over(ws_run),
        )
        .withColumn(
            "__term_last",
            F.last(terminator_col).over(ws_all) if terminator_col else F.lit(0),
        )
        .withColumn(
            "__dgap",
            F.when(F.col("__fwd"), F.col(ts_col) - prev_f).otherwise(
                F.col(ts_col) - prev_b
            ),
        )
        .withColumn("__send", F.coalesce(F.lead("__sstart").over(ws), F.lit(True)))
        .withColumn("__strail", F.lead("__sstart").over(ws).isNull())
    )

    # active spans, evaluated on span-end rows (no extra grouping level or
    # join): span duration = ts - running span-start ts; the trailing span
    # counts only when the session is closed (every non-terminator session
    # here, since scan_mode is 'none')
    span_dur = (F.col(ts_col) - F.col("__span_ts")) / 1000.0
    dk = F.when(
        F.col("__send")
        & (span_dur > 0)
        & (~F.col("__strail") | (F.col("__term_last") == 0)),
        span_dur,
    )

    val = F.col(value_col).cast("double")
    vf = F.when(F.col("__fwd"), val)
    vb = F.when(~F.col("__fwd"), val)
    ig_ms = F.col("__ig") / 1000.0
    dg_f = F.when(F.col("__fwd"), F.col("__dgap") / 1000.0)
    dg_b = F.when(~F.col("__fwd"), F.col("__dgap") / 1000.0)
    big = F.when(F.col("__ig") > ACTIVE_IDLE_TIMEOUT_US, F.col("__ig") / 1000.0)

    def st(x, pre: str) -> list:
        return [
            F.coalesce(F.sum(x), F.lit(0.0)).alias(f"{pre}_total"),
            F.coalesce(F.avg(x), F.lit(0.0)).alias(f"{pre}_mean"),
            F.coalesce(F.stddev_pop(x), F.lit(0.0)).alias(f"{pre}_std"),
            F.coalesce(F.max(x), F.lit(0.0)).alias(f"{pre}_max"),
            F.coalesce(F.min(x), F.lit(0.0)).alias(f"{pre}_min"),
        ]

    ts_f = F.when(F.col("__fwd"), F.col(ts_col))
    ts_b = F.when(~F.col("__fwd"), F.col(ts_col))
    agg = rows.groupBy(*key_cols, "__sid").agg(
        F.min(ts_col).alias("first_ts_us"),
        F.max(ts_col).alias("last_ts_us"),
        F.count("*").alias("event_count"),
        F.count(vf).alias("fwd_event_count"),
        F.count(vb).alias("bwd_event_count"),
        F.max("__term_last").alias("__term"),
        *st(dk, "active"),
        *st(val, "n_tok"),
        *st(vf, "fwd_n_tok"),
        *st(vb, "bwd_n_tok"),
        *st(ig_ms, "iat"),
        *st(dg_f, "fwd_iat"),
        *st(dg_b, "bwd_iat"),
        (1 + F.count(F.when(F.col("__ig") > SUBFLOW_TIMEOUT_US, 1))).alias(
            "subflow_count"
        ),
        F.count(big).alias("__b_n"),
        F.coalesce(F.sum(big), F.lit(0.0)).alias("__b_s"),
        F.coalesce(F.avg(big), F.lit(0.0)).alias("__b_mean"),
        (F.coalesce(F.var_pop(big), F.lit(0.0)) * F.count(big)).alias("__b_m2"),
        F.max(big).alias("__b_max"),
        F.min(big).alias("__b_min"),
        (F.max(ts_f) - F.min(ts_f)).alias("__f_dur"),
        (F.max(ts_b) - F.min(ts_b)).alias("__b_dur"),
    )

    wkey = Window.partitionBy(*key_cols).orderBy("__sid")
    agg = agg.withColumn("__next_first", F.lead("first_ts_us").over(wkey))

    dur_us = F.col("last_ts_us") - F.col("first_ts_us")
    is_term = F.col("__term") > 0
    has_next = F.col("__next_first").isNotNull()
    cause = (
        F.when(
            dur_us >= active_cut,
            F.raise_error(
                "sessionize_events_catalyst: a session reached the active "
                "timeout; active-timeout recursion needs the kernel path "
                "(sessionize_events)"
            ),
        )
        .when(is_term, F.lit(CAUSE_TCP_TERM))
        .when(has_next, F.lit(CAUSE_IDLE))
        .otherwise(F.lit(CAUSE_SHUTDOWN))
    )
    # trailing idle gap (closed idle-cause sessions): merge ONE value into
    # the big-gap moments with the exact Chan single-element update
    tr = F.when(is_term | ~has_next, F.lit(None)).otherwise(
        (F.col("__next_first") - F.col("last_ts_us")) / 1000.0
    )
    n1 = F.col("__b_n").cast("double")
    n = n1 + 1
    i_total = F.col("__b_s") + tr
    i_mean = i_total / n
    i_m2 = F.col("__b_m2") + (tr - F.col("__b_mean")) * (tr - F.col("__b_mean")) * n1 / n
    idle_total = F.when(tr.isNotNull(), i_total).otherwise(F.col("__b_s"))
    idle_mean = F.when(tr.isNotNull(), i_mean).otherwise(F.col("__b_mean"))
    idle_std = F.when(
        tr.isNotNull(), F.sqrt(F.greatest(i_m2 / n, F.lit(0.0)))
    ).otherwise(
        F.sqrt(
            F.greatest(
                F.when(n1 > 0, F.col("__b_m2") / n1).otherwise(F.lit(0.0)),
                F.lit(0.0),
            )
        )
    )
    idle_max = F.when(
        tr.isNotNull(), F.greatest(F.coalesce(F.col("__b_max"), tr), tr)
    ).otherwise(F.coalesce(F.col("__b_max"), F.lit(0.0)))
    idle_min = F.when(
        tr.isNotNull(), F.least(F.coalesce(F.col("__b_min"), tr), tr)
    ).otherwise(F.coalesce(F.col("__b_min"), F.lit(0.0)))

    dur_s = dur_us.cast("double") / 1_000_000.0
    nonzero = dur_us > 0

    def rate(x):
        return F.when(nonzero, x / dur_s).otherwise(F.lit(0.0))

    nf = F.col("fwd_event_count").cast("double")
    out_cols = [
        *[F.col(c) for c in key_cols],
        (F.col("__sid") - 1).cast("int").alias("session_index"),
        F.col("first_ts_us"),
        F.col("last_ts_us"),
        dur_us.alias("duration_us"),
        cause.alias("cause"),
        F.col("event_count").cast("int").alias("event_count"),
        F.col("fwd_event_count").cast("int").alias("fwd_event_count"),
        F.col("bwd_event_count").cast("int").alias("bwd_event_count"),
        *[F.col(f"{b}_{s}")
          for b in ("n_tok", "fwd_n_tok", "bwd_n_tok", "iat", "fwd_iat", "bwd_iat")
          for s in ("total", "mean", "std", "max", "min")],
        F.col("active_total"), F.col("active_mean"), F.col("active_std"),
        F.col("active_max"), F.col("active_min"),
        idle_total.alias("idle_total"),
        idle_mean.alias("idle_mean"),
        idle_std.alias("idle_std"),
        idle_max.alias("idle_max"),
        idle_min.alias("idle_min"),
        F.col("subflow_count").cast("int").alias("subflow_count"),
        rate(F.col("n_tok_total")).alias("tok_per_s"),
        rate(F.col("event_count").cast("double")).alias("events_per_s"),
        rate(F.col("fwd_n_tok_total")).alias("fwd_tok_per_s"),
        rate(F.col("bwd_n_tok_total")).alias("bwd_tok_per_s"),
        F.when(nf > 0, F.col("bwd_event_count") / nf)
        .otherwise(F.lit(0.0))
        .alias("down_up_ratio"),
        F.coalesce(F.col("__f_dur") / 1000.0, F.lit(0.0)).alias("fwd_duration_ms"),
        F.coalesce(F.col("__b_dur") / 1000.0, F.lit(0.0)).alias("bwd_duration_ms"),
    ]
    return agg.select(*out_cols)


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
