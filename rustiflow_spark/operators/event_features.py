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
    """
    from rustiflow_spark.kernel.segmented import featurize_block

    cfg = cfg or EngineConfig()
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
) -> DataFrame:
    """Annotate events with (session_index, session_cause); every input
    column — including array payloads like ``tokens`` — passes through
    unchanged (exact-equality invariant, BASELINE.json input_hint)."""
    from rustiflow_spark.kernel.segmented import (
        _CAUSE_STRINGS,
        _per_key_ordinal,
        close_sessions,
        segment_block,
    )

    cfg = cfg or EngineConfig()
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
