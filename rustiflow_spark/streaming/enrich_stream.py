"""Streaming point-in-time enrichment: stream-static join against an
effective-dated (SCD2) dimension.

The batch engine gets point-in-time correctness from the backward as-of
join (operators/asof.py); a stream can't run that union+window plan (no
global ordered window over an unbounded source). The standard scale shape
is instead:

    change log --batch--> scd2_history (valid_from, valid_to versions)
    stream ----stream-static join----> ON key AND ts in [valid_from, valid_to)

The join is STATELESS (every stream row matches exactly one dimension
version because versions tile the key's timeline), so output is
micro-batch-invariant and needs no watermark. Spark plans it as a
broadcast hash join on the key with the range predicate as a residual
filter — the dimension is the small side by construction (one row per
version, not per event). The static side is re-resolved per micro-batch,
so a periodically rebuilt dimension picks up new versions without
restarting the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pit_enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    suffix: str = "_dim",
) -> DataFrame:
    """Enrich each stream row with its key's dimension version at ts.

    dim must be an SCD2 table (scd2_history output with a non-null
    end_of_time) whose versions tile each key's timeline: exactly one
    match per stream row, inner join, stateless.
    """
    payload = [c for c in dim.columns if c not in key_cols]
    d = dim.select(
        *[F.col(k).alias(f"__k_{k}") for k in key_cols],
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    cond = None
    for k in key_cols:
        c = F.col(k) == F.col(f"__k_{k}")
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (F.col(ts_col) >= F.col(f"{valid_from}{suffix}"))
        & (F.col(ts_col) < F.col(f"{valid_to}{suffix}"))
    )
    return stream.join(F.broadcast(d), cond, "inner").drop(
        *[f"__k_{k}" for k in key_cols]
    )


def ffill_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    order_col: str | None = None,
    filled_col: str | None = None,
) -> DataFrame:
    """Streaming forward-fill: each row's nulls take the most recent past
    non-null value of its key — the streaming twin of
    operators/windows.forward_fill, with O(1) state per key (ONLY the
    last non-null value; never raw rows — the engine's P4 state rule).

    Within a micro-batch rows are sorted by (ts, order) and filled
    vectorized (pandas ffill); across micro-batches the last value is
    carried in GroupState. Correct (identical to the batch window) when
    micro-batches arrive in per-key event-time order — true for replayed
    file sources and ts-ordered logs; an out-of-order source needs a
    watermark-sorted buffer upstream.
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    filled = filled_col or f"{value_col}_ffill"
    in_schema = stream.schema
    vtype = in_schema[value_col].dataType
    out_schema = T.StructType(
        list(in_schema.fields) + [T.StructField(filled, vtype, True)]
    )
    state_schema = T.StructType(
        [T.StructField("last", vtype, True), T.StructField("has", T.BooleanType())]
    )
    sort_cols = [ts_col] + ([order_col] if order_col else [])
    col_order = [f.name for f in out_schema.fields]

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        last, has = state.get if state.exists else (None, False)
        # a group larger than the Arrow batch size arrives as SEVERAL
        # pdfs within one micro-batch, in storage order — concatenate and
        # sort ONCE, or chunk-local fills leak across the true time order
        # (review finding, reproduced with arrow.maxRecordsPerBatch=3)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(sort_cols)
            s = pdf[value_col]
            f = s.ffill()
            if has:
                f = f.fillna(last)
            pdf[filled] = f
            nn = s.dropna()
            if len(nn):
                v = nn.iloc[-1]
                # numpy scalar -> Python scalar for GroupState serialization
                last, has = (v.item() if hasattr(v, "item") else v), True
            yield pdf[col_order]
        state.update((last, has))

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
