"""Leakage-free temporal window features: lag/lead, forward-fill backfill,
rolling time-range aggregates. All pure Catalyst window expressions —
whole-stage codegen, no Python.

North-rule additions (SURVEY.md §4 "what needs custom work" #3); the
reference has no window features beyond its per-flow ordered scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def add_lag_lead_features(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    lags: list[int] = (1,),
    leads: list[int] = (),
    order_col: str | None = None,
) -> DataFrame:
    """lag_k / lead_k columns per value column. lead features look into the
    future — callers building training data should use lags only (the tests
    assert lag features are invariant under future-row permutation/drop)."""
    order = [F.asc(ts_col)] + ([F.asc(order_col)] if order_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = df
    for c in value_cols:
        for k in lags:
            out = out.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
        for k in leads:
            out = out.withColumn(f"{c}_lead{k}", F.lead(c, k).over(w))
    return out


def forward_fill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    order_col: str | None = None,
    suffix: str = "_ffill",
) -> DataFrame:
    """Backfill missing values from the most recent non-null PAST value
    (leakage-free; the 'backfill features' of the north rule)."""
    order = [F.asc(ts_col)] + ([F.asc(order_col)] if order_col else [])
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.last(c, ignorenulls=True).over(w))
    return out


def rolling_time_features(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    windows_us: dict[str, int],
    include_current: bool = True,
) -> DataFrame:
    """Rolling aggregates over trailing event-time ranges, e.g.
    {'1h': 3600_000_000}: count/sum/mean of value in (ts - range, ts].

    Uses RANGE BETWEEN on the microsecond timestamp — Catalyst's range
    frame, no Python. With include_current=False the frame ends 1 µs before
    the current row (strictly-past, fully leakage-free)."""
    out = df
    upper = 0 if include_current else -1
    for name, rng in windows_us.items():
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col(ts_col).cast("long"))
            .rangeBetween(-rng, upper)
        )
        out = (
            out.withColumn(f"{value_col}_cnt_{name}", F.count(value_col).over(w))
            .withColumn(f"{value_col}_sum_{name}", F.sum(value_col).over(w))
            .withColumn(f"{value_col}_mean_{name}", F.avg(value_col).over(w))
        )
    return out


def forward_fill_split(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    chunk_us: int,
    order_col: str | None = None,
    suffix: str = "_ffill",
) -> DataFrame:
    """Hot-key-safe forward_fill: the distributed prefix scan applied to
    last(..., ignorenulls) — completes the split family (expanding sums:
    encoding.target_encode_expanding_split; exact ntile:
    encoding.quantile_bin_split).

    Plain forward_fill sorts each key in ONE task; a hot entity holding
    10% of a 100-TB log serializes on one core. Here each key's timeline
    chunks into `chunk_us` buckets: in-chunk fill runs parallel across
    chunks, each chunk's LAST non-null value is a per-chunk scalar, a
    prefix last(ignorenulls) over the tiny chunk-tail table supplies the
    carry-in, and rows still null after the in-chunk fill coalesce to the
    carry-in. Bit-identical to forward_fill (pytest-asserted down to
    ~1-row chunks; the batch contract oracle is shared by the streaming
    twin too).
    """
    if chunk_us <= 0:
        raise ValueError("chunk_us must be positive")
    order = [F.asc(ts_col)] + ([F.asc(order_col)] if order_col else [])
    out = df.withColumn(
        "__chunk", F.floor(F.col(ts_col) / F.lit(int(chunk_us)))
    )
    w_in = (
        Window.partitionBy(*key_cols, "__chunk")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        out = out.withColumn(f"__in_{c}", F.last(c, ignorenulls=True).over(w_in))
    tails = out.groupBy(*key_cols, "__chunk").agg(
        *[
            F.max_by(F.col(f"__in_{c}"), F.struct(*[F.col(ts_col)] + (
                [F.col(order_col)] if order_col else []
            ))).alias(f"__tail_{c}")
            for c in value_cols
        ]
    )
    w_pref = (
        Window.partitionBy(*key_cols)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pref = tails.select(
        *key_cols,
        "__chunk",
        *[
            F.last(f"__tail_{c}", ignorenulls=True).over(w_pref).alias(f"__carry_{c}")
            for c in value_cols
        ],
    )
    # NO forced broadcast here: unlike the category-keyed encoder splits,
    # this table is O(entities x occupied chunks) — unbounded at scale.
    # The big side is already hash-partitioned on (key, __chunk) by the
    # in-chunk window, so the equi-join shuffles only the tiny side (and
    # AQE still broadcasts when it fits).
    out = out.join(pref, on=[*key_cols, "__chunk"], how="left")
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}", F.coalesce(F.col(f"__in_{c}"), F.col(f"__carry_{c}"))
        )
    drop = (
        ["__chunk"]
        + [f"__in_{c}" for c in value_cols]
        + [f"__carry_{c}" for c in value_cols]
    )
    return out.drop(*drop)
