"""Leakage-free categorical/numeric feature encoders.

The north rule's engine is a point-in-time feature-engineering layer over
training sequences: every derived feature at (entity, ts) may only use
STRICTLY-PAST data (the reference's flow features have the same property —
each exported vector is a function of packets at or before the export
timestamp, flow_table.rs expiry model). These encoders extend that
discipline to the classic tabular encoders a training pipeline needs:

- expanding target encoding (past-only mean/count of a target per category)
- quantile binning (rank-based discretization)
- z-score normalization per group (two-phase partial/final aggregate +
  broadcast join back — no global sort, no second scan of wide payloads)

All three are pure Catalyst (window functions + hash aggregates): no Python
stages, whole-stage codegen end-to-end, one shuffle per distinct
partitioning key. At 100 TB the expanding encoders shuffle once on the
category key (skew handled by the same salted two-phase pattern as
operators/skew.py when a category dominates), and the normalize path
broadcasts only the per-group stats table (O(groups) rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def target_encode_expanding(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    ts_col: str,
    order_col: str | None = None,
    prior: float | None = None,
    smoothing: float = 0.0,
    suffix: str = "_te",
) -> DataFrame:
    """Past-only (expanding) target encoding of `cat_col` by `target_col`.

    Each row gets the running mean and count of the target over all
    STRICTLY earlier rows of the same category (ordered by ts_col, then
    order_col for a deterministic total order). Rows with no history get
    NULL (or `prior` when given). With smoothing m > 0 the encoding is the
    shrunk estimate (sum + m*prior) / (cnt + m) — the standard
    leave-nothing-from-the-future target encoder.

    Window is ROWS UNBOUNDED PRECEDING .. 1 PRECEDING: zero temporal
    leakage by construction, same guarantee as the as-of join
    (operators/asof.py).
    """
    order = [F.asc(ts_col)] + ([F.asc(order_col)] if order_col else [])
    w = (
        Window.partitionBy(cat_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cnt = F.count(target_col).over(w)
    s = F.sum(target_col).over(w)
    if smoothing > 0.0:
        if prior is None:
            raise ValueError("smoothing requires a prior")
        enc = (
            F.coalesce(s, F.lit(0.0)) + F.lit(float(smoothing)) * F.lit(float(prior))
        ) / (cnt + F.lit(float(smoothing)))
    else:
        enc = s / cnt  # NULL when cnt == 0 (sum over empty frame is NULL)
        if prior is not None:
            enc = F.coalesce(enc, F.lit(float(prior)))
    return df.withColumn(f"{cat_col}{suffix}_n", cnt.cast("long")).withColumn(
        f"{cat_col}{suffix}", enc
    )


def quantile_bin(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    by: str | list[str] | None = None,
    order_col: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Rank-based discretization: ntile(n_bins) over value_col (optionally
    per group). Deterministic when order_col breaks value ties.

    ntile is an exact equi-depth binning — unlike approxQuantile cutoffs it
    is reproducible bit-for-bit across engines, which is what a training
    pipeline wants for feature parity between backfill and serving.
    Cost: one shuffle on `by` + in-partition sort (Spark's window ntile);
    for the global (by=None) case Spark plans a single-partition window —
    use a grouped variant at scale.
    """
    out_col = out_col or f"{value_col}_bin"
    order = [F.asc(value_col)] + ([F.asc(order_col)] if order_col else [])
    by = [by] if isinstance(by, str) else (list(by) if by else [])
    w = Window.partitionBy(*by).orderBy(*order) if by else Window.orderBy(*order)
    return df.withColumn(out_col, F.ntile(n_bins).over(w))


def zscore_normalize(
    df: DataFrame,
    value_cols: list[str],
    by: str | list[str],
    suffix: str = "_z",
    eps: float = 0.0,
) -> DataFrame:
    """Per-group z-score normalization via a two-phase aggregate.

    Phase 1: hash-aggregate per-group (mean, stddev_pop) — map-side partial
    aggregation, O(groups) result. Phase 2: broadcast the stats table back
    onto the fact rows (no second shuffle of the wide side). Groups with
    zero variance normalize to NULL (or 0 when eps > 0 guards the divide).
    """
    by = [by] if isinstance(by, str) else list(by)
    aggs = []
    for c in value_cols:
        aggs.append(F.avg(c).alias(f"__mean_{c}"))
        aggs.append(F.stddev_pop(c).alias(f"__std_{c}"))
    stats = df.groupBy(*by).agg(*aggs)
    out = df.join(F.broadcast(stats), on=by, how="left")
    for c in value_cols:
        denom = F.col(f"__std_{c}") + F.lit(float(eps))
        z = (F.col(c) - F.col(f"__mean_{c}")) / F.when(denom != 0.0, denom)
        out = out.withColumn(f"{c}{suffix}", z)
    drop = [f"__mean_{c}" for c in value_cols] + [f"__std_{c}" for c in value_cols]
    return out.drop(*drop)
