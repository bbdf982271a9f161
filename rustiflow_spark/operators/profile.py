"""Per-column table profiling — the ANALYZE/data-quality pass a corpus
pipeline runs before anything trains on a new drop.

The reference engine has no profiling operator (it consumes packets,
rustiflow/src/main.rs); this belongs to the training-data operator
surface (SURVEY.md §2.7): one scan over an arbitrary table producing a
long-format stats row per column — row count, null count, distinct
count, min/max — the inputs to schema-drift alerts, null-rate gates,
and join-key sanity checks.

Scale shape:
- counts/min/max come from ONE aggregate pass with map-side partials —
  a single exchange of one partial row per task, regardless of table
  width;
- ``exact_distinct=True`` adds exact count(DISTINCT c) per column.
  Catalyst plans k distinct aggregates via an Expand (k+1 rows out per
  input row) — exact, but the shuffle carries k x rows. That is the
  verification mode. At 100 TB use ``exact_distinct=False``:
  approx_count_distinct (HLL++) folds into the same single partial
  aggregate — no Expand, one scan, error ~``rsd``;
- the unpivot to long format runs on the single aggregated row (a
  ``stack`` over one row — free).

min/max aggregate in the column's NATIVE type (string-casting before
the aggregate would order numerics lexicographically) and only the
result is rendered to string. Distinct/null semantics match SQL:
count(DISTINCT c) and count(c) both ignore NULLs.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """One stats row per column: (col_name, n, n_null, n_distinct,
    min_s, max_s), ordered by col_name."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table: no columns to profile")
    # exact mode's Expand multiplies rows x (k+1); spread a compressed
    # small-file scan so that work parallelizes (scan partitions are
    # sized by COMPRESSED bytes — see decontam.py; no-op at real scale)
    sc = df.sparkSession.sparkContext
    if exact_distinct and df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(f"`{c}`")
        aggs.append(F.count(col).alias(f"__c{i}"))
        if exact_distinct:
            aggs.append(F.count_distinct(col).alias(f"__d{i}"))
        else:
            aggs.append(
                F.approx_count_distinct(col, rsd=rsd).alias(f"__d{i}")
            )
        aggs.append(F.min(col).cast("string").alias(f"__lo{i}"))
        aggs.append(F.max(col).cast("string").alias(f"__hi{i}"))
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __c{i}, __d{i}, __lo{i}, __hi{i}" for i, c in enumerate(cols)
    )
    return (
        row.select(
            F.col("__n"),
            F.expr(
                f"stack({len(cols)}, {stack})"
                " as (col_name, __cnt, n_distinct, min_s, max_s)"
            ),
        )
        .select(
            "col_name",
            F.col("__n").alias("n"),
            (F.col("__n") - F.col("__cnt")).alias("n_null"),
            "n_distinct",
            "min_s",
            "max_s",
        )
        .orderBy("col_name")
    )
