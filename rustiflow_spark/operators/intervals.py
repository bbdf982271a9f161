"""Interval (range) join and hypertable-style time-bucket rollups.

range_join: join point events to time intervals without the O(N×M) theta
join Spark would otherwise plan for `ts BETWEEN lo AND hi`. Both sides are
bucketized on a fixed width W: an event lands in exactly one bucket, an
interval explodes into the buckets it covers, and the match becomes an
equi-join on the bucket id plus a residual BETWEEN filter. Each matching
(event, interval) pair meets in exactly one bucket — the event's — so the
join needs no post-dedup. Pick W near the median interval length: fan-out
is ~len/W rows per interval, and the equi-join key spreads across
time-buckets, so the shuffle partitions by time instead of piling onto a
handful of reducers the way a few distinct join keys would.

time_bucket_rollup / rollup_coarser: tumbling time_bucket aggregation with
lossless cascade — the coarse resolution is computed FROM the fine rollup
(sum-of-sums, min-of-mins, count-of-counts), never from the raw table.
At 100 TB that is the difference between re-scanning the corpus per
resolution and one scan + K tiny re-aggregations. Decimal sums keep the
cascade exact (double addition is not associative; decimal is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

def _us(col_name: str, df: DataFrame) -> "F.Column":
    """Column as int64 epoch microseconds, independent of the session time
    zone (timestampdiff matches DuckDB's epoch_us on naive timestamps)."""
    dt = dict(df.dtypes)[col_name]
    if dt == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col_name})"
        )
    if dt == "timestamp":
        return F.unix_micros(F.col(col_name))
    return F.col(col_name).cast("long")


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width_us: int,
    extra_keys: list[str] | None = None,
    max_fanout: int = 4096,
    n_salts: int = 1,
) -> DataFrame:
    """Inner-join events to every interval with lo <= ts <= hi (inclusive).

    Returns all columns of both inputs. `extra_keys` adds equality keys to
    the join (e.g. user_id), sharpening both the shuffle and the match.
    An interval spanning more than `max_fanout` buckets fails loudly in
    the row that violates it (raise_error, no extra pre-scan job) —
    pick a larger bucket_width_us rather than silently exploding.

    n_salts > 1 spreads a HOT bucket (a burst of events in one time
    window) across that many reducers: each event gets one deterministic
    salt, each interval-bucket row replicates across all salts, and the
    join key grows to (bucket, salt) — every pair still meets exactly
    once, at n_salts x interval-side fan-out. Leave at 1 unless a bucket
    is large enough to skew the shuffle.
    """
    keys = list(extra_keys or [])
    w = int(bucket_width_us)
    # resolve ts/lo/hi on their OWN side before the join and carry them as
    # reserved __-prefixed columns: if the two inputs share a column name
    # (both have a 'ts'), an unqualified post-join reference would be
    # ambiguous
    ev = events.withColumn("__ts_us", _us(ts_col, events)).withColumn(
        "__rb", F.floor(F.col("__ts_us") / w)
    )
    if n_salts > 1:
        # salt from a per-ROW value, not the timestamp: the typical hot
        # bucket is a burst of identical/coarse timestamps, which a
        # ts-derived salt would send to one reducer anyway. Routing needs
        # no cross-run determinism — the interval side is replicated
        # across every salt, so any salt value matches correctly.
        ev = ev.withColumn(
            "__rs",
            F.pmod(F.xxhash64(F.monotonically_increasing_id(), F.lit(7)), n_salts),
        )
    iv0 = intervals.withColumn("__lo_us", _us(lo_col, intervals)).withColumn(
        "__hi_us", _us(hi_col, intervals)
    )
    lo_us, hi_us = F.col("__lo_us"), F.col("__hi_us")
    # guard on the arithmetic span BEFORE materializing the sequence — a
    # pathological interval must hit this error, not Spark's array-length
    # limit (or an OOM) inside sequence()
    span = F.floor(hi_us / w) - F.floor(lo_us / w) + 1
    iv = iv0.withColumn(
        "__rbs",
        F.when(
            span > max_fanout,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"range_join: interval spans more than {max_fanout}"
                        f" buckets of {w} us — raise bucket_width_us"
                    )
                )
            ).cast("array<long>"),
        ).otherwise(F.sequence(F.floor(lo_us / w), F.floor(hi_us / w))),
    ).withColumn("__rb", F.explode("__rbs")).drop("__rbs")
    join_keys = ["__rb", *keys]
    if n_salts > 1:
        iv = iv.withColumn(
            "__rs", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
        )
        join_keys = ["__rb", "__rs", *keys]
    joined = ev.join(iv, join_keys).where(
        F.col("__ts_us").between(F.col("__lo_us"), F.col("__hi_us"))
    )
    return joined.drop("__rb", "__rs", "__ts_us", "__lo_us", "__hi_us")


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str,
    width_s: int,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Fine-resolution tumbling rollup: one row per (group, bucket) with
    n_rows / sum_value / min_value / max_value. The value sum is
    DECIMAL(28,6): exact, order-independent, cascade-safe. The bucket is
    epoch seconds (bucket_s, long) — timezone-proof; to_timestamp it for
    display."""
    bucket = (
        F.floor(_us(ts_col, df) / (width_s * 1_000_000)).cast("long") * width_s
    ).alias("bucket_s")
    v = F.col(value_col).cast("decimal(28,6)")
    return (
        df.select(*group_cols, bucket, v.alias("__v"))
        .groupBy(*group_cols, "bucket_s")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("__v").alias("sum_value"),
            F.min("__v").alias("min_value"),
            F.max("__v").alias("max_value"),
        )
    )


def rollup_coarser(
    fine: DataFrame, width_s: int, group_cols: list[str], fine_width_s: int | None = None
) -> DataFrame:
    """Re-aggregate a time_bucket_rollup to a coarser width WITHOUT touching
    the raw table: counts add, decimal sums add exactly, min/max nest.

    width_s MUST be a multiple of the fine rollup's width — otherwise a
    fine bucket straddles two coarse buckets and its rows silently land
    in the earlier one. Pass fine_width_s to have that checked here;
    without it the caller owns the invariant.
    """
    if fine_width_s is not None and width_s % fine_width_s != 0:
        raise ValueError(
            f"rollup_coarser: coarse width {width_s}s is not a multiple of"
            f" the fine width {fine_width_s}s — fine buckets would straddle"
            " coarse boundaries and mis-bucket their rows"
        )
    bucket = (
        F.floor(F.col("bucket_s") / width_s).cast("long") * width_s
    ).alias("bucket_s")
    return (
        fine.select(
            *group_cols, bucket, "n_rows", "sum_value", "min_value", "max_value"
        )
        .groupBy(*group_cols, "bucket_s")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
