"""Streaming time-bucket rollup: the continuous-aggregate analog of
operators/intervals.time_bucket_rollup for unbounded inputs.

Built on the native Structured Streaming windowed aggregation: event-time
tumbling windows + a watermark, append output mode, so a bucket row is
emitted exactly once — when the watermark passes the bucket's end — and
the state store only ever holds the open tail of buckets. That is the
100-TB-stream shape: state is O(groups x open buckets), not O(events),
and the emitted table is append-only (safe to sink to parquet/Kafka).

Late rows within the watermark delay still land in their bucket; rows
later than that are dropped by the engine ONCE the watermark has
actually advanced past them — Spark computes the watermark at batch
commit and applies it from the next batch, so a row late by exactly one
micro-batch may still be admitted (test-pinned behavior). Pick the
delay from the source's disorder bound.

Emitted rows are exactly the buckets whose end <= final watermark, where
the watermark is max(event time seen) - delay truncated to milliseconds —
the closed-form restriction a batch oracle can replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rollup_stream(
    stream: DataFrame,
    ts_us_col: str,
    width_s: int,
    group_cols: list[str],
    value_col: str,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Tumbling event-time rollup over a stream of (ts_us, groups, value).

    Returns an append-mode streaming DataFrame with one row per finalized
    (group..., bucket_s) holding n_rows / sum_value / min_value /
    max_value. Decimal sums keep per-bucket totals exact, so results are
    bit-identical to the batch rollup on the same (non-late) rows.
    """
    v = F.col(value_col).cast("decimal(28,6)")
    win = F.window(F.col("__ts"), f"{width_s} seconds")
    return (
        stream.withColumn("__ts", F.timestamp_micros(F.col(ts_us_col)))
        .withWatermark("__ts", watermark_delay)
        .groupBy(win.alias("__w"), *group_cols)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(v).alias("sum_value"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
        )
        .select(
            *group_cols,
            F.unix_timestamp(F.col("__w.start")).alias("bucket_s"),
            "n_rows",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def hll_stream(
    stream: DataFrame,
    ts_us_col: str,
    width_s: int,
    key_col: str,
    group_cols: list[str],
    p: int = 12,
    watermark_delay: str = "10 seconds",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Streaming windowed HLL register tables: distinct-count sketches per
    (group..., tumbling bucket) from an unbounded stream.

    Same append-mode/watermark contract as rollup_stream — a bucket's
    register table emits exactly once when the watermark passes its end,
    and state is O(groups x open buckets x occupied registers). The
    emitted rows ARE the mergeable sketch (operators/sketches.py
    hll_merge/hll_estimate consume them directly), so a 100-TB stream
    reduces to a tiny per-bucket register table once and every later
    distinct-count read is sketch-sized. max(rho) is idempotent, which
    also makes re-emitted state after a restart harmless to downstream
    merges.
    """
    from rustiflow_spark.operators.sketches import _hash_expr, hll_register_cols

    reg, rho = hll_register_cols(p)
    win = F.window(F.col("__ts"), f"{width_s} seconds")
    return (
        stream.withColumn("__ts", F.timestamp_micros(F.col(ts_us_col)))
        .withColumn("__hll_h", _hash_expr(key_col, hash_fn))
        .select(*group_cols, "__ts", reg, rho.alias("__rho"))
        .withWatermark("__ts", watermark_delay)
        .groupBy(win.alias("__w"), *group_cols, "reg")
        .agg(F.max("__rho").alias("mj"))
        .select(
            *group_cols,
            F.unix_timestamp(F.col("__w.start")).alias("bucket_s"),
            "reg",
            "mj",
        )
    )


def corpus_quality_stream(
    stream: DataFrame,
    ts_us_col: str,
    fine_s: int,
    coarse_s: int,
    key_col: str,
    group_cols: list[str],
    value_col: str,
    min_value: float | None = None,
    p: int = 12,
    watermark_delay: str = "10 seconds",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Composed streaming corpus-quality aggregate: quality filter →
    fine-bucket (rollup + HLL-register) aggregation → chained coarse-bucket
    merge — ONE streaming plan with TWO stateful operators (Spark's
    multi-stateful append-mode chaining via ``window_time``).

    Per (group..., coarse bucket, register) the emitted row carries the
    merged HLL register (max mj — distinct ``key_col`` sketch), plus the
    register's share of the rollup (n_rows, exact decimal sum_value);
    summing over registers recovers the bucket rollup and the register
    table feeds ``hll_estimate`` directly. Rows failing the quality bar
    (``value_col`` < min_value) never enter state.

    Scale shape: the fine operator holds O(groups × open fine buckets ×
    occupied registers) state; the chained coarse operator only ever sees
    already-reduced fine rows (one per register, not per event), so the
    second shuffle is sketch-sized — the streaming analog of the batch
    rollup cascade's never-rescan-raw rule. A coarse bucket emits exactly
    once, when the watermark passes its end (the fine children finalize
    strictly earlier; closed form: coarse_end ≤ ms-truncated(max_ts −
    delay), test-pinned).
    """
    if coarse_s % fine_s != 0:
        raise ValueError(
            f"coarse_s ({coarse_s}) must be a multiple of fine_s ({fine_s})"
        )
    from rustiflow_spark.operators.sketches import _hash_expr, hll_register_cols

    src = stream
    if min_value is not None:
        src = src.where(F.col(value_col) >= min_value)
    reg, rho = hll_register_cols(p)
    v = F.col(value_col).cast("decimal(28,6)")
    fine = (
        src.withColumn("__ts", F.timestamp_micros(F.col(ts_us_col)))
        .withColumn("__hll_h", _hash_expr(key_col, hash_fn))
        .select(*group_cols, "__ts", reg, rho.alias("__rho"), v.alias("__v"))
        .withWatermark("__ts", watermark_delay)
        .groupBy(
            F.window("__ts", f"{fine_s} seconds").alias("__wf"), *group_cols, "reg"
        )
        .agg(
            F.max("__rho").alias("mj"),
            F.count("*").alias("n_rows"),
            F.sum("__v").alias("sum_value"),
        )
    )
    return (
        fine.groupBy(
            F.window(F.window_time("__wf"), f"{coarse_s} seconds").alias("__wc"),
            *group_cols,
            "reg",
        )
        .agg(
            F.max("mj").alias("mj"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_value").alias("sum_value"),
        )
        .select(
            *group_cols,
            F.unix_timestamp(F.col("__wc.start")).alias("bucket_s"),
            "reg",
            "mj",
            "n_rows",
            "sum_value",
        )
    )


def cms_stream(
    stream: DataFrame,
    ts_us_col: str,
    width_s: int,
    key_col: str,
    group_cols: list[str],
    depth: int = 4,
    width_bits: int = 12,
    watermark_delay: str = "10 seconds",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Streaming windowed Count-Min counters: per (group..., tumbling
    bucket) frequency sketches from an unbounded stream.

    Same contract as hll_stream: a bucket's counter table emits exactly
    once when the watermark passes its end; emitted rows feed
    operators/sketches.cms_merge / cms_estimate directly (counter sums
    are associative), so per-bucket frequency questions never rescan the
    stream's raw history. All depth hashes come from one pass
    (posexplode), mirroring the batch builder.
    """
    from rustiflow_spark.operators.sketches import _cms_hash_expr

    cells = F.array(
        *[_cms_hash_expr(key_col, r, width_bits, hash_fn) for r in range(depth)]
    )
    win = F.window(F.col("__ts"), f"{width_s} seconds")
    return (
        stream.withColumn("__ts", F.timestamp_micros(F.col(ts_us_col)))
        .select(*group_cols, "__ts", F.posexplode(cells).alias("row", "bucket"))
        .withWatermark("__ts", watermark_delay)
        .groupBy(win.alias("__w"), *group_cols, "row", "bucket")
        .agg(F.count("*").alias("cnt"))
        .select(
            *group_cols,
            F.unix_timestamp(F.col("__w.start")).alias("bucket_s"),
            "row",
            "bucket",
            "cnt",
        )
    )


def hdr_stream(
    stream: DataFrame,
    ts_us_col: str,
    width_s: int,
    value_col: str,
    group_cols: list[str],
    sub_bits: int = 6,
    scale: int = 1_000_000,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming windowed HDR histograms: per (group..., tumbling bucket)
    quantile sketches from an unbounded stream — streaming percentiles
    without keeping raw values.

    Same contract as the other windowed sketches: a bucket's histogram
    emits exactly once at watermark passage and feeds
    operators/sketches.hdr_merge / hdr_quantiles directly (counts are
    associative). State is O(groups x open buckets x occupied value
    buckets) — bounded by the HDR layout regardless of value volume.
    """
    from rustiflow_spark.operators.sketches import _hdr_bucket_expr

    q = F.floor(F.col(value_col).cast("double") * scale).cast("long")
    guarded = F.when(
        q < 0,
        F.raise_error(
            F.concat(F.lit("hdr_stream: negative value "), F.col(value_col))
        ).cast("long"),
    ).otherwise(q)
    win = F.window(F.col("__ts"), f"{width_s} seconds")
    return (
        stream.withColumn("__ts", F.timestamp_micros(F.col(ts_us_col)))
        .withColumn("__q", guarded)
        .select(*group_cols, "__ts", _hdr_bucket_expr("__q", sub_bits).alias("bucket"))
        .withWatermark("__ts", watermark_delay)
        .groupBy(win.alias("__w"), *group_cols, "bucket")
        .agg(F.count("*").alias("cnt"))
        .select(
            *group_cols,
            F.unix_timestamp(F.col("__w.start")).alias("bucket_s"),
            "bucket",
            "cnt",
        )
    )


def profile_stream(
    stream: DataFrame,
    ts_us_col: str,
    width_s: int,
    cols: list[str],
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming data-quality monitor: the continuous twin of
    operators/profile.profile_table. Per tumbling event-time bucket and
    per monitored column, emits (bucket_s, col_name, n, n_null, min_s,
    max_s) — the null-rate/range drift feed a corpus ingest pipeline
    alarms on.

    Same append-mode/watermark contract as rollup_stream: a bucket's
    stats rows emit exactly once when the watermark passes its end, and
    state is O(open buckets x monitored columns) counters — never rows.
    min/max aggregate in the column's native type (string-casting first
    would order numerics lexicographically) and only the result is
    rendered to string; the long-format unpivot (stack) runs on the
    already-aggregated bucket row, so it adds no state. Distinct counts
    are deliberately absent (exact distinct is unsupported in streaming;
    compose with hll_stream per column for replayable cardinalities).
    """
    if not cols:
        raise ValueError("profile_stream: no columns to monitor")
    win = F.window(F.col("__ts"), f"{width_s} seconds")
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(f"`{c}`")
        aggs.append(F.count(col).alias(f"__c{i}"))
        aggs.append(F.min(col).cast("string").alias(f"__lo{i}"))
        aggs.append(F.max(col).cast("string").alias(f"__hi{i}"))
    stack = ", ".join(
        f"'{c}', __c{i}, __lo{i}, __hi{i}" for i, c in enumerate(cols)
    )
    return (
        stream.withColumn("__ts", F.timestamp_micros(F.col(ts_us_col)))
        .withWatermark("__ts", watermark_delay)
        .groupBy(win.alias("__w"))
        .agg(*aggs)
        .select(
            F.unix_timestamp(F.col("__w.start")).alias("bucket_s"),
            F.col("__n"),
            F.expr(
                f"stack({len(cols)}, {stack})"
                " as (col_name, __cnt, min_s, max_s)"
            ),
        )
        .select(
            "bucket_s",
            "col_name",
            F.col("__n").alias("n"),
            (F.col("__n") - F.col("__cnt")).alias("n_null"),
            "min_s",
            "max_s",
        )
    )


def drift_hist_stream(
    stream: DataFrame,
    ts_us_col: str,
    width_s: int,
    value_col: str,
    group_cols: list[str],
    lo: int,
    hi: int,
    n_bins: int = 32,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming windowed value histograms — the monitoring twin of
    operators/profile.py histogram_drift: per (group..., tumbling
    bucket), the count in each of n_bins equal-width bins over the
    declared [lo, hi] range (out-of-range clamps to the edge bins).

    Same append-mode/watermark contract as the sketch streams: a
    bucket's histogram emits exactly once when the watermark passes its
    end, state is O(groups x open buckets x occupied bins), and counts
    are map-side-combinable sums. The emitted rows ARE the mergeable
    histogram table — feed any window's rows plus a broadcast reference
    histogram straight into histogram_drift's chi-square tail (or
    groupBy-sum adjacent windows first: sums merge losslessly), so a
    continuous 100-TB stream reduces once to bin counts and every later
    drift read is histogram-sized."""
    if lo is None or hi is None or hi <= lo or n_bins <= 0:
        raise ValueError("drift_hist_stream: need lo < hi and n_bins > 0")
    b = F.floor(
        (F.col(value_col).cast("double") - lo) * n_bins / (hi - lo)
    ).cast("int")
    b = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b))
    # NULL values -> dedicated bin -1, matching histogram_drift's batch
    # binning (round-5 ADVICE: a NULL bin key never joins across sides)
    b = F.when(F.col(value_col).isNull(), F.lit(-1)).otherwise(b)
    win = F.window(F.col("__ts"), f"{width_s} seconds")
    return (
        stream.withColumn("__ts", F.timestamp_micros(F.col(ts_us_col)))
        .select(*group_cols, "__ts", b.alias("bin"))
        .withWatermark("__ts", watermark_delay)
        .groupBy(win.alias("__w"), *group_cols, "bin")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            *group_cols,
            F.unix_timestamp(F.col("__w.start")).alias("bucket_s"),
            "bin",
            "n",
        )
    )
