"""Z-order (Morton) layout for multi-dimensional data skipping.

At 100 TB the cheapest query is the one that never reads the file: sorting
a table by a bit-interleaved key of several filter columns gives every
dimension locality at once, so parquet min/max (row-group and file) stats
prune scans for predicates on ANY of the interleaved columns — where a
plain sort only skips on its leading column.

zorder_key is pure integer Catalyst arithmetic (normalize each column to
a fixed bit budget against caller-declared ranges, then interleave bits),
deterministic and SQL-replayable. layout_zorder applies it:
repartitionByRange on the key (range partitioner => globally ordered
files) + sortWithinPartitions => tight per-file min/max on every
dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def zorder_key(
    df: DataFrame,
    cols: list[str],
    ranges: list[tuple[int, int]],
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Add a Morton-interleaved sort key over integer columns.

    ranges[i] = (lo, hi) declares col i's domain: values clamp to it,
    then scale to [0, 2^bits). Declared (not sampled) ranges keep the key
    a pure deterministic function of the row — stable across runs and
    replayable by any engine. n_cols * bits must fit a long (<= 62).
    """
    n = len(cols)
    if n != len(ranges):
        raise ValueError("zorder_key: one (lo, hi) range per column")
    if n * bits > 62:
        raise ValueError(f"zorder_key: {n} cols x {bits} bits exceeds a long")
    parts = []
    for i, (c, (lo, hi)) in enumerate(zip(cols, ranges)):
        if hi <= lo:
            raise ValueError(f"zorder_key: empty range for {c}")
        span = hi - lo
        # (v - lo) * 2^bits must fit a long or the key silently wraps
        if span + 1 > (1 << (62 - bits)):
            raise ValueError(
                f"zorder_key: range for {c} too wide for {bits} bits"
                f" (span {span} > 2^{62 - bits}) — shrink the range or bits"
            )
        # clamp -> scale to [0, 2^bits): q = (v - lo) * 2^bits div (span + 1)
        q = (
            f"(CAST(least(greatest(CAST({c} AS BIGINT), {lo}), {hi}) - {lo} AS BIGINT)"
            f" * {1 << bits}) div {span + 1}"
        )
        parts.append((i, q))
    terms = [
        f"shiftleft(shiftright({q}, {b}) & 1, {b * n + i})"
        for i, q in parts
        for b in range(bits)
    ]
    return df.withColumn(out_col, F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)"))


def layout_zorder(
    df: DataFrame,
    cols: list[str],
    ranges: list[tuple[int, int]],
    n_files: int,
    bits: int = 16,
) -> DataFrame:
    """Order a table for write so every interleaved dimension skips.

    repartitionByRange on the z-key (disjoint key ranges per output file)
    then sortWithinPartitions — each parquet file gets tight min/max on
    every interleaved column, which is what the scan-time stats pruning
    consumes. Drop the key after write if it isn't wanted downstream.
    """
    keyed = zorder_key(df, cols, ranges, bits)
    return keyed.repartitionByRange(n_files, "zkey").sortWithinPartitions("zkey")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on its join key.

    THE shuffle-elimination lever for repeated big-big joins at 100 TB:
    two tables bucketed on the same key with the same bucket count
    sort-merge-join with NO Exchange on either side — the bucket files ARE
    the shuffle output, paid once at write time instead of per query. With
    sort_cols the per-bucket sort is also pre-paid (no Sort node). The
    join-side plan is asserted shuffle-free in tests/test_layout.py.

    Spark bucketing rides the catalog (saveAsTable); pass `path` to keep
    the data external at a chosen location. Reader side needs
    spark.sql.sources.bucketing.enabled (default true).
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(spark, left_table: str, right_table: str, on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-key/same-count bucketed tables without a shuffle.

    Disables broadcast for this plan (a broadcast would mask whether the
    bucket layout actually removed the Exchange — at 100 TB neither side
    broadcasts anyway)."""
    left = spark.table(left_table).hint("merge")
    return left.join(spark.table(right_table).hint("merge"), on, how)
