"""Deterministic HyperLogLog distinct-count sketches, pure Catalyst.

Spark's approx_count_distinct is HLL++ but its sketch internals are not
replayable outside the JVM. This implementation keeps the classic HLL
shape — md5-derived 60-bit hash, 2^p registers, max(rho) per register —
built entirely from deterministic integer Catalyst expressions, so:

- the register table IS the sketch: `hll_registers` rows merge across
  shards / days / tables with a plain groupBy-max (max is associative and
  idempotent), the canonical pre-aggregated-sketch pattern at 100 TB —
  store the tiny register table per partition, never rescan the raw keys;
- every step (hash, register split, rho, the 2^-M harmonic sum as an
  exact integer numerator over 2^49) is order-independent integer
  arithmetic, so a DuckDB oracle reproduces the estimate bit-for-bit; the
  only floating ops are one divide and the small-range ln correction.

The 60-bit hash = the first 15 hex chars of md5(key-as-string): wide
enough that rho saturation is unreachable in practice, and computable
identically in any engine with md5 (standard error ~1.04/sqrt(m), the
usual HLL bound — p=12 gives ~1.6%).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_HASH_BITS = 60


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    try:
        return {16: 0.673, 32: 0.697, 64: 0.709}[m]
    except KeyError:
        raise ValueError(
            f"hll: no bias constant for m={m} registers — use p >= 4"
        ) from None


def _hash_expr(key_col: str, hash_fn: str) -> "F.Column":
    """60-bit deterministic hash of the key.

    'xxhash64' (default): low 60 bits of Spark's native xxhash64 — pure
    JVM codegen, ~10x cheaper per row than md5; use in production.
    'md5': first 15 hex chars of md5(str(key)) — slower, but computable
    identically in any engine with md5, which is what the cross-engine
    oracle replay needs.
    """
    if hash_fn == "xxhash64":
        return F.expr(f"xxhash64({key_col}) & {(1 << 60) - 1}")
    if hash_fn == "md5":
        return F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
        ).cast("long")
    raise ValueError(f"hll: unknown hash_fn {hash_fn!r}")


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 12,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-group HLL register table: (group..., reg, mj).

    reg = low p bits of the hash, mj = max over keys of rho(high bits)
    where rho = leading-zero count + 1 within the remaining 60-p bits.
    Partial aggregation (map-side max) makes the shuffle tiny regardless
    of input size; the output is at most 2^p rows per group.
    """
    reg, rho = hll_register_cols(p)
    return (
        df.select(*group_cols, _hash_expr(key_col, hash_fn).alias("__hll_h"))
        .select(*group_cols, reg, rho.alias("__rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("__rho").alias("mj"))
    )


def hll_register_cols(p: int) -> tuple["F.Column", "F.Column"]:
    """(reg, rho) expressions over a __hll_h hash column — the single
    definition of the register split, shared by the batch and streaming
    sketches so they stay merge-compatible."""
    m = 1 << p
    w_bits = _HASH_BITS - p
    reg = (F.col("__hll_h") % m).cast("int").alias("reg")
    w = F.expr(f"__hll_h div {m}")
    # bin() prints without leading zeros: bit_length(w) = length(bin(w))
    rho = (
        F.when(w == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits) - F.length(F.bin(w)) + 1)
        .cast("int")
    )
    return reg, rho


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables (e.g. unioned per-day sketches): groupBy-max."""
    return registers.groupBy(*group_cols, "reg").agg(F.max("mj").alias("mj"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 12
) -> DataFrame:
    """Estimate per group from a register table.

    The harmonic sum S = sum(2^-mj) over all m registers is carried as an
    exact integer numerator over 2^B where B = w_bits + 1 = 61 - p (the
    max rho): empty registers contribute 2^B each, a register with value
    mj contributes 2^(B-mj) — integer adds, so the result is independent
    of aggregation order, and the numerator is bounded by m * 2^B = 2^61
    for EVERY p. Small-range correction (linear counting) applies below
    2.5m when empty registers remain.
    """
    m = 1 << p
    b = _HASH_BITS - p + 1  # max rho; 2^b is the empty register's weight
    alpha = _alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {b} - CAST(mj AS INT))")
        ).alias("__s_nz"),
        F.count("*").alias("__nz"),
    )
    s_num = F.col("__s_nz") + (F.lit(m) - F.col("__nz")) * F.lit(1 << b)
    raw = F.lit(alpha * m * m * float(1 << b)) / s_num.cast("double")
    empty = (F.lit(m) - F.col("__nz")).cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("__nz") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("hll_estimate"))


def hll_count_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 12,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """One-shot per-group distinct-count estimate: registers -> estimate."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols, p, hash_fn), group_cols, p
    )


# --- HDR-style histogram quantiles ------------------------------------------
#
# Mergeable quantile sketch: values quantize to integers (floor(v * scale)),
# then bucket by (bit-length, top sub_bits mantissa bits) — an HDR-histogram
# layout with bounded RELATIVE error 2^-sub_bits. Bucketing is pure integer
# arithmetic (the bin()-length trick again, no float log), so histograms are
# deterministic, partition-invariant, bit-exactly SQL-replayable, and merge
# across shards with a plain groupBy-sum. At 100 TB the histogram is the
# thing you store per partition; quantile reads never rescan raw values.


def _hdr_bucket_expr(q_col: str, sub_bits: int) -> "F.Column":
    """Bucket id of non-negative int column q_col.

    q < 2^m            -> bucket = q                     (exact)
    q in [2^e, 2^(e+1)) -> bucket = (e-m+1)*2^m + top_m_mantissa_bits
    The two ranges meet continuously at q = 2^m.
    """
    m = sub_bits
    # bit length via length(bin(q)); shift counts are runtime expressions,
    # so SQL shiftright (column bit count) rather than the python-int API
    return F.expr(
        f"CASE WHEN {q_col} < {1 << m} THEN {q_col} "
        f"ELSE CAST((length(bin({q_col})) - 1 - {m} + 1) * {1 << m} "
        f"     + (shiftright({q_col}, CAST(length(bin({q_col})) - 1 - {m} AS INT))"
        f"        - {1 << m}) AS BIGINT) END"
    )


def _hdr_lower_bound(bucket_col: str, sub_bits: int) -> "F.Column":
    """Inclusive lower bound (in quantized units) of a bucket id."""
    m = sub_bits
    return F.expr(
        f"CASE WHEN shiftright({bucket_col}, {m}) = 0 THEN {bucket_col} "
        f"ELSE shiftleft(({bucket_col} % {1 << m}) + {1 << m},"
        f"               CAST(shiftright({bucket_col}, {m}) - 1 AS INT)) END"
    )


def hdr_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    sub_bits: int = 6,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group HDR histogram: (group..., bucket, cnt).

    Requires non-negative values (fails loudly per offending row — no
    extra validation scan). Map-side partial counts keep the shuffle at
    O(groups x occupied buckets) regardless of input size.
    """
    q = F.floor(F.col(value_col).cast("double") * scale).cast("long")
    guarded = F.when(
        q < 0,
        F.raise_error(
            F.concat(F.lit("hdr_histogram: negative value "), F.col(value_col))
        ).cast("long"),
    ).otherwise(q)
    return (
        df.select(*group_cols, guarded.alias("__q"))
        .select(*group_cols, _hdr_bucket_expr("__q", sub_bits).alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def hdr_merge(hists: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge histograms (e.g. unioned per-shard sketches): groupBy-sum."""
    return hists.groupBy(*group_cols, "bucket").agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    probs: list[float],
    sub_bits: int = 6,
    scale: int = 1_000_000,
) -> DataFrame:
    """Quantile estimates from a histogram: one row per (group..., p).

    The p-quantile is the lower bound of the first bucket whose cumulative
    count reaches ceil(p * total) — a rank-exact rule on integer counts,
    so estimates are deterministic and replayable; the value is within
    2^-sub_bits relative error of the true quantile.
    """
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "bucket",
        F.sum("cnt").over(w_cum).alias("__cum"),
        F.sum("cnt").over(w_tot).alias("__tot"),
    )
    plit = F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("p")
    ranked = cum.select(*group_cols, "bucket", "__cum", "__tot", plit).where(
        F.col("__cum") >= F.ceil(F.col("p") * F.col("__tot"))
    )
    w_pick = Window.partitionBy(*group_cols, "p").orderBy("bucket")
    return (
        ranked.withColumn("__rn", F.row_number().over(w_pick))
        .where(F.col("__rn") == 1)
        .select(
            *group_cols,
            "p",
            (_hdr_lower_bound("bucket", sub_bits).cast("double") / scale).alias(
                "quantile"
            ),
        )
    )


# --- Count-Min frequency sketch ---------------------------------------------
#
# Mergeable per-group frequency sketch: d hash rows x 2^w buckets of counts.
# Counters add across shards (groupBy-sum merge), point estimates are the
# min over the d rows — the classic conservative overestimate
# (err <= e/2^w * total with prob 1 - e^-d). Hashing follows the HLL
# pattern: xxhash64(key, row) in production, md5(key || '#' || row) when a
# cross-engine replay must reproduce the sketch bit-for-bit.


def _cms_hash_expr(key_col: str, row: int, w: int, hash_fn: str) -> "F.Column":
    if hash_fn == "xxhash64":
        return F.expr(f"xxhash64({key_col}, {row}) & {(1 << w) - 1}")
    if hash_fn == "md5":
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"#{row}"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % (1 << w)
        )
    raise ValueError(f"cms: unknown hash_fn {hash_fn!r}")


def cms_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    depth: int = 4,
    width_bits: int = 12,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-group Count-Min sketch: (group..., row, bucket, cnt).

    One pass, one shuffle of at most groups x depth x 2^width_bits counter
    rows (map-side partial counts); the input is never rescanned for
    lookups. Merge shards with cms_merge (counter sums are associative).
    """
    # all depth hashes in ONE scan (posexplode of the per-row cell array);
    # a union of per-row selects would rescan the input depth times
    cells = F.array(
        *[_cms_hash_expr(key_col, r, width_bits, hash_fn) for r in range(depth)]
    )
    return (
        df.select(*group_cols, F.posexplode(cells).alias("row", "bucket"))
        .groupBy(*group_cols, "row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches (e.g. unioned per-shard counters): groupBy-sum."""
    return sketches.groupBy(*group_cols, "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: list[str],
    depth: int = 4,
    width_bits: int = 12,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Point-frequency estimates for a keys DataFrame against the sketch.

    Returns exactly one row per (group, key): every probe key is crossed
    with the sketch's group set, each of its depth cells is LEFT-joined
    (an empty cell counts 0), and the estimate is the min across rows —
    so a key absent from a group estimates 0 rather than silently
    dropping out of the result.
    """
    cells = F.array(
        *[_cms_hash_expr(key_col, r, width_bits, hash_fn) for r in range(depth)]
    )
    probes = keys.select(key_col, F.posexplode(cells).alias("row", "bucket"))
    groups = sketch.select(*group_cols).distinct()
    pg = groups.crossJoin(F.broadcast(probes))
    return (
        pg.join(sketch, [*group_cols, "row", "bucket"], "left")
        .groupBy(*group_cols, key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )
