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
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


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
    return (
        df.select(*group_cols, _hash_expr(key_col, hash_fn).alias("__hll_h"))
        .select(*group_cols, reg, rho.alias("__rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("__rho").alias("mj"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables (e.g. unioned per-day sketches): groupBy-max."""
    return registers.groupBy(*group_cols, "reg").agg(F.max("mj").alias("mj"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 12
) -> DataFrame:
    """Estimate per group from a register table.

    The harmonic sum S = sum(2^-mj) over all m registers is carried as an
    exact integer numerator over 2^49: empty registers contribute 2^49
    each, a register with value mj contributes 2^(49-mj) — integer adds,
    so the result is independent of aggregation order (mj <= 49 for
    p >= 11; the numerator stays < 2^62). Small-range correction
    (linear counting) applies below 2.5m when empty registers remain.
    """
    m = 1 << p
    w_bits = _HASH_BITS - p
    if w_bits + 1 > 49:
        raise ValueError("hll_estimate: p too small for the 2^49 numerator")
    alpha = _alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), 49 - CAST(mj AS INT))")
        ).alias("__s_nz"),
        F.count("*").alias("__nz"),
    )
    s_num = F.col("__s_nz") + (F.lit(m) - F.col("__nz")) * F.lit(1 << 49)
    raw = F.lit(alpha * m * m * float(1 << 49)) / s_num.cast("double")
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
