"""Deterministic sampling, corpus mixing and split assignment for
training-data pipelines.

At 100 TB, sampling must be a pure per-row predicate — no global count, no
driver round trip, no RNG state — so membership is decided by a
deterministic integer mix of the row's id: the filter pushes down to the
scan, re-runs reproducibly (checkpoint/resume safe), and two engines agree
bit-for-bit. The mix is a two-round Lehmer LCG mod 2^31-1 (MINSTD
constants): every operation is plain BIGINT arithmetic (no 64-bit
overflow under ANSI mode, exactly replayable in a SQL oracle). Swap
``_MIX_SQL`` for xxhash64 on engines where cross-engine replay is not
needed.

Operators:
  deterministic_sample  keep a fixed fraction of rows by id-hash
  stratified_mix        per-stratum keep rates (corpus mixing: web 0.6,
                        code 0.9, ... of each source's rows)
  with_split            train/val/test assignment from the same mix —
                        disjoint, exhaustive, stable under resharding
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_M31 = 2_147_483_647  # 2^31 - 1 (prime)
_A = 48_271  # MINSTD multiplier


def _mix_sql(id_col: str, seed: int) -> str:
    """Two-round Lehmer mix of (id, seed) -> [0, 2^31-1). Products stay
    below 2^62 (no BIGINT overflow; ANSI-safe on Spark, exact in DuckDB)."""
    r1 = f"((`{id_col}` % {_M31}) * {_A} + {seed % _M31}) % {_M31}"
    return f"(({r1}) * {_A} + 11) % {_M31}"


def mix_sql(id_col: str, seed: int) -> str:
    """Public SQL-string form of the mix (for oracle construction)."""
    return _mix_sql(id_col, seed)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 17
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by the id mix.

    A pure filter: pushes to the scan, needs no shuffle, is reproducible
    across runs/partitionings/engines (unlike df.sample, whose membership
    depends on partition iteration order)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    cut = int(fraction * _M31)
    return df.where(F.expr(f"{_mix_sql(id_col, seed)} < {cut}"))


def stratified_mix(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    seed: int = 17,
    default_rate: float = 0.0,
) -> DataFrame:
    """Corpus mixing: keep each stratum's rows at its own rate.

    ``rates`` maps stratum value -> keep fraction (e.g. {'web': 0.3,
    'code': 1.0}); strata absent from the map keep ``default_rate``.
    One CASE + one filter — no shuffle, scan-pushable."""
    branches = " ".join(
        f"when '{k}' then {int(v * _M31)}" for k, v in sorted(rates.items())
    )
    cut = f"case `{strata_col}` {branches} else {int(default_rate * _M31)} end"
    return df.where(F.expr(f"{_mix_sql(id_col, seed)} < ({cut})"))


def with_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 29,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one split (train/val/test by default)
    from the id mix — disjoint, exhaustive, stable under resharding and
    appends (a row's split never changes when other rows arrive).

    weights need not sum to 1; they are normalized."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    branches = []
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        branches.append(f"when __r < {int(acc * _M31)} then '{name}'")
    last = items[-1][0]
    expr = (
        f"case {' '.join(branches)} else '{last}' end"
        if branches
        else f"'{last}'"
    )
    return df.withColumn("__r", F.expr(_mix_sql(id_col, seed))).withColumn(
        split_col, F.expr(expr)
    ).drop("__r")
