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


def histogram_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    by: str | None = None,
    lo: int | None = None,
    hi: int | None = None,
    n_bins: int = 32,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample drift between a REFERENCE snapshot and a CURRENT one
    (training/serving skew, the monitoring twin of profile_table): bin
    `value_col` into n_bins equal-width buckets over the declared
    [lo, hi] range (out-of-range values clamp to the edge bins — they
    must count as drift mass, not vanish), then the two-sample
    chi-square statistic

        chi2 = N_r*N_c * sum_bins (a_i*N_c - b_i*N_r)^2
                         / (a_i + b_i)   / (N_r*N_c)^2  (standard form)

    kept EXACT in fixed point: per-bin contribution
    scale * (a_i*N_c - b_i*N_r)^2 div ((a_i + b_i) * N_r * N_c) as
    DECIMAL(38,0) products + `div` (truncation toward zero on both
    engines), summed per group. Empty bins on both sides contribute 0.
    Magnitude bound: scale * (N_r*N_c)^2 < 10^38, i.e. valid to ~10^8
    rows per group side at scale=10^6 — beyond that pre-aggregate per
    shard or lower scale; DECIMAL overflow under ANSI is LOUD, never a
    silent wrap (the BM25 int64-carrier convention).
    PSI needs ln(); chi-square is rational, so the whole monitor is
    bit-replayable — the repo's fixed-point-surrogate convention
    (retrieval/DSIR).

    Plan: each side is ONE map-side-combined groupBy([by], bin) count
    (histogram tables, <= groups x n_bins rows), a full outer join of
    the two tiny tables, totals re-aggregated from them (never a raw
    rescan), one broadcast join back, one sum. Nothing wider than the
    histogram ever shuffles.

    Output: ([by], n_ref, n_cur, chi2_scaled) — threshold stays with
    the caller. Declared [lo, hi] keeps the binning deterministic and
    cross-snapshot-comparable (a data-derived range would shift bins as
    data drifts — exactly when comparability matters most).

    Reference analog: none (north-rule data-quality component;
    profile_stream is the single-corpus streaming monitor).
    """
    if lo is None or hi is None or hi <= lo:
        raise ValueError("histogram_drift: need declared lo < hi")
    if n_bins <= 0:
        raise ValueError("histogram_drift: n_bins must be positive")
    keys = [by] if by else []
    width_num, width_den = hi - lo, n_bins  # bin = (x-lo)*n_bins/(hi-lo)

    def hist(df: DataFrame) -> DataFrame:
        b = F.floor(
            (F.col(value_col).cast("double") - lo) * width_den / width_num
        ).cast("int")
        b = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b))
        # NULL values get a DEDICATED bin (-1): a NULL bin key would
        # never match itself across the full-outer join (null-unsafe
        # equality), so equal NULL mass on both sides scored as
        # complete-separation drift — a monitor column that merely
        # contains NULLs reported false drift (round-5 ADVICE). NULL
        # `by` GROUP keys are still dropped by the equi-joins; map NULL
        # groups to a sentinel upstream if they must be monitored.
        b = F.when(F.col(value_col).isNull(), F.lit(-1)).otherwise(b)
        return (
            df.select(*keys, b.alias("__bin"))
            .groupBy(*keys, "__bin")
            .agg(F.count("*").alias("n"))
        )

    return histogram_chi2(
        hist(ref), hist(cur), keys, bin_col="__bin", scale=scale
    )


def histogram_chi2(
    ref_hist: DataFrame,
    cur_hist: DataFrame,
    keys: list[str],
    bin_col: str = "bin",
    count_col: str = "n",
    scale: int = 1_000_000,
) -> DataFrame:
    """The chi-square tail over PRE-BUILT histogram tables
    ([keys...], bin_col, count_col) — shared by histogram_drift (batch)
    and the streaming monitor (streaming/rollup_stream.py
    drift_hist_stream emits exactly this shape), so a stream's emitted
    windows score against any reference histogram without rescanning
    raw data. Same exact fixed-point contract and magnitude bound as
    histogram_drift."""
    hr = ref_hist.select(
        *keys, F.col(bin_col).alias("__bin"), F.col(count_col).alias("__a")
    )
    hc = cur_hist.select(
        *keys, F.col(bin_col).alias("__bin"), F.col(count_col).alias("__b")
    )
    joined = hr.join(hc, [*keys, "__bin"], "full_outer").select(
        *keys,
        "__bin",
        F.coalesce("__a", F.lit(0)).alias("__a"),
        F.coalesce("__b", F.lit(0)).alias("__b"),
    )
    totals = joined.groupBy(*keys).agg(
        F.sum("__a").alias("__nr"), F.sum("__b").alias("__nc")
    )
    # a group present on only ONE side (a category appearing in serving
    # data, or vanishing from it) is the monitor's most important case —
    # and the raw formula's denominator is 0 there (review finding: ANSI
    # DIVIDE_BY_ZERO crash). The two-sample chi-square's supremum under
    # complete separation is exactly N_r + N_c, so one-sided groups take
    # that limit per-bin (scale * (a+b) sums to scale * (N_r + N_c)):
    # always above any same-size two-sided statistic, always flagged.
    contrib = F.expr(
        f"CASE WHEN __nr = 0 OR __nc = 0"
        f" THEN CAST({int(scale)} AS BIGINT) * (__a + __b)"
        f" ELSE CAST((CAST({int(scale)} AS DECIMAL(38,0))"
        " * (__a * __nc - __b * __nr) * (__a * __nc - __b * __nr))"
        " div (CAST(__a + __b AS DECIMAL(38,0)) * __nr * __nc) AS BIGINT)"
        " END"
    )
    scored = (
        joined.join(F.broadcast(totals), keys)
        if keys
        else joined.crossJoin(F.broadcast(totals))
    )
    return (
        scored.where((F.col("__a") + F.col("__b")) > 0)
        .withColumn("__c", contrib)
        .groupBy(*keys)
        .agg(
            F.max("__nr").cast("long").alias("n_ref"),
            F.max("__nc").cast("long").alias("n_cur"),
            F.sum("__c").cast("long").alias("chi2_scaled"),
        )
    )


def validate_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Declarative data-quality gate (the expectations pattern): each
    rule counts its violations; ALL row-local rules ride ONE aggregate
    over ONE scan (violations are conditional sums, map-side combined),
    and `unique` rules add exact count-distincts to the same aggregate
    (Expand, the profile_table trade). Output: one row per rule —
    (rule, col, kind, n_rows, n_violations, passed) — the long table a
    pipeline gate thresholds before a corpus drop trains.

    Rule kinds:
      {"kind": "not_null",  "col": c}
      {"kind": "between",   "col": c, "lo": x, "hi": y}   # inclusive
      {"kind": "in_set",    "col": c, "values": [...]}
      {"kind": "regex",     "col": c, "pattern": r}       # full match
      {"kind": "unique",    "col": c}
      {"kind": "expr",      "name": n, "sql": "<boolean SQL>"}  # true = ok
    NULL fails between/in_set/regex (an absent value cannot satisfy a
    range/set/shape expectation; use not_null-less semantics via an
    explicit expr rule if NULLs are acceptable).

    Reference analog: none (north-rule data-quality component; the
    one-scan design matches profile_table).
    """
    if not rules:
        raise ValueError("validate_expectations: no rules")
    aggs = [F.count(F.lit(1)).alias("__n")]
    meta = []
    for i, r in enumerate(rules):
        kind = r["kind"]
        c = r.get("col")
        is_explicit = bool(r.get("name"))
        name = r.get("name") or f"{kind}_{c or i}"
        if kind == "not_null":
            bad = F.col(c).isNull()
        elif kind == "between":
            bad = ~F.col(c).between(r["lo"], r["hi"]) | F.col(c).isNull()
        elif kind == "in_set":
            bad = ~F.col(c).isin(list(r["values"])) | F.col(c).isNull()
        elif kind == "regex":
            # FULL match per the documented contract: rlike alone does
            # substring search, which silently passes malformed values
            # like 'xx<match>yy' — anchor internally with \\z, not $
            # (Java $ matches BEFORE a trailing newline, so 'src1\\n'
            # would pass a 'src[0-9]+' gate; \\z is end-of-text in both
            # Java regex and RE2, keeping the oracle bit-aligned)
            bad = (
                ~F.col(c).cast("string").rlike(f"^(?:{r['pattern']})\\z")
                | F.col(c).isNull()
            )
        elif kind == "expr":
            bad = ~F.expr(r["sql"])
        elif kind == "unique":
            # violations = rows beyond one per distinct value
            aggs.append(
                (F.count(c) - F.count_distinct(F.col(c))).alias(f"__v{i}")
            )
            meta.append((i, name, c, kind, is_explicit))
            continue
        else:
            raise ValueError(f"validate_expectations: unknown kind {kind!r}")
        aggs.append(
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias(f"__v{i}")
        )
        meta.append((i, name, c, kind, is_explicit))
    # two rules of the same kind on the same column would collide on the
    # default name, making output rows indistinguishable — suffix every
    # member of a duplicated DEFAULT name with its rule index. Explicit
    # names are the caller's contract: silently renaming them would make
    # a `rule == name` threshold match nothing, so duplicates there
    # raise instead (review finding).
    from collections import Counter

    dup_explicit = [
        n for n, c2 in Counter(
            r.get("name") for r in rules if r.get("name")
        ).items() if c2 > 1
    ]
    if dup_explicit:
        raise ValueError(
            f"validate_expectations: duplicate explicit rule names {dup_explicit}"
        )
    # the flag is PER RULE (a set-membership test would also exempt a
    # DEFAULT name that happens to equal some other rule's explicit name
    # — review finding): any duplicated name's default holders get the
    # index suffix; explicit holders keep their contract name
    counts = Counter(name for _, name, _, _, _ in meta)
    meta = [
        (
            i,
            f"{name}_{i}" if counts[name] > 1 and not is_exp else name,
            c,
            kind,
        )
        for i, name, c, kind, is_exp in meta
    ]
    one = df.agg(*aggs)
    rows = [
        one.select(
            F.lit(name).alias("rule"),
            F.lit(c if c is not None else "").alias("col"),
            F.lit(kind).alias("kind"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col(f"__v{i}").cast("long").alias("n_violations"),
            (F.col(f"__v{i}") == 0).alias("passed"),
        )
        for i, name, c, kind in meta
    ]
    out = rows[0]
    for r2 in rows[1:]:
        out = out.unionByName(r2)
    return out
