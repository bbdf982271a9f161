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


def shuffle_export(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 43,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle for training export: every row gets a
    (shard, pos) address that is a pure function of (id, seed) and the
    corpus content — reproducible across runs, partitionings, and
    engines, unlike orderBy(rand()).

    shard = id-mix mod n_shards (uniform), pos = rank within the shard by
    a second independent mix (id tiebreak). Reading shards in pos order
    replays the exact same training order every time; re-exporting after
    an append only perturbs the shards the new rows land in.

    Plan: one Exchange on shard + per-shard sort — n_shards output files,
    each internally shuffled, written in parallel. Choose n_shards ≈
    cluster cores at 100 TB so each sort fits an executor.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    from pyspark.sql import Window

    shard = F.expr(f"{_mix_sql(id_col, seed)} % {n_shards}")
    order = F.expr(_mix_sql(id_col, seed + 1))
    w = Window.partitionBy(shard_col).orderBy(F.col("__ord"), F.col(id_col))
    return (
        df.withColumn(shard_col, shard)
        .withColumn("__ord", order)
        .withColumn(pos_col, F.row_number().over(w))
        .drop("__ord")
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    seed: int = 59,
    rate_col: str | None = None,
) -> DataFrame:
    """Temperature-based corpus mixing (multinomial alpha-sampling):
    source s is kept with rate r_s ∝ count_s^alpha / count_s, scaled so
    the expected kept volume is target_fraction of the corpus, capped at
    1. alpha < 1 upweights small sources (alpha=0 → uniform over
    sources, alpha=1 → natural proportions) — the standard
    low-resource-language rebalancing rule.

    Counts come from one hash aggregate (O(sources) rows) broadcast back;
    membership is the same scan-pushable Lehmer-mix predicate as
    deterministic_sample. With alpha=0.5 the rate math is sqrt-only
    (IEEE-exact, bit-replayable cross-engine).
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    if alpha == 0.5:
        powed = F.sqrt(F.col("__n").cast("double"))
    else:
        powed = F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
    counts = counts.withColumn("__p", powed)
    tot = counts.agg(
        F.sum("__p").alias("__sum_p"), F.sum("__n").alias("__total")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.col("__p")
            / F.col("__sum_p")
            * F.lit(float(target_fraction))
            * F.col("__total").cast("double")
            / F.col("__n").cast("double"),
        ).alias("__rate"),
    )
    out = df.join(F.broadcast(rates), on=source_col, how="left")
    cut = F.floor(F.col("__rate") * F.lit(float(_M31))).cast("long")
    out = out.where(F.expr(_mix_sql(id_col, seed)) < cut)
    if rate_col is not None:
        return out.withColumnRenamed("__rate", rate_col)
    return out.drop("__rate")


def quota_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    quota: int,
    seed: int = 31,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep AT MOST ``quota`` rows per stratum — the exact-count cousin
    of stratified_mix for balancing over-represented sources (a rate
    can only cap in expectation; a quota caps exactly).

    Membership is deterministic and append-stable in the keep direction
    only: rows rank within their stratum by (id-mix, id), so which rows
    survive is a pure function of (content, seed) — independent of
    partitioning and engine — but appends can displace previously-kept
    rows (an exact cap cannot be append-invariant; use stratified_mix
    when that matters more than exactness).

    Plan: one Exchange on the stratum + an in-partition rank window.
    For a pathological hot stratum the same distributed prefix-scan
    trick as quantile_bin_split applies (chunk ranks + chunk-count
    prefix); at quota << stratum size a cheaper route is an approximate
    mix-threshold pre-filter (keep mix < c*quota/size) before the exact
    rank — both compose with this function's output contract.

    Set ``rank_col`` to also emit the within-stratum rank (1-based).
    """
    if quota <= 0:
        raise ValueError("quota must be positive")
    from pyspark.sql import Window

    w = Window.partitionBy(F.col(f"`{strata_col}`")).orderBy(
        F.col("__qmix"), F.col(f"`{id_col}`")
    )
    out = (
        df.withColumn("__qmix", F.expr(_mix_sql(id_col, seed)))
        .withColumn("__qrnk", F.row_number().over(w))
        .where(F.col("__qrnk") <= quota)
    )
    if rank_col is not None:
        out = out.withColumn(rank_col, F.col("__qrnk"))
    return out.drop("__qmix", "__qrnk")


def temporal_split(
    df: DataFrame,
    ts_col: str,
    cutoff,
    embargo=None,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe time split: train strictly before the embargo
    window, test strictly after the cutoff, and rows inside
    (cutoff - embargo, cutoff] marked 'embargo' — the purge gap that
    keeps features computed from trailing windows (rolling stats, lags,
    as-of joins) from straddling the boundary. With no embargo the
    assignment is the plain train/test cut at the cutoff.

    Pure projection (no shuffle, scan-pushable filters downstream);
    ``cutoff``/``embargo`` accept whatever the ts column compares
    against (timestamps, integer microseconds, ...) — embargo is the
    lower bound of the gap, i.e. train keeps ts <= cutoff - embargo
    expressed as ts <= embargo_start when ``embargo`` is given as that
    absolute bound.
    """
    ts = F.col(f"`{ts_col}`")
    cut = F.lit(cutoff)
    if embargo is None:
        expr = F.when(ts <= cut, F.lit("train")).otherwise(F.lit("test"))
    else:
        emb = F.lit(embargo)
        expr = (
            F.when(ts <= emb, F.lit("train"))
            .when(ts <= cut, F.lit("embargo"))
            .otherwise(F.lit("test"))
        )
    return df.withColumn(split_col, expr)


def negative_samples(
    pairs: DataFrame,
    items: DataFrame,
    query_col: str,
    pos_col: str,
    item_col: str,
    k: int,
    seed: int = 7,
    buffer: int = 8,
    hash_fn: str = "xxhash64",
    dense_ids: bool = False,
    n_items: int | None = None,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every QUERY, draw k pseudo-random corpus items that are not any of
    the query's positives — the (query, negatives) side of the
    (query, positive, negatives) triples a retrieval/embedding trainer
    consumes (join the negatives back to the pairs table on query_col
    for full triples). Draws are pure hash arithmetic over
    (query, slot, seed): partition- and engine-invariant (no RNG
    state — the .sample() lesson), so the SAME triples come out of any
    cluster size and a SQL oracle replays them.

    Exclusion is per-QUERY against ALL the query's positives (pairs may
    hold several rows per query): positives are folded into one set per
    query before the draw, so a multi-positive query can never see one
    of its positives surface as a negative via another pair row (review
    finding). One negative list comes out per query, not per pair.

    Plan: items get a dense rank ONCE (row_number over the id
    projection — a narrow global sort of ids only); each query explodes
    into k + buffer slots; slot -> hash mod n_items -> rank equi-join
    against the item table; positives and duplicate draws drop, the
    first k surviving slots (slot order) are the negatives. With
    n_items >> k + |positives|, collisions are rare and the buffer
    absorbs them; if a query still ends under k the rows that exist are
    returned (count with the caller — never silently resampled).

    dense_ids=True with n_items=N is the 10^9-item path: ids are 0..N-1
    so rank == id — no rank table, no join, no item scan at all (without
    n_items the distinct-count still scans items once).

    Output: (query_col, neg_rank 1..k, item_col).

    Reference analog: none (north-rule training-export component;
    composes with retrieval/hybrid relevance tables).
    """
    if k <= 0 or buffer < 0:
        raise ValueError("negative_samples: k >= 1, buffer >= 0")
    from pyspark.sql import Window

    if n_items is not None:
        if not dense_ids:
            # an n_items that disagrees with the rank table's true size
            # would silently draw ranks that match nothing (fewer than k
            # negatives) or make high ranks undrawable — the shortcut is
            # only sound when rank == id by construction
            raise ValueError(
                "negative_samples: n_items requires dense_ids=True"
            )
        n = int(n_items)
        it = None
    else:
        it = items.select(F.col(item_col).alias("__item")).distinct()
        n = it.count()
    if n < 2:
        raise ValueError("negative_samples: need at least 2 distinct items")
    if dense_ids:
        # THE scale path: ids are 0..n-1, so rank == id and the draw is
        # pure per-row arithmetic — no rank table, no join. (A 10^9-item
        # rank table could neither broadcast nor sort in one task.)
        ranked = None
    else:
        # generic ids: dense-rank the ids-only projection once (narrow
        # global sort — the q_ann_ivf seed-selection trade; map ids to
        # dense yourself and use dense_ids=True at real scale)
        if it is None:
            it = items.select(F.col(item_col).alias("__item")).distinct()
        ranked = it.withColumn(
            "__r", F.row_number().over(Window.orderBy("__item")) - 1
        )
    # fold ALL of a query's positives into one set before the draw
    per_q = (
        pairs.select(
            F.col(query_col).alias("__q"), F.col(pos_col).alias("__pos")
        )
        .groupBy("__q")
        .agg(F.collect_set("__pos").alias("__poss"))
    )
    slots = per_q.select(
        "__q",
        "__poss",
        F.explode(F.expr(f"sequence(0, {k + buffer - 1})")).alias("__slot"),
    )
    if hash_fn == "xxhash64":
        h = F.xxhash64("__q", "__slot", F.lit(int(seed)))
    elif hash_fn == "md5":
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", "__q", "__slot", F.lit(int(seed)))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    else:
        raise ValueError(f"negative_samples: unknown hash_fn {hash_fn!r}")
    cand = slots.withColumn("__r", F.pmod(h, F.lit(n)))
    if ranked is None:
        cand = cand.withColumn("__item", F.col("__r"))
    else:
        cand = cand.join(ranked, "__r")
    cand = cand.where(~F.array_contains("__poss", F.col("__item")))
    # first occurrence per (query, item) in slot order, then first k
    w_item = Window.partitionBy("__q", "__item").orderBy("__slot")
    w_q = Window.partitionBy("__q").orderBy("__slot")
    return (
        cand.withColumn("__dup", F.row_number().over(w_item))
        .where(F.col("__dup") == 1)
        .withColumn("neg_rank", F.row_number().over(w_q))
        .where(F.col("neg_rank") <= k)
        .select(
            F.col("__q").alias(query_col),
            F.col("neg_rank").cast("long").alias("neg_rank"),
            F.col("__item").alias(item_col),
        )
    )
