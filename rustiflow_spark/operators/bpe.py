"""Distributed BPE (byte-pair-encoding) merge learning over
pre-tokenized sequences — the tokenizer-training step between the
vocabulary builder (textstats.vocab_topk) and sequence packing.

The reference engine has no tokenizer (it extracts flow features);
this belongs to the training-data operator surface (SURVEY.md §2.7).

Algorithm (standard BPE, Sennrich 2016): repeat n_merges times —
count all adjacent token pairs across the corpus, take the most
frequent pair (deterministic tie-break: count desc, a asc, b asc),
assign it a new token id, and rewrite every sequence by greedily
replacing non-overlapping (a, b) occurrences LEFT TO RIGHT.

Scale shape:
- each iteration's pair count is explode -> map-side-combined groupBy —
  the shuffle carries one row per DISTINCT pair per task, and the
  argmax is orderBy+limit(1) (TakeOrderedAndProject), so the driver
  receives exactly ONE row per iteration (the chosen pair);
- the merge rewrite is a per-row Catalyst array projection: for a != b
  the pattern cannot overlap itself, so a vectorized mark-and-filter
  applies (O(len) per row); for a == b a left-fold (aggregate) handles
  run parity exactly (O(len^2) array copies — rare, and bounded by the
  longest run in practice);
- plans deepen by one projection per merge; ``checkpoint_every``
  truncates lineage (localCheckpoint) so n_merges stays bounded by
  state size, not plan size.

Exactness: greedy non-overlapping left-to-right replacement is EXACTLY
what string replace() does on a fixed-width rendering of the sequence
(11-digit zero-padded tokens + ';', so every match is forced onto a
12-char boundary — misalignment would need a ';' off-grid). The DuckDB
oracle replays whole iterations that way, making even this iterative
operator hash-verifiable.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SENTINEL = -(1 << 40)


def merge_pair_expr(tokens_col: str, a: int, b: int, new_id: int) -> str:
    """SQL expression rewriting one sequence for merge (a, b) -> new_id,
    greedy left-to-right non-overlapping (the BPE rewrite rule).

    a != b: the pattern can't overlap itself (a start at i forces
    t[i] = a, but the element after a start is b != a), so merge starts
    are never adjacent and the consumed right element is exactly any b
    preceded by a — mark, emit, drop. Pure O(len). A position can also
    never be consumed twice: being the b of an earlier start would
    require t[i-1] = a AND t[i-1] = b.
    a == b: run parity matters ([a,a,a] -> [new, a]); a left-fold
    carries the pending token through the scan.
    """
    col = f"`{tokens_col}`"
    if a != b:
        # m(i): pair starts at i. Emit new at i; drop i if previous
        # position merged; else keep t[i]. Size guard: sequence(1, 0)
        # counts DOWN (the vocab_topk lesson) — and size<2 has no pair.
        # Everything is produced as BIGINT so chained merges keep one
        # element type regardless of the input's integral width.
        return (
            f"CASE WHEN size({col}) < 2"
            f" THEN transform({col}, x -> CAST(x AS BIGINT)) ELSE "
            f"filter(transform(sequence(1, size({col})), i ->"
            f" CASE WHEN i < size({col})"
            f"       AND element_at({col}, i) = {a}"
            f"       AND element_at({col}, i + 1) = {b}"
            f"      THEN CAST({new_id} AS BIGINT)"
            f"      WHEN i > 1"
            f"       AND element_at({col}, i) = {b}"
            f"       AND element_at({col}, i - 1) = {a}"
            f"      THEN CAST(NULL AS BIGINT)"
            f"      ELSE CAST(element_at({col}, i) AS BIGINT) END),"
            f" x -> x IS NOT NULL) END"
        )
    return (
        f"aggregate({col},"
        f" named_struct('res', CAST(array() AS ARRAY<BIGINT>),"
        f"              'pend', CAST({_SENTINEL} AS BIGINT)),"
        f" (acc, x) -> CASE"
        f"   WHEN acc.pend = {a} AND x = {b}"
        f"    THEN named_struct('res',"
        f"           concat(acc.res, array(CAST({new_id} AS BIGINT))),"
        f"           'pend', CAST({_SENTINEL} AS BIGINT))"
        f"   WHEN acc.pend = {_SENTINEL}"
        f"    THEN named_struct('res', acc.res, 'pend', CAST(x AS BIGINT))"
        f"   ELSE named_struct('res', concat(acc.res, array(acc.pend)),"
        f"                     'pend', CAST(x AS BIGINT)) END,"
        f" acc -> CASE WHEN acc.pend = {_SENTINEL} THEN acc.res"
        f"        ELSE concat(acc.res, array(acc.pend)) END)"
    )


def pair_counts(df: DataFrame, tokens_col: str) -> DataFrame:
    """(a, b, cnt) counts of adjacent pairs across the corpus."""
    col = f"`{tokens_col}`"
    pairs = F.expr(
        f"CASE WHEN size({col}) >= 2 THEN"
        f" transform(sequence(1, size({col}) - 1), i ->"
        f"  named_struct('a', element_at({col}, i),"
        f"               'b', element_at({col}, i + 1)))"
        f" ELSE array() END"
    )
    return (
        df.select(F.explode(pairs).alias("__p"))
        .groupBy(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
        .agg(F.count("*").alias("cnt"))
    )


def bpe_learn(
    df: DataFrame,
    tokens_col: str,
    n_merges: int,
    new_id_base: int,
    min_count: int = 1,
    checkpoint_every: int = 8,
):
    """Learn ``n_merges`` BPE merges. Returns (merges, rewritten_df)
    where merges is a list of dicts {it, a, b, new_id, cnt} (it 0-based;
    new_id = new_id_base + it) and rewritten_df carries the corpus
    after all merges. Stops early when no pair reaches ``min_count``.

    The driver sees one argmax row per iteration; everything else stays
    on the executors. Spread a compressed narrow scan first (the
    explode-blowup rule — see decontam.py).
    """
    if n_merges <= 0:
        raise ValueError("bpe_learn: n_merges must be positive")
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    merges: list[dict] = []
    cur = df
    for it in range(n_merges):
        best = (
            pair_counts(cur, tokens_col)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = int(best[0]["a"]), int(best[0]["b"]), int(best[0]["cnt"])
        new_id = new_id_base + it
        merges.append({"it": it, "a": a, "b": b, "new_id": new_id, "cnt": cnt})
        cur = cur.withColumn(
            tokens_col, F.expr(merge_pair_expr(tokens_col, a, b, new_id))
        )
        if (it + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    return merges, cur


def bpe_apply(
    df: DataFrame,
    tokens_col: str,
    merges: list[dict],
    out_col: str | None = None,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Apply an already-learned merge list to a (new) corpus — the
    inference side of bpe_learn, e.g. tokenizing a fresh drop with
    yesterday's merges. Chained per-row projections, zero shuffle."""
    out_col = out_col or tokens_col
    cur = df.withColumn(out_col, F.col(f"`{tokens_col}`"))
    for i, m in enumerate(merges):
        cur = cur.withColumn(
            out_col,
            F.expr(merge_pair_expr(out_col, m["a"], m["b"], m["new_id"])),
        )
        if (i + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    return cur


def bpe_decode(df: DataFrame, tokens_col: str, merges: list[dict]) -> DataFrame:
    """Invert bpe_apply: expand every merged id back into its pair, in
    REVERSE merge order (a later merge may reference an earlier one's
    new_id, so the last-learned expands first). Each round is one pure
    Catalyst projection — flatten(transform(t, CASE new_id -> [a, b]))
    — so decoding is shuffle-free and stacks into a single codegen
    stage like bpe_apply's forward rounds.

    decode(encode(x)) == x exactly (greedy merges are injective on the
    sequences they produce): the round-trip is hash-asserted corpus-wide
    by the dedup_spans... sibling convention in __spark_entry__
    (q_bpe_roundtrip — the oracle just checksums the ORIGINAL tokens).
    """
    cur = df
    for m in reversed(merges):
        a, b, nid = int(m["a"]), int(m["b"]), int(m["new_id"])
        cur = cur.withColumn(
            tokens_col,
            F.expr(
                f"flatten(transform(`{tokens_col}`,"
                f" t -> CASE WHEN t = {nid} THEN array({a}, {b})"
                f" ELSE array(t) END))"
            ),
        )
    return cur
