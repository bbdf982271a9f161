"""Benchmark decontamination: word n-gram overlap against an eval set.

Standard training-corpus hygiene (GPT-3 appendix C / PaLM-style): a corpus
document is contaminated if it shares enough word n-grams with any
benchmark/eval document. Spark-first shape:

  benchmark side  -> explode its n-grams, distinct, BROADCAST (eval sets
                     are tiny next to the corpus — a few MB of grams vs TB
                     of docs, so the join ships the benchmark to every
                     executor and the corpus never shuffles)
  corpus side     -> explode n-grams with their position, broadcast-join,
                     per-doc count of matched positions

Everything is built-in Catalyst (split / transform / sequence / slice /
concat_ws / explode); no Python in the hot path. With `use_hash=True`
(production default) grams are joined as xxhash64 values — 8 bytes instead
of ~80-char strings, which shrinks both the broadcast and the probe-side
exploded column. `use_hash=False` joins raw strings (collision-free; the
mode the DuckDB oracle replays exactly).

At 100 TB: the corpus side is a scan + generate + broadcast-hash-join +
partial agg — no shuffle until the tiny per-doc aggregate. If the
benchmark outgrows broadcast size (it shouldn't), the same code downgrades
to a shuffle join automatically when the broadcast hint is dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _gram_array(text_col: str, n: int) -> Column:
    """Array of word n-grams of the text (empty when fewer than n words)."""
    words = F.split(F.col(text_col), " ")
    k = F.size(words) - (n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    threshold: float = 0.5,
    use_hash: bool = True,
) -> DataFrame:
    """Per-corpus-document benchmark-overlap stats.

    Returns one row per corpus document that has at least one n-gram:
    (id_col, n_grams, matched_grams, overlap_frac, contaminated) where
    matched_grams counts gram POSITIONS whose n-gram occurs anywhere in
    the benchmark, overlap_frac = matched/total, and contaminated flags
    overlap_frac >= threshold. Documents shorter than n words have no
    grams and are reported with n_grams = 0, matched = 0, clean.
    """
    gram = _gram_array(text_col, n)
    # the corpus-side explode multiplies every row ~word_count times —
    # widen a narrow compressed scan before it (see parallelism.py;
    # observed: sf10 decontam 220 s on 2 tasks -> 38.7 s spread)
    from rustiflow_spark.parallelism import ensure_min_parallelism

    corpus = ensure_min_parallelism(corpus)
    key = (lambda c: F.xxhash64(c)) if use_hash else (lambda c: c)
    bench = (
        benchmark.select(F.explode(_gram_array(text_col, n)).alias("__g"))
        .select(key(F.col("__g")).alias("__k"))
        .distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col), F.explode(gram).alias("__g")
    ).select(id_col, key(F.col("__g")).alias("__k"))
    matched = (
        doc_grams.join(F.broadcast(bench), "__k")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("matched_grams"))
    )
    totals = corpus.select(F.col(id_col), F.size(gram).alias("n_grams"))
    out = totals.join(matched, id_col, "left").select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        F.coalesce(F.col("matched_grams"), F.lit(0)).cast("long").alias(
            "matched_grams"
        ),
    )
    frac = F.when(
        F.col("n_grams") > 0, F.col("matched_grams") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return out.withColumn("overlap_frac", frac).withColumn(
        "contaminated", F.col("overlap_frac") >= threshold
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    threshold: float = 0.5,
    use_hash: bool = True,
) -> DataFrame:
    """Corpus rows whose benchmark n-gram overlap stays below threshold
    (an anti-semi-join of corpus against the contaminated id set)."""
    bad = (
        ngram_overlap(
            corpus, benchmark, text_col, id_col, n, threshold, use_hash
        )
        .where(F.col("contaminated"))
        .select(id_col)
    )
    return corpus.join(bad, id_col, "left_anti")
