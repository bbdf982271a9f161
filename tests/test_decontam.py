"""Benchmark decontamination (operators/decontam.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _corpus(spark):
    rows = [
        # doc 1: fully contained in the benchmark (exact eval leak)
        (1, "the quick brown fox jumps over the lazy dog"),
        # doc 2: shares the 'quick brown fox' run but diverges after
        (2, "a quick brown fox runs far away from here today"),
        # doc 3: disjoint vocabulary
        (3, "spark shuffles partitions across executors with arrow batches"),
        # doc 4: shorter than n words -> zero grams, always clean
        (4, "too short"),
        # doc 5: duplicate of the benchmark doc with one word changed
        (5, "the quick brown fox leaps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )


def test_ngram_overlap_counts_and_flags(spark):
    from rustiflow_spark.operators.decontam import ngram_overlap

    out = ngram_overlap(
        _corpus(spark), _bench(spark), n=3, threshold=0.5, use_hash=False
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 5
    # doc 1: 7 trigrams, all 7 in the benchmark
    assert (rows[1].n_grams, rows[1].matched_grams) == (7, 7)
    assert rows[1].contaminated
    # doc 2: 'quick brown fox' is its only benchmark trigram
    assert (rows[2].n_grams, rows[2].matched_grams) == (8, 1)
    assert not rows[2].contaminated
    # doc 3: nothing shared
    assert rows[3].matched_grams == 0 and not rows[3].contaminated
    # doc 4: 2 words < n -> no grams, clean by definition
    assert (rows[4].n_grams, rows[4].matched_grams) == (0, 0)
    assert rows[4].overlap_frac == 0.0 and not rows[4].contaminated
    # doc 5: one word changed kills the 3 trigrams covering it
    assert (rows[5].n_grams, rows[5].matched_grams) == (7, 4)
    assert rows[5].overlap_frac == 4 / 7
    assert rows[5].contaminated  # 4/7 >= 0.5


def test_hash_mode_matches_raw_strings(spark):
    """Production xxhash64-keyed join must produce the identical frame."""
    from rustiflow_spark.operators.decontam import ngram_overlap

    kw = dict(n=3, threshold=0.5)
    raw = ngram_overlap(
        _corpus(spark), _bench(spark), use_hash=False, **kw
    ).orderBy("doc_id")
    hashed = ngram_overlap(
        _corpus(spark), _bench(spark), use_hash=True, **kw
    ).orderBy("doc_id")
    assert raw.collect() == hashed.collect()


def test_decontaminate_anti_join(spark):
    from rustiflow_spark.operators.decontam import decontaminate

    kept = decontaminate(
        _corpus(spark), _bench(spark), n=3, threshold=0.5, use_hash=False
    )
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3, 4]
    # survivors keep their full original schema
    assert kept.columns == ["doc_id", "text"]


def test_plan_broadcasts_benchmark_and_stays_jvm_side(spark):
    """The benchmark side must broadcast (the corpus never shuffles before
    the per-doc aggregate) and no Python stage may appear in the plan."""
    from rustiflow_spark.operators.decontam import ngram_overlap

    out = ngram_overlap(_corpus(spark), _bench(spark), n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
