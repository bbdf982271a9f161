"""Text-analysis operators for training-data curation: language ID
(stopword-hit heuristic), quality scoring, token counting, and rolling-hash
document fingerprinting. Everything except the fingerprint is pure Catalyst
column expressions; the fingerprint is an Arrow-vectorized NumPy pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# Minimal function-word lists for the heuristic language scorer. These are
# common closed-class words; ties resolve alphabetically ('unknown' when no
# hits at all).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "para", "en", "que", "por"],
    "it": ["il", "la", "che", "e", "per", "una", "con", "del", "non", "sono"],
}


def token_count_features(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy count
    (word-initial chunks of <=4 chars via regexp)."""
    ws_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    subword = F.size(
        F.expr(rf"regexp_extract_all({text_col}, '[A-Za-z0-9]{{1,4}}|[^A-Za-z0-9\\s]', 0)")
    )
    return df.withColumn("ws_token_count", ws_tokens).withColumn(
        "subword_count_proxy", subword
    )


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic quality signals: length, word stats, punctuation / digit /
    uppercase ratios, mean word length, repetition proxy."""
    txt = F.col(text_col)
    length = F.length(txt)
    words = F.split(F.trim(txt), r"\s+")
    n_words = F.size(words)
    n_punct = length - F.length(F.regexp_replace(txt, r"[\.,;:!\?\"'`]", ""))
    n_digit = length - F.length(F.regexp_replace(txt, r"[0-9]", ""))
    n_upper = length - F.length(F.regexp_replace(txt, r"[A-Z]", ""))
    distinct_words = F.size(F.array_distinct(words))
    return (
        df.withColumn("q_chars", length)
        .withColumn("q_words", n_words)
        .withColumn(
            "q_mean_word_len",
            F.when(n_words > 0, (length - n_words + 1) / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn("q_punct_ratio", F.when(length > 0, n_punct / length).otherwise(0.0))
        .withColumn("q_digit_ratio", F.when(length > 0, n_digit / length).otherwise(0.0))
        .withColumn("q_upper_ratio", F.when(length > 0, n_upper / length).otherwise(0.0))
        .withColumn(
            "q_distinct_word_ratio",
            F.when(n_words > 0, distinct_words / n_words).otherwise(0.0),
        )
    )


def language_id(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """Stopword-hit language heuristic — pure Catalyst: per language, count
    marker-word hits in the lowercased token set; argmax wins."""
    words = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    scores = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        marker_arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.array_intersect(words, marker_arr)).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # argmax by (hits, reverse-alphabetical tiebreak via array_max on struct)
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col,
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown")),
    ).withColumn(f"{out_col}_hits", best["hits"])


def document_fingerprint(
    df: DataFrame, id_col: str, text_col: str, window: int = 16
) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint (Arrow/NumPy): min rolling
    polynomial hash per window, then a 64-bit mix of the selected hashes.
    Deterministic; robust to small local edits away from the minima."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("fingerprint", T.LongType()),
            T.StructField("n_selected", T.IntegerType()),
        ]
    )
    K = 8  # rolling hash width

    def batch(iterator):
        powers = np.uint64(257) ** np.arange(K, dtype=np.uint64)
        for pdf in iterator:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            fps = np.empty(len(pdf), dtype=np.uint64)
            nsel = np.empty(len(pdf), dtype=np.int32)
            for i, text in enumerate(pdf[text_col].astype(str)):
                arr = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
                if arr.size < K:
                    arr = np.pad(arr, (0, K - arr.size), constant_values=32)
                wins = np.lib.stride_tricks.sliding_window_view(arr, K)
                h = wins.astype(np.uint64) @ powers
                if h.size >= window:
                    mins = np.min(
                        np.lib.stride_tricks.sliding_window_view(h, window), axis=1
                    )
                    sel = np.unique(mins)
                else:
                    sel = np.unique(h)
                mixed = sel * np.uint64(0x9E3779B97F4A7C15)
                fps[i] = np.bitwise_xor.reduce(mixed) if mixed.size else np.uint64(0)
                nsel[i] = sel.size
            yield pd.DataFrame(
                {id_col: ids, "fingerprint": fps.view(np.int64), "n_selected": nsel}
            )

    from rustiflow_spark.parallelism import ensure_min_parallelism

    return ensure_min_parallelism(df.select(id_col, text_col)).mapInPandas(
        batch, schema=schema
    )


def vocab_topk(
    df: DataFrame, text_col: str, k: int = 50, ngram: int = 1
) -> DataFrame:
    """Corpus-wide top-k token (or word-n-gram) frequencies.

    explode + count with map-side partial aggregation: the shuffle carries
    one row per distinct term per task, not per occurrence — the plan
    that survives a 100-TB corpus. Ranking ties break lexicographically
    so the output is deterministic. ngram > 1 joins adjacent whitespace
    tokens with a single space.
    """
    from pyspark.sql import Window

    if ngram == 1:
        term = F.explode(F.split(F.col(text_col), " ")).alias("term")
        exploded = df.select(term).where(F.col("term") != "")
    else:
        # bind the split once (re-splitting inside the transform lambda
        # would be O(tokens^2) per document), and guard sub-ngram-length
        # documents: sequence(1, 0) would count DOWN and slice(arr, 0, n)
        # is a runtime error
        grams = F.expr(
            f"CASE WHEN size(__toks) >= {ngram} THEN"
            f" transform(sequence(1, size(__toks) - {ngram - 1}),"
            f" i -> array_join(slice(__toks, i, {ngram}), ' '))"
            f" ELSE array() END"
        )
        exploded = (
            df.select(F.split(F.col(text_col), " ").alias("__toks"))
            .select(F.explode(grams).alias("term"))
            .where(F.col("term") != "")
        )
    counts = exploded.groupBy("term").agg(F.count("*").alias("cnt"))
    # orderBy + limit compiles to TakeOrderedAndProject: per-partition
    # top-k then a k-row merge on the driver side of the exchange — never
    # a single-task sort of the whole vocabulary. The rank window then
    # runs over just k rows.
    top = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "rnk", "term", "cnt"
    )


# PII patterns chosen from the regex subset Java (Spark) and RE2 (DuckDB,
# Go, Rust) agree on: no lookaround, no backreferences — so the redaction
# is replayable by any engine in the fleet.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{3,4}", "<PHONE>"),
    ("longnum", r"\b[0-9]{9,}\b", "<NUM>"),
]


def redact_pii(
    df: DataFrame, text_col: str, out_col: str = "text_redacted"
) -> DataFrame:
    """Redact common PII shapes (emails, IPv4s, phone-like numbers, long
    digit runs) — the corpus-hygiene pass every training-data pipeline
    runs before anything ships.

    Pure Catalyst regexp_replace chain (one pass per pattern, whole-stage
    codegen, no Python) plus per-type match counts BEFORE redaction, so
    the pipeline can report how much was scrubbed per source. Patterns
    apply in PII_PATTERNS order — email first, so its digits are gone
    before the number patterns look.
    """
    out = df
    redacted = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"pii_{name}_count",
            # pattern as a Column literal — dodges SQL string-literal
            # backslash escaping entirely
            F.coalesce(
                F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))),
                F.lit(0),
            ).cast("long"),
        )
        redacted = F.regexp_replace(redacted, pat, repl)
    return out.withColumn(out_col, redacted)


def tokenize_with_vocab(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    term_col: str = "term",
    tid_col: str = "tid",
    unk_id: int = 0,
    out_col: str = "token_ids",
) -> DataFrame:
    """Map whitespace tokens to vocabulary ids — the step between the
    vocab builder (vocab_topk) and sequence packing (operators/packing).

    Scale shape: posexplode → BROADCAST left join against the vocab (a
    top-k vocab is always broadcast-sized) → groupBy the doc key with an
    order-restoring array_sort over (position, id) structs. Everything
    JVM-side; out-of-vocabulary tokens map to ``unk_id``. Empty tokens
    (doubled spaces) are dropped, matching vocab_topk's counting.
    """
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("__pos", "__term"),
    ).where(F.col("__term") != "")
    v = F.broadcast(
        vocab.select(
            F.col(term_col).alias("__term"),
            F.col(tid_col).cast("long").alias("__tid"),
        )
    )
    return (
        toks.join(v, "__term", "left")
        .groupBy(F.col("__doc").alias(id_col))
        .agg(
            F.expr(
                f"transform(array_sort(collect_list(struct(__pos, "
                f"coalesce(__tid, {unk_id}L) as t))), s -> s.t)"
            ).alias(out_col)
        )
    )


def _repetition_stats_arrow(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """repetition_stats mode='arrow' body: per-document Counter passes
    inside one mapInPandas (zero shuffle beyond the scan spread). Word
    split replays Spark's `filter(split(trim(text), ' +'), w != '')`
    exactly: SQL trim strips ONLY spaces, the regex splits on literal
    space runs, empties drop. Gram identity by word TUPLE equals the
    Catalyst fold's space-joined-string identity because split output
    cannot contain a space. All counts are exact ints; each fraction is
    one IEEE double division of int-exact operands — bit-identical to
    the JVM's."""
    from rustiflow_spark.parallelism import ensure_min_parallelism

    import re as remod

    pat = remod.compile(" +")

    def per_batch(it):
        from collections import Counter

        import pandas as pd

        for pdf in it:
            ids = pdf[id_col]
            n_words, dwf, twf, tbf, dtf = [], [], [], [], []
            for s in pdf[text_col]:
                ws = (
                    [w for w in pat.split(s.strip(" ")) if w]
                    if s is not None
                    else []
                )
                n = len(ws)
                n_words.append(n)
                if n > 0:
                    cu = Counter(ws)
                    dwf.append(len(cu) / n)
                    twf.append(max(cu.values()) / n)
                else:
                    dwf.append(0.0)
                    twf.append(0.0)
                if n >= 2:
                    cb = Counter(zip(ws, ws[1:]))
                    tbf.append(max(cb.values()) / (n - 1))
                else:
                    tbf.append(0.0)
                if n >= 3:
                    ct = Counter(zip(ws, ws[1:], ws[2:]))
                    dtf.append(
                        sum(c for c in ct.values() if c >= 2) / (n - 2)
                    )
                else:
                    dtf.append(0.0)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "distinct_word_frac": pd.Series(dwf, dtype="float64"),
                    "top_word_frac": pd.Series(twf, dtype="float64"),
                    "top_bigram_frac": pd.Series(tbf, dtype="float64"),
                    "dup_trigram_frac": pd.Series(dtf, dtype="float64"),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return ensure_min_parallelism(
        df.select(id_col, text_col)
    ).mapInPandas(
        per_batch,
        schema=f"`{id_col}` {id_type}, n_words long,"
        " distinct_word_frac double, top_word_frac double,"
        " top_bigram_frac double, dup_trigram_frac double",
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, mode: str = "arrow"
) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021, appendix
    A1.1 "repetitious text" rules, word-gram subset): per document —

      n_words            whitespace word count (empty words dropped)
      distinct_word_frac distinct words / words
      top_word_frac      occurrences of the most frequent word / words
      top_bigram_frac    occurrences of the most frequent word 2-gram /
                         total 2-gram positions
      dup_trigram_frac   3-gram positions whose gram occurs >= 2 times in
                         the doc / total 3-gram positions

    The Gopher rules threshold these (e.g. drop if top-2-gram fraction
    > 0.20, dup-3-gram char fraction > 0.18); thresholds stay with the
    caller so the stats compose with quality_features' filter chain.

    Plan: every statistic here is a function of ONE document's word
    sequence, so the whole operator is a zero-shuffle projection. The
    round-5 pyramid shape shuffled one (doc, gram) pair per gram
    position — at 100 TB that is the corpus's entire token stream
    crossing the network three times for values that never leave their
    row (optimization guide §2.3 "shuffle fewer bytes" taken to its
    fixed point, §2.4 "remove shuffles outright").

    mode='arrow' (default, the scale path; guide §4.2): one mapInPandas
    pass counts each document's gram multiplicities with C-backed
    Counters and emits the five statistics directly. Counts are exact
    integers and the fractions divide the same int-exact doubles, so
    values are bit-identical to 'catalyst' (pytest-asserted; word split
    replays SQL trim + ' +' exactly, the dsir convention).
    mode='catalyst' keeps everything in JVM expressions: per row, each
    gram family is sorted (array_sort) and its multiplicity profile
    read off the runs with a single aggregate() fold (max run =
    top-gram count, run starts = distinct count, runs >= 2 = duplicated
    positions); no explode, no groupBy, no join. Same-day sf10 A/B:
    pyramid 51.9 s -> catalyst fold 22.0 s -> arrow (see BENCH.md),
    identical checksums.

    Reference analog: none (north-rule text-quality component;
    quality_features above holds the non-repetition Gopher signals).
    """
    if mode not in ("arrow", "catalyst"):
        raise ValueError(f"repetition_stats: unknown mode {mode!r}")
    sc = df.sparkSession.sparkContext
    if mode == "arrow":
        return _repetition_stats_arrow(df, id_col, text_col)
    base = df.select(
        F.col(id_col).alias("__id"),
        # NULL text -> zero words (matches the pyramid's left-join zero
        # fill; size(NULL) would be the non-ANSI -1)
        F.coalesce(
            F.filter(
                F.split(F.trim(F.col(text_col)), r" +"), lambda w: w != ""
            ),
            F.expr("CAST(array() AS array<string>)"),
        ).alias("__ws"),
    )
    # per-row sort/fold work dominates a compressed narrow scan: spread
    # (CLAUDE.md convention; no-op at real scale)
    if base.rdd.getNumPartitions() < sc.defaultParallelism:
        base = base.repartition(sc.defaultParallelism)

    def grams(n: int) -> str:
        # same construction as the round-5 pyramids: space-joined slices
        if n == 1:
            return "__ws"
        return (
            f"IF(size(__ws) >= {n}, transform(sequence(1, size(__ws) - {n - 1}),"
            f" i -> array_join(slice(__ws, i, {n}), ' ')),"
            " CAST(array() AS array<string>))"
        )

    def top_run(arr: str) -> str:
        """max multiplicity over the sorted gram array (= max per-gram
        count); 0 for empty arrays."""
        return (
            f"aggregate(array_sort({arr}),"
            " named_struct('p', CAST(NULL AS STRING), 'r', 0L, 'b', 0L),"
            " (s, x) -> IF(s.p IS NOT NULL AND x = s.p,"
            "   named_struct('p', x, 'r', s.r + 1L, 'b', GREATEST(s.b, s.r + 1L)),"
            "   named_struct('p', x, 'r', 1L, 'b', GREATEST(s.b, 1L))),"
            " s -> s.b)"
        )

    # distinct words + top-word count in one fold ('d' counts run starts)
    uni_fold = (
        "aggregate(array_sort(__ws),"
        " named_struct('p', CAST(NULL AS STRING), 'r', 0L, 'b', 0L, 'd', 0L),"
        " (s, x) -> IF(s.p IS NOT NULL AND x = s.p,"
        "   named_struct('p', x, 'r', s.r + 1L, 'b', GREATEST(s.b, s.r + 1L), 'd', s.d),"
        "   named_struct('p', x, 'r', 1L, 'b', GREATEST(s.b, 1L), 'd', s.d + 1L)),"
        " s -> named_struct('b', s.b, 'd', s.d))"
    )
    # duplicated 3-gram positions: sum of run lengths >= 2 (flush the
    # open run in the finish lambda)
    dup_tri_fold = (
        f"aggregate(array_sort({grams(3)}),"
        " named_struct('p', CAST(NULL AS STRING), 'r', 0L, 'a', 0L),"
        " (s, x) -> IF(s.p IS NOT NULL AND x = s.p,"
        "   named_struct('p', x, 'r', s.r + 1L, 'a', s.a),"
        "   named_struct('p', x, 'r', 1L, 'a', s.a + IF(s.r >= 2L, s.r, 0L))),"
        " s -> s.a + IF(s.r >= 2L, s.r, 0L))"
    )
    stats = base.select(
        "__id",
        F.expr("CAST(size(__ws) AS BIGINT)").alias("n_words"),
        F.expr(uni_fold).alias("__u"),
        F.expr(top_run(grams(2))).alias("__top_bi"),
        F.expr(f"CAST(IF(size(__ws) >= 2, size(__ws) - 1, 0) AS BIGINT)").alias("__n_bi"),
        F.expr(dup_tri_fold).alias("__dup_tri"),
        F.expr(f"CAST(IF(size(__ws) >= 3, size(__ws) - 2, 0) AS BIGINT)").alias("__n_tri"),
    )

    def frac(num, den):
        return (
            F.when(den > F.lit(0), num.cast("double") / den)
            .otherwise(F.lit(0.0))
        )

    return stats.select(
        F.col("__id").alias(id_col),
        F.col("n_words"),
        frac(F.col("__u.d"), F.col("n_words")).alias("distinct_word_frac"),
        frac(F.col("__u.b"), F.col("n_words")).alias("top_word_frac"),
        frac(F.col("__top_bi"), F.col("__n_bi")).alias("top_bigram_frac"),
        frac(F.col("__dup_tri"), F.col("__n_tri")).alias("dup_trigram_frac"),
    )
