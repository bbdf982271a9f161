"""Corpus retrieval: TF-IDF and BM25 top-k document search.

The reference engine has no retrieval operator (it is a flow-feature
extractor, rustiflow/src/main.rs); this module is part of the
training-data operator surface (SURVEY.md §2.7): given a set of query
terms, score every document containing at least one of them and return
the top-k — the targeted-curation cousin of dedup/decontam (pull
eval-contaminated or topic-matched documents out of a 100-TB corpus).

Scale shape (the part that must survive 100 TB):
- tokens are exploded ONCE and filtered to the query terms BEFORE any
  shuffle — the posting rows that move are O(matching occurrences),
  never O(corpus tokens);
- the document length rides the explode projection, so BM25 needs no
  extra join against a per-document length table;
- per-term document frequencies come from a window over the aggregated
  posting table (|matched docs| x |query terms| rows — already tiny),
  not from a second corpus scan;
- corpus totals (N docs, total token count) reduce to ONE row that is
  cross-joined back (the same single-row-totals pattern as
  sampling.temperature_mix); on a pre-tokenized table with a stored
  n_tok column this scan prunes to that single column;
- the final ranking is orderBy+limit -> TakeOrderedAndProject: a
  per-partition top-k then a k-row merge, never a global sort.

Exactness modes (the repo-wide convention, CLAUDE.md):
- ``exact_scale=None`` is the production scorer — double-precision log
  idf. Cross-engine doubles through ``ln`` are not bit-stable, so this
  mode is verified by pytest (allclose vs a NumPy oracle), not hashed.
- ``exact_scale=<int>`` switches to scaled-integer fixed point end to
  end: idf becomes the linear surrogate ``(scale*N) div df`` (monotone
  in 1/df, so rankings are idf-faithful) and BM25's length
  normalization is cleared to one integral division per term via exact
  fractions for k1 and b. All products run in DECIMAL(38,0) and the
  division is Spark's ``div`` / DuckDB's ``//`` (both truncate toward
  zero), so every score is bit-replayable by the DuckDB oracle in
  HUGEINT. Magnitude bound: idf_w*tf*(a+b)*d*T must stay below 1e38 —
  fine through sf10 with the default scale; at extreme corpus sizes
  lower ``exact_scale`` (the production mode has no such bound).
"""
from __future__ import annotations

from fractions import Fraction
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_NONEMPTY_TOKENS = "filter(split({col}, ' '), x -> x != '')"


def _spread_scan(df: DataFrame) -> DataFrame:
    """Spark sizes scan partitions by COMPRESSED input bytes, so a
    small-file / heavily-compressed corpus lands the whole token explode
    (~dl x row blowup) on a couple of tasks (decontam.py found the same:
    sf10 on 2 tasks). Pre-explode repartition when the scan is narrower
    than the cluster — a real 100-TB scan already has thousands of
    partitions and skips this."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def _postings(
    docs: DataFrame, id_col: str, text_col: str, query_terms: Sequence[str]
) -> DataFrame:
    """(doc, term, tf, dl) for query-term matches only.

    dl (non-empty whitespace token count, matching vocab_topk's
    counting) is projected per document BEFORE the explode and carried
    through the aggregation, so no separate length join is needed.
    """
    docs = _spread_scan(docs)
    toks = docs.select(
        F.col(id_col).alias("__doc"),
        F.size(F.expr(_NONEMPTY_TOKENS.format(col=text_col))).cast("long").alias(
            "__dl"
        ),
        F.explode(F.split(F.col(text_col), " ")).alias("__term"),
    )
    return (
        toks.where(F.col("__term").isin(list(query_terms)))
        .groupBy("__doc", "__term")
        .agg(F.count("*").alias("__tf"), F.first("__dl").alias("__dl"))
    )


def _with_corpus_totals(
    post: DataFrame, docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Attach document frequency (window over the tiny posting table)
    and the single-row corpus totals (N docs, total tokens)."""
    dfreq = post.withColumn(
        "__df", F.count("*").over(Window.partitionBy("__term"))
    )
    totals = docs.select(
        F.size(F.expr(_NONEMPTY_TOKENS.format(col=text_col))).cast("long").alias(
            "__dl"
        )
    ).agg(
        F.count("*").alias("__n"),
        F.coalesce(F.sum("__dl"), F.lit(0)).alias("__t"),
    )
    # single-row totals: the crossJoin is 1 x |post| with a broadcast —
    # the same shape plan_audit allowlists for temperature_mix
    return dfreq.crossJoin(F.broadcast(totals))


def _exact_frac(x: float, what: str) -> Fraction:
    f = Fraction(str(x))
    if f.denominator > 1000:
        raise ValueError(f"{what}={x} is not a small exact fraction")
    return f


def _int_t(arithmetic: str) -> str:
    """Integer carrier type for the exact modes. 'int128'
    (DECIMAL(38,0)) is the safe default; 'int64' (BIGINT) computes the
    identical values ~6x faster wherever the magnitude bound
    idf_w*tf*(a+b)*d*T < 2^63 holds (it does through sf10 here) — and
    ANSI mode makes a violation a loud error, never a wrong answer.
    Both carriers truncate division toward zero, so scores and hashes
    are identical between them."""
    if arithmetic == "int128":
        return "DECIMAL(38,0)"
    if arithmetic == "int64":
        return "BIGINT"
    raise ValueError(f"arithmetic must be 'int128' or 'int64', got {arithmetic!r}")


def tfidf_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k: int = 10,
    exact_scale: int | None = None,
    arithmetic: str = "int128",
) -> DataFrame:
    """Top-k documents by summed tf-idf over the query terms.

    Production (exact_scale=None): idf = ln(1 + (N - df + 0.5)/(df + 0.5))
    (BM25-style smoothed idf), score double. Exact mode: linear idf
    surrogate ``(scale*N) div df``, score a bit-replayable long
    (``arithmetic`` picks the integer carrier — see _int_t).
    Output: (id_col, n_matched, score[_scaled]) ordered by score desc,
    id asc, limited to k (ties resolved deterministically by id).
    """
    scored = _with_corpus_totals(
        _postings(docs, id_col, text_col, query_terms), docs, id_col, text_col
    )
    if exact_scale is None:
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
        )
        per_term = (F.col("__tf") * idf).alias("__s")
        out_col, out_typ = "score", "double"
    else:
        t = _int_t(arithmetic)
        per_term = F.expr(
            f"CAST((CAST({int(exact_scale)} AS {t}) * CAST(__n AS {t})"
            f" div CAST(__df AS {t})) * CAST(__tf AS {t}) AS LONG)"
        ).alias("__s")
        out_col, out_typ = "score_scaled", "long"
    agg = (
        scored.select("__doc", per_term)
        .groupBy("__doc")
        .agg(
            F.count("*").alias("n_matched"),
            F.sum("__s").cast(out_typ).alias(out_col),
        )
    )
    return (
        agg.orderBy(F.desc(out_col), F.asc("__doc"))
        .limit(k)
        .select(F.col("__doc").alias(id_col), "n_matched", out_col)
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    exact_scale: int | None = None,
    arithmetic: str = "int128",
) -> DataFrame:
    """Top-k documents by BM25 over the query terms.

    Production (exact_scale=None): textbook Robertson BM25 with the
    smoothed idf, avgdl = total_tokens/N, double score. Exact mode
    clears the length normalization to integers: with k1 = a/b_ and
    b = c/d as exact fractions,

        term = idf_w * tf * (a+b_) * d * T
               div (tf*b_*d*T + a*(d-c)*T + a*c*dl*N)

    where idf_w = (scale*N) div df, T = total corpus tokens — one
    integral division per (doc, term), bit-replayable in HUGEINT.
    """
    scored = _with_corpus_totals(
        _postings(docs, id_col, text_col, query_terms), docs, id_col, text_col
    )
    if exact_scale is None:
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
        )
        avgdl = F.col("__t") / F.col("__n")
        denom = F.col("__tf") + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / avgdl
        )
        per_term = (idf * F.col("__tf") * F.lit(k1 + 1.0) / denom).alias("__s")
        out_col, out_typ = "score", "double"
    else:
        fk = _exact_frac(k1, "k1")
        fb = _exact_frac(b, "b")
        a, b_ = fk.numerator, fk.denominator
        c, d = fb.numerator, fb.denominator
        s = int(exact_scale)
        t = _int_t(arithmetic)
        idf_w = (
            f"(CAST({s} AS {t}) * CAST(__n AS {t})"
            f" div CAST(__df AS {t}))"
        )
        num = (
            f"CAST({idf_w} AS {t}) * CAST(__tf AS {t})"
            f" * CAST({(a + b_) * d} AS {t})"
            f" * CAST(__t AS {t})"
        )
        den = (
            f"CAST({b_ * d} AS {t}) * CAST(__tf AS {t})"
            f" * CAST(__t AS {t})"
            f" + CAST({a * (d - c)} AS {t}) * CAST(__t AS {t})"
            f" + CAST({a * c} AS {t}) * CAST(__dl AS {t})"
            f" * CAST(__n AS {t})"
        )
        per_term = F.expr(f"CAST(({num}) div ({den}) AS LONG)").alias("__s")
        out_col, out_typ = "score_scaled", "long"
    agg = (
        scored.select("__doc", per_term)
        .groupBy("__doc")
        .agg(
            F.count("*").alias("n_matched"),
            F.sum("__s").cast(out_typ).alias(out_col),
        )
    )
    return (
        agg.orderBy(F.desc(out_col), F.asc("__doc"))
        .limit(k)
        .select(F.col("__doc").alias(id_col), "n_matched", out_col)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    item_col: str,
    rank_col: str,
    query_col: str | None = None,
    k_const: int = 60,
    scale: int = 1_000_000,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) of N ranked lists —
    the standard hybrid-retrieval combiner (BM25 + ANN, or any mix):

        rrf(item) = sum over lists of scale div (k_const + rank)

    kept EXACT in integers (one integral division per contribution, the
    same `div`-truncation contract as the BM25 fixed-point mode), so the
    fused ranking replays bit-for-bit in SQL. Output: (query_col?,
    item_col, n_sources, rrf_scaled, rank), rank by (rrf desc, item asc).

    Plan: union of the (tiny) top-k lists -> one map-side-combined
    groupBy -> rank window per query. The inputs are already k-bounded,
    so this never touches corpus-sized data.

    Reference analog: none (north-rule retrieval component; composes
    tfidf/bm25_topk with the ANN family)."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    keys = ([query_col] if query_col else []) + [item_col]
    tagged = [
        r.select(
            *keys, F.col(rank_col).cast("long").alias("__r")
        )
        for r in rankings
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    contrib = F.expr(f"CAST({int(scale)} div ({int(k_const)} + __r) AS BIGINT)")
    fused = (
        u.withColumn("__c", contrib)
        .groupBy(*keys)
        .agg(
            F.count("*").cast("long").alias("n_sources"),
            F.sum("__c").cast("long").alias("rrf_scaled"),
        )
    )
    w = Window.partitionBy(*([query_col] if query_col else [])).orderBy(
        F.desc("rrf_scaled"), F.asc(item_col)
    )
    out = fused.withColumn("rank", F.row_number().over(w).cast("long"))
    if topk is not None:
        out = out.filter(F.col("rank") <= topk)
    return out
