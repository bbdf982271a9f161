"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Score every raw-corpus document by how much more likely its hashed
n-gram bag is under the TARGET distribution (a small high-quality
corpus) than under the RAW distribution, then keep the top-scoring
documents. The published estimator:

    log w(x) = sum_{positions i} [ log p_hat(b_i) - log q_hat(b_i) ]

with p_hat/q_hat add-one-smoothed hashed-bigram unigram models over B
buckets. Both models reduce to ONE tiny (B-row) count table per corpus,
so at 100 TB the whole fit is two map-side-combined groupBys and the
scoring pass is a broadcast join of a B-row ratio table against the
exploded grams — no shuffle wider than B rows ever happens.

arithmetic='log' (production): the paper's log-ratio sum in double —
fast, but ln() is transcendental so cross-engine bit-equality is not
guaranteed. arithmetic='fixed' (oracle mode): the repo's exact
fixed-point surrogate — per-bucket LINEAR ratio

    r_b = (ct_b + 1) * (Nr + B) * scale  div  (cr_b + 1) * (Nt + B)

(one integral division in DECIMAL(38,0), truncation toward zero on both
engines), and the document score is the exact integer sum of its
positions' r_b. Monotone per feature in the same direction as the log
ratio; same convention as operators/retrieval.py's linear-idf mode.

Reference analog: none (north-rule training-data selection component).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _gram_buckets(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int, hash_fn: str
) -> DataFrame:
    """(id, bucket) — one row per unigram AND bigram position of the
    whitespace word sequence, hashed into B buckets. Word split matches
    repetition_stats (trim + ' +', empties dropped)."""
    ws = df.select(
        F.col(id_col).alias("__id"),
        F.filter(
            F.split(F.trim(F.col(text_col)), r" +"), lambda w: w != ""
        ).alias("__ws"),
    )
    # NOTE sequence(1, 0) is a DESCENDING two-element sequence in Spark,
    # not empty — docs under 2 words must take the empty-array branch
    grams = ws.select(
        "__id",
        F.explode(
            F.concat(
                F.col("__ws"),
                F.expr(
                    "CASE WHEN size(__ws) >= 2 THEN"
                    " transform(sequence(1, size(__ws) - 1),"
                    " i -> array_join(slice(__ws, i, 2), ' '))"
                    " ELSE CAST(array() AS array<string>) END"
                ),
            )
        ).alias("__g"),
    )
    if hash_fn == "xxhash64":
        h = F.xxhash64("__g")
    elif hash_fn == "md5":
        h = F.conv(F.substring(F.md5("__g"), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"dsir: unknown hash_fn {hash_fn!r}")
    return grams.select("__id", F.pmod(h, F.lit(n_buckets)).alias("__b"))


# Spark SQL trim() strips ONLY the space character from both ends (not
# tabs/newlines/Unicode whitespace — Python str.strip() would differ);
# the Arrow fit must replay Spark's trim exactly
_SQL_TRIM_CHARS = " "


def _bucket_count_map(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int, hash_fn: str
) -> dict[int, int]:
    """{bucket: gram count} over one corpus — the fit half's only input.

    md5 (the oracle-replay hash) counts via one mapInPandas pass that
    np.bincounts each Arrow batch into a B-long partial histogram
    (guide §4.2: the per-gram work is hashing, which hashlib does in C;
    the round-5 explode materialized one JVM row per gram position just
    to count it — the corpus's whole gram stream through a Generate +
    hash aggregate). Word split replays Spark bit-for-bit: SQL trim
    (space chars only), literal-space regex, empties dropped; md5 and
    integer counts are engine-independent, so the map is identical to
    the explode fit (pytest-asserted). xxhash64 (production) has no
    Python twin — it keeps the explode + map-side-combined groupBy.
    """
    if hash_fn == "md5":
        import hashlib
        import re as remod

        pat = remod.compile(" +")
        B = int(n_buckets)

        def per_batch(it):
            import numpy as np
            import pandas as pd

            counts = np.zeros(B, dtype=np.int64)
            for pdf in it:
                for s in pdf[text_col]:
                    if s is None:
                        continue
                    ws = [
                        w
                        for w in pat.split(s.strip(_SQL_TRIM_CHARS))
                        if w
                    ]
                    for g in ws:
                        counts[
                            int(
                                hashlib.md5(g.encode("utf-8")).hexdigest()[:15],
                                16,
                            )
                            % B
                        ] += 1
                    for a, b in zip(ws, ws[1:]):
                        counts[
                            int(
                                hashlib.md5(
                                    (a + " " + b).encode("utf-8")
                                ).hexdigest()[:15],
                                16,
                            )
                            % B
                        ] += 1
            yield pd.DataFrame(
                {"__b": np.arange(B, dtype=np.int64), "n": counts}
            )

        from rustiflow_spark.parallelism import ensure_min_parallelism

        partials = ensure_min_parallelism(
            df.select(F.col(text_col))
        ).mapInPandas(per_batch, schema="__b long, n long")
        rows = partials.groupBy("__b").agg(F.sum("n").alias("n")).collect()
        return {int(r["__b"]): int(r["n"]) for r in rows if int(r["n"])}
    g = _gram_buckets(df, id_col, text_col, n_buckets, hash_fn)
    return {
        int(r["__b"]): int(r["n"])
        for r in g.groupBy("__b").agg(F.count("*").alias("n")).collect()
    }


def _ratio_table(
    spark, rcm: dict[int, int], tcm: dict[int, int], n_buckets: int,
    scale: int, arithmetic: str,
) -> DataFrame:
    """The B-row smoothed (__b, __r) ratio table from raw/target bucket
    count maps — the model-fit half shared by dsir_weights (inline) and
    dsir_ratio_table (standalone, for streaming).

    Counts arrive as driver-side maps (bounded: <= B entries per side,
    B is sketch-sized) and the smoothed ratio is evaluated over a B-row
    LOCAL relation with the totals as literals. The round-5 shape left
    the counts lazy and derived the totals from the same count CTE, so
    the totals aggregate and the ratio join each re-ran both corpus-wide
    gram explodes — FOUR corpus passes per fit where two suffice
    (measured 7.1 s -> 3.2 s fit at sf1.0; guide §5: collect the
    sketch, never recompute the corpus). The ratio expression itself is
    unchanged, so values are bit-identical."""
    # exact integer totals (Python int == the round-5 Spark SUM bigint)
    nr, nt = sum(rcm.values()), sum(tcm.values())
    ratios = spark.createDataFrame(
        [(b, rcm.get(b, 0), tcm.get(b, 0), nr, nt) for b in range(n_buckets)],
        "__b long, __cr long, __ct long, __nr long, __nt long",
    )
    if arithmetic == "log":
        # each factor cast to double BEFORE the multiply: (ct+1)*(Nr+B)
        # in LONG overflows 2^63 once the raw corpus holds ~10^13+ gram
        # positions — exactly the target scale (review finding). Double
        # products can't overflow and feed a log anyway.
        ratio = F.log(
            (F.col("__ct") + 1).cast("double")
            * (F.col("__nr") + n_buckets).cast("double")
        ) - F.log(
            (F.col("__cr") + 1).cast("double")
            * (F.col("__nt") + n_buckets).cast("double")
        )
    else:
        # integral division with truncation toward zero on both engines:
        # Spark `div` on decimals == DuckDB `//` (CLAUDE.md convention).
        # |num| <= (Nt+1) * (Nr+B) * scale — DECIMAL(38,0) holds it to
        # ~10^15 grams per corpus at scale=10^6
        ratio = F.expr(
            f"CAST((CAST(__ct + 1 AS DECIMAL(38,0)) * (__nr + {n_buckets})"
            f" * {int(scale)}) div"
            f" (CAST(__cr + 1 AS DECIMAL(38,0)) * (__nt + {n_buckets}))"
            " AS BIGINT)"
        )
    return ratios.select("__b", ratio.alias("__r"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1024,
    scale: int = 1_000_000,
    hash_fn: str = "xxhash64",
    arithmetic: str = "log",
) -> DataFrame:
    """Per-raw-document DSIR importance score.

    Output: (id_col, n_feats, dsir_score) where n_feats is the document's
    gram-position count and dsir_score is the log-ratio sum (double,
    arithmetic='log') or the exact fixed-point linear-ratio sum (bigint,
    arithmetic='fixed'; each bucket ratio pre-scaled by `scale`).
    Documents with zero grams score 0.

    Plan shape: target + raw each contribute one explode -> groupBy(B)
    count (map-side combinable, B-bounded output) for the FIT; the B-row
    ratio table is then pulled to the driver (bounded by construction —
    B is sketch-sized) and the SCORE pass is a pure per-row projection
    (dsir_score_stream's fold over the doc's own gram array,
    bit-identical to the round-5 broadcast-join + groupBy plan:
    pytest-asserted for both arithmetics including NULL text). The
    round-5 shape paid a second corpus-wide gram explode, a corpus-sized
    groupBy(__id) shuffle and a corpus-sized id left join purely to
    reassemble values that never needed to leave their row (optimization
    guide §2.4); now nothing wider than B rows ever shuffles and the raw
    corpus is scanned exactly twice (fit + score). Smoothing is add-one
    over the B buckets, so EVERY bucket has a defined ratio — unseen
    grams fall in a bucket whose counts are just smaller, never a
    special case.

    Assumes id_col identifies rows (a duplicated id now scores its own
    row's text; the round-5 join shape merged duplicate-id grams —
    fixtures and the contract keep ids unique).
    """
    if arithmetic not in ("log", "fixed"):
        raise ValueError(f"dsir: unknown arithmetic {arithmetic!r}")
    sc = raw.sparkSession.sparkContext
    # explode blowup ~2x words per row + per-gram hashing: spread a
    # compressed narrow scan BEFORE the per-row work (scan partitions are
    # sized by COMPRESSED bytes; no-op at real scale)
    if raw.rdd.getNumPartitions() < sc.defaultParallelism:
        raw = raw.repartition(sc.defaultParallelism)
    # the two fit sides are independent count jobs: submit them from a
    # 2-thread pool so the smaller side back-fills the larger side's
    # task tail (guide §2.6); counts are exact integers, so concurrency
    # cannot change them
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fr = pool.submit(
            _bucket_count_map, raw, id_col, text_col, n_buckets, hash_fn
        )
        ft = pool.submit(
            _bucket_count_map, target, id_col, text_col, n_buckets, hash_fn
        )
        rcm, tcm = fr.result(), ft.result()
    ratios = _ratio_table(
        raw.sparkSession, rcm, tcm, n_buckets, scale, arithmetic
    )
    # B-row bounded collect (the dsir_stream convention): the fit must
    # finish before any document can be scored, so this is the pipeline
    # barrier, not a driver data path
    vals = [r["__r"] for r in ratios.orderBy("__b").collect()]
    return dsir_score_stream(
        raw, vals, id_col, text_col, hash_fn=hash_fn, arithmetic=arithmetic
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    **kwargs,
) -> DataFrame:
    """Top-k raw documents by DSIR score (deterministic: score desc, id
    asc — the resampling variant adds Gumbel noise, which is float-only;
    compose dsir_weights with sampling.quota_sample for a stochastic-but-
    deterministic draw). Distributed top-k (TakeOrderedAndProject), never
    a global sort."""
    w = dsir_weights(raw, target, id_col, text_col, **kwargs)
    return w.orderBy(F.desc("dsir_score"), F.asc(id_col)).limit(k)


def dsir_score_stream(
    stream: DataFrame,
    ratio_values: list,
    id_col: str,
    text_col: str,
    hash_fn: str = "xxhash64",
    arithmetic: str = "log",
) -> DataFrame:
    """Streaming DSIR scoring: score an unbounded document stream against
    a PRE-FITTED ratio table (dsir_ratio_table, trained offline on the
    reference corpora) — the online data-selection gate in front of an
    ingestion pipeline. STATELESS by construction: a document's grams
    never leave its row (no explode, no groupBy — a streaming groupBy
    would open state per doc id), the B ratios ride the plan as a
    literal array (B is sketch-sized by design), and the score is one
    per-row aggregate over the gram array. Works under any trigger /
    output mode with zero state; rows match dsir_weights'
    (id, n_feats, dsir_score) exactly, so the batch oracle applies
    verbatim to the stream's full output.

    ratio_values: the B ratio values indexed by bucket (collect
    dsir_ratio_table ordered by __b — B integers for 'fixed', doubles
    for 'log')."""
    b = len(ratio_values)
    if b == 0:
        raise ValueError("dsir_score_stream: empty ratio table")
    if arithmetic == "fixed":
        rlit = "array(" + ", ".join(f"{int(v)}L" for v in ratio_values) + ")"
        zero, typ = "0L", "long"
    elif arithmetic == "log":
        rlit = "array(" + ", ".join(repr(float(v)) + "D" for v in ratio_values) + ")"
        zero, typ = "CAST(0.0 AS DOUBLE)", "double"
    else:
        raise ValueError(f"dsir: unknown arithmetic {arithmetic!r}")
    if hash_fn == "xxhash64":
        hexp = "xxhash64(g)"
    elif hash_fn == "md5":
        hexp = "CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT)"
    else:
        raise ValueError(f"dsir: unknown hash_fn {hash_fn!r}")
    # NULL text must score (0, 0) like dsir_weights' left-join coalesce
    # (review finding: NULL propagates through trim/split/size and the
    # stream would emit NULL rows the batch twin never produces).
    #
    # Subexpression binding matters here: with no explode/aggregation
    # boundary, collapsed projections would INLINE the word-split into
    # every bigram slice — O(words^2) splits per row (measured 207 s for
    # 500k docs). Lambda variables evaluate once, so the split and the
    # gram array are each bound through a single-element transform.
    ws_expr = (
        f"filter(split(trim(coalesce(`{text_col}`, '')), ' +'),"
        " w -> w != '')"
    )
    grams_of_w = (
        "concat(w, CASE WHEN size(w) >= 2 THEN"
        " transform(sequence(1, size(w) - 1),"
        " i -> array_join(slice(w, i, 2), ' '))"
        " ELSE CAST(array() AS array<string>) END)"
    )
    # one pass over the bound gram array computes count AND score
    both = (
        f"element_at(transform(array({ws_expr}),"
        f" w -> transform(array({grams_of_w}),"
        f" gs -> named_struct("
        f"'n', size(gs),"
        f" 's', aggregate(gs, {zero},"
        f" (acc, g) -> acc + element_at({rlit},"
        f" CAST(pmod({hexp}, {b}) AS INT) + 1))"
        f"))[0]), 1)"  # [..] subscript is 0-based; element_at is 1-based
    )
    return stream.select(
        F.col(id_col), F.expr(both).alias("__o")
    ).select(
        id_col,
        F.col("__o.n").cast("long").alias("n_feats"),
        F.col("__o.s").cast(typ).alias("dsir_score"),
    )


def dsir_ratio_table(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1024,
    scale: int = 1_000_000,
    hash_fn: str = "xxhash64",
    arithmetic: str = "log",
) -> DataFrame:
    """The B-row smoothed ratio table alone (the model-fit half of
    dsir_weights) — persist/broadcast it once offline, then score any
    stream or batch against it with dsir_score_stream. Columns:
    (__b, __r)."""
    from rustiflow_spark.parallelism import ensure_min_parallelism

    rcm = _bucket_count_map(
        ensure_min_parallelism(raw), id_col, text_col, n_buckets, hash_fn
    )
    tcm = _bucket_count_map(target, id_col, text_col, n_buckets, hash_fn)
    return _ratio_table(
        raw.sparkSession, rcm, tcm, n_buckets, scale, arithmetic
    )
