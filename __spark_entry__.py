"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship sessionized-feature pipeline on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2);
``oracle_sql()`` — DuckDB-equivalent SQL for each (same column names; floats
rounded identically on both sides).

Engine mapping for the driver ``events`` table (TESTDATA.md):
key=user_id, event time=unix microseconds of ts, value as the n_tok/length
analog, direction = event_id % 2, terminator = event_type == 'purchase'
(the TCP-termination analog). All mappings are deterministic and expressed
identically in Spark and DuckDB SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

IDLE_S = 1800  # 30 min gap sessionization for the events table
BIG_ACTIVE_S = 10_000_000  # effectively disables the active timeout (SQL-oracle queries)

_SHIPPED_SESSIONS: set[int] = set()


def _ensure_package_shipped(spark: SparkSession) -> None:
    """Make rustiflow_spark importable in executor Python workers even when
    the SparkSession was created before this module set PYTHONPATH (the
    production path is spark-submit --py-files; this is the library-mode
    equivalent via addPyFile)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    import shutil
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    zip_base = os.path.join(tempfile.gettempdir(), "rustiflow_spark_pkg")
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        staging = tempfile.mkdtemp()
        shutil.copytree(
            os.path.join(repo, "rustiflow_spark"),
            os.path.join(staging, "rustiflow_spark"),
        )
        shutil.make_archive(zip_base, "zip", staging)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already added or unsupported; PYTHONPATH may still cover it
    _SHIPPED_SESSIONS.add(key)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # TIMESTAMP_NTZ -> epoch µs, independent of the session time zone
    # (matches DuckDB's epoch_us on naive timestamps)
    ts_us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    return df.select(
        "user_id",
        ts_us.alias("ts_us"),
        "value",
        (F.col("event_id") % 2).cast("int").alias("direction"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).cast("int").alias("terminator"),
        F.col("event_id").alias("event_seq"),
        "event_type",
    )


def _engine_cfg():
    from rustiflow_spark.config import EngineConfig

    return EngineConfig(
        active_timeout=BIG_ACTIVE_S, idle_timeout=IDLE_S, scan_mode="none"
    )


# --------------------------------------------------------------------------
# Queries
# --------------------------------------------------------------------------


def q_session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core operator: gap+terminator sessionization -> per-session feature
    vector (idle-timeout sessions; SURVEY.md §2.3 T1/T3-analog + §2.4 A1,
    A3, A5, A13)."""
    _ensure_package_shipped(spark)
    from rustiflow_spark.operators.event_features import sessionize_events

    feats = sessionize_events(
        _events(spark, sf_dir),
        ["user_id"],
        _engine_cfg(),
        value_col="value",
        # column pruning pushed through the kernel: only the feature blocks
        # this query projects are computed and shipped back through Arrow
        features=["value", "iat", "subflow", "direction"],
    )
    return feats.select(
        "user_id",
        "first_ts_us",
        "last_ts_us",
        "duration_us",
        "cause",
        F.col("event_count").cast("long").alias("event_count"),
        F.col("fwd_event_count").cast("long").alias("fwd_event_count"),
        F.col("bwd_event_count").cast("long").alias("bwd_event_count"),
        F.round("n_tok_total", 6).alias("value_total"),
        F.round("n_tok_mean", 6).alias("value_mean"),
        F.round("n_tok_max", 6).alias("value_max"),
        F.round("n_tok_min", 6).alias("value_min"),
        F.round("iat_total", 4).alias("iat_total_ms"),
        F.round("iat_max", 4).alias("iat_max_ms"),
        F.round("iat_min", 4).alias("iat_min_ms"),
        F.col("subflow_count").cast("long").alias("subflow_count"),
    )


_Q_SESSION_SQL = f"""
WITH ev AS (
    SELECT user_id,
           epoch_us(ts) AS ts_us,
           value,
           event_id % 2 AS direction,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS terminator,
           event_id AS event_seq
    FROM events
), flagged AS (
    SELECT *,
           CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
                WHEN ts_us - lag(ts_us) OVER w >= ({IDLE_S} + 1) * 1000000 THEN 1
                WHEN lag(terminator) OVER w = 1 THEN 1
                ELSE 0 END AS new_session,
           ts_us - lag(ts_us) OVER w AS gap_us
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_seq)
), sess AS (
    SELECT *,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_seq
                                  ROWS UNBOUNDED PRECEDING) AS session_id,
           CASE WHEN new_session = 1 THEN NULL ELSE gap_us END AS intra_gap_us
    FROM flagged
), agg AS (
    SELECT user_id, session_id,
           min(ts_us) AS first_ts_us,
           max(ts_us) AS last_ts_us,
           max(ts_us) - min(ts_us) AS duration_us,
           count(*) AS event_count,
           CAST(sum(CASE WHEN direction = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fwd_event_count,
           CAST(sum(CASE WHEN direction = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bwd_event_count,
           round(sum(value), 6) AS value_total,
           round(avg(value), 6) AS value_mean,
           round(max(value), 6) AS value_max,
           round(min(value), 6) AS value_min,
           round(coalesce(sum(intra_gap_us / 1000.0), 0.0), 4) AS iat_total_ms,
           round(coalesce(max(intra_gap_us / 1000.0), 0.0), 4) AS iat_max_ms,
           round(coalesce(min(intra_gap_us / 1000.0), 0.0), 4) AS iat_min_ms,
           CAST(1 + sum(CASE WHEN intra_gap_us > 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS subflow_count,
           max(CASE WHEN terminator = 1 THEN 1 ELSE 0 END) AS has_term
    FROM sess
    GROUP BY user_id, session_id
)
SELECT user_id, first_ts_us, last_ts_us, duration_us,
       CASE WHEN has_term = 1 THEN 'TCP Normal Termination'
            WHEN last_ts_us < max(last_ts_us) OVER (PARTITION BY user_id)
                 THEN 'Idle Timeout'
            ELSE 'Exporter Shutdown' END AS cause,
       event_count, fwd_event_count, bwd_event_count,
       value_total, value_mean, value_max, value_min,
       iat_total_ms, iat_max_ms, iat_min_ms,
       subflow_count
FROM agg
"""


def q_welford_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-invariant Welford feature block (A5/A6/A7 analog) as pure
    Catalyst aggregation — whole-stage codegen, no Python."""
    df = _events(spark, sf_dir)
    return df.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 6).alias("value_total"),
        F.round(F.avg("value"), 6).alias("value_mean"),
        F.round(F.stddev_pop("value"), 4).alias("value_std"),
        F.round(F.var_pop("value"), 3).alias("value_var"),
        F.round(F.min("value"), 6).alias("value_min"),
        F.round(F.max("value"), 6).alias("value_max"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0)).cast("long").alias(
            "big_value_events"
        ),
    )


_Q_WELFORD_SQL = """
SELECT user_id,
       count(*) AS n_events,
       round(sum(value), 6) AS value_total,
       round(avg(value), 6) AS value_mean,
       round(stddev_pop(value), 4) AS value_std,
       round(var_pop(value), 3) AS value_var,
       round(min(value), 6) AS value_min,
       round(max(value), 6) AS value_max,
       CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS big_value_events
FROM events
GROUP BY user_id
"""


def q_iat_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IAT stats via JVM-side window lag (A1 analog without sessions)."""
    from pyspark.sql import Window

    df = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_seq")
    iat = df.withColumn("iat_ms", (F.col("ts_us") - F.lag("ts_us").over(w)) / 1000.0)
    return iat.groupBy("user_id").agg(
        F.round(F.avg("iat_ms"), 4).alias("iat_mean_ms"),
        F.round(F.max("iat_ms"), 4).alias("iat_max_ms"),
        F.round(F.min("iat_ms"), 4).alias("iat_min_ms"),
        F.round(F.sum("iat_ms"), 4).alias("iat_total_ms"),
        F.count("iat_ms").cast("long").alias("iat_count"),
    )


_Q_IAT_SQL = """
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id AS event_seq FROM events
), iat AS (
    SELECT user_id,
           (ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_seq)) / 1000.0
               AS iat_ms
    FROM ev
)
SELECT user_id,
       round(avg(iat_ms), 4) AS iat_mean_ms,
       round(max(iat_ms), 4) AS iat_max_ms,
       round(min(iat_ms), 4) AS iat_min_ms,
       round(sum(iat_ms), 4) AS iat_total_ms,
       count(iat_ms) AS iat_count
FROM iat
GROUP BY user_id
"""


def q_flag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-count aggregation + presence-mask string (A8 analog:
    tcp_flag_stats.rs:49-106)."""
    df = _events(spark, sf_dir)
    aggs = []
    for et in ("click", "view", "purchase", "signup", "error"):
        aggs.append(
            F.sum(F.when(F.col("event_type") == et, 1).otherwise(0))
            .cast("long")
            .alias(f"{et}_count")
        )
    out = df.groupBy("user_id").agg(*aggs)
    mask = F.concat(
        *[
            F.when(F.col(f"{et}_count") > 0, F.lit(ch)).otherwise(F.lit("."))
            for ch, et in (
                ("C", "click"), ("V", "view"), ("P", "purchase"), ("S", "signup"), ("E", "error"),
            )
        ]
    )
    return out.withColumn("type_mask", mask)


_Q_FLAGS_SQL = """
WITH c AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_count,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_count,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_count,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup_count,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count
    FROM events GROUP BY user_id
)
SELECT *,
       concat(CASE WHEN click_count > 0 THEN 'C' ELSE '.' END,
              CASE WHEN view_count > 0 THEN 'V' ELSE '.' END,
              CASE WHEN purchase_count > 0 THEN 'P' ELSE '.' END,
              CASE WHEN signup_count > 0 THEN 'S' ELSE '.' END,
              CASE WHEN error_count > 0 THEN 'E' ELSE '.' END) AS type_mask
FROM c
"""


def q_session_annotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level session assignment (assign_sessions operator): every event
    annotated with its session ordinal — payload columns pass through."""
    _ensure_package_shipped(spark)
    from rustiflow_spark.operators.event_features import assign_sessions

    ann = assign_sessions(_events(spark, sf_dir), ["user_id"], _engine_cfg())
    return ann.select(
        "user_id",
        F.col("event_seq").alias("event_id"),
        "ts_us",
        F.col("session_index").cast("long").alias("session_index"),
        "session_cause",
    )


_Q_ANNOTATION_SQL = f"""
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS ts_us,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS terminator,
           event_id AS event_seq
    FROM events
), flagged AS (
    SELECT *,
           CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
                WHEN ts_us - lag(ts_us) OVER w >= ({IDLE_S} + 1) * 1000000 THEN 1
                WHEN lag(terminator) OVER w = 1 THEN 1
                ELSE 0 END AS new_session
    FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_seq)
), sess AS (
    SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_seq
                                     ROWS UNBOUNDED PRECEDING) - 1 AS session_index
    FROM flagged
), last_sess AS (
    SELECT user_id, max(session_index) AS max_si FROM sess GROUP BY user_id
), term_sess AS (
    SELECT user_id, session_index, max(terminator) AS has_term
    FROM sess GROUP BY user_id, session_index
)
SELECT s.user_id, s.event_seq AS event_id, s.ts_us,
       CAST(s.session_index AS BIGINT) AS session_index,
       CASE WHEN t.has_term = 1 THEN 'TCP Normal Termination'
            WHEN s.session_index < l.max_si THEN 'Idle Timeout'
            ELSE 'Exporter Shutdown' END AS session_cause
FROM sess s
JOIN last_sess l ON s.user_id = l.user_id
JOIN term_sess t ON s.user_id = t.user_id AND s.session_index = t.session_index
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication on content hash (training-data op): keeper =
    min doc_id per md5(text)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        df.withColumn("content_hash", F.md5(F.col("text")))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
            F.count("*").cast("long").alias("copies"),
        )
    )


_Q_DEDUP_SQL = """
SELECT md5(text) AS content_hash,
       min(doc_id) AS keeper_doc_id,
       count(*) AS copies
FROM documents
GROUP BY md5(text)
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis block: token counting + simple quality ratios."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.size(F.split(F.col("text"), " "))
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        words.cast("long").alias("word_count"),
        F.round(F.col("n_chars") / words, 6).alias("chars_per_word"),
        F.length("text").cast("long").alias("text_len"),
    )


_Q_TEXT_SQL = """
SELECT doc_id, lang, source, n_chars,
       len(string_split(text, ' ')) AS word_count,
       round(n_chars / len(string_split(text, ' ')), 6) AS chars_per_word,
       length(text) AS text_len
FROM documents
"""


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k similarity search over the embedding column
    (training-data op; JVM-side F.aggregate/zip_with dot products)."""
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = queries.crossJoin(df.select("vec_id", "embedding")).filter(
        F.col("vec_id") != F.col("query_id")
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "embedding", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    sims = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot / (norm(F.col("q_emb")) * norm(F.col("embedding")))).alias("cos"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("neighbor_id").cast("long").alias("neighbor_id"),
            F.round("cos", 4).alias("cos"),
        )
    )


_Q_SIM_SQL = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8
), pairs AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(q.q_emb, e.embedding) AS cos
    FROM q CROSS JOIN embeddings e
    WHERE e.vec_id != q.query_id
), ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM pairs
)
SELECT query_id, rank, neighbor_id, round(cos, 4) AS cos
FROM ranked WHERE rank <= 5
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time as-of join (north-rule operator; operators/asof.py):
    each event gets its user's most recent signup event at or before it —
    leakage-free backward match."""
    _ensure_package_shipped(spark)
    from rustiflow_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    left = ev.select("user_id", "ts_us", F.col("event_seq").alias("event_id"), "value")
    right = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts_us")
        .agg(F.round(F.max("value"), 6).alias("signup_value"))
    )
    out = asof_join(left, right, by="user_id", suffix="_sig")
    return out.select(
        "user_id",
        "event_id",
        "ts_us",
        F.col("ts_us_sig").alias("signup_ts_us"),
        F.round("signup_value_sig", 6).alias("signup_value"),
        # integer µs difference (exact in both engines; a rounded-seconds
        # double lands on exact .00005 ties that Spark and DuckDB break
        # differently — CORRECTNESS_r01). Cast to double so the null-able
        # column serializes identically on both sides.
        (F.col("ts_us") - F.col("ts_us_sig")).cast("double").alias("us_since_signup"),
    )


_Q_ASOF_SQL = """
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, value, event_type FROM events
), sig AS (
    SELECT user_id, ts_us, round(max(value), 6) AS signup_value
    FROM ev WHERE event_type = 'signup' GROUP BY user_id, ts_us
)
SELECT ev.user_id, ev.event_id, ev.ts_us,
       sig.ts_us AS signup_ts_us,
       round(sig.signup_value, 6) AS signup_value,
       CAST(ev.ts_us - sig.ts_us AS DOUBLE) AS us_since_signup
FROM ev ASOF LEFT JOIN sig
  ON ev.user_id = sig.user_id AND ev.ts_us >= sig.ts_us
"""


def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free lag/lead features (operators/windows.py)."""
    _ensure_package_shipped(spark)
    from rustiflow_spark.operators.windows import add_lag_lead_features

    ev = _events(spark, sf_dir).select(
        "user_id", "ts_us", F.col("event_seq").alias("event_id"), "value"
    )
    out = add_lag_lead_features(
        ev, ["user_id"], "ts_us", ["value"], lags=[1, 2], leads=[1], order_col="event_id"
    )
    return out.select(
        "user_id",
        "event_id",
        "ts_us",
        F.round("value_lag1", 6).alias("value_lag1"),
        F.round("value_lag2", 6).alias("value_lag2"),
        F.round("value_lead1", 6).alias("value_lead1"),
    )


_Q_LAG_SQL = """
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events
)
SELECT user_id, event_id, ts_us,
       round(lag(value, 1) OVER w, 6) AS value_lag1,
       round(lag(value, 2) OVER w, 6) AS value_lag2,
       round(lead(value, 1) OVER w, 6) AS value_lead1
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


def q_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing event-time range aggregates (RANGE frame, operators/windows.py)."""
    _ensure_package_shipped(spark)
    from rustiflow_spark.operators.windows import rolling_time_features

    ev = _events(spark, sf_dir).select(
        "user_id", "ts_us", F.col("event_seq").alias("event_id"), "value"
    )
    out = rolling_time_features(
        ev, ["user_id"], "ts_us", "value", {"6h": 6 * 3600 * 1_000_000}
    )
    return out.select(
        "user_id",
        "event_id",
        "ts_us",
        F.col("value_cnt_6h").cast("long").alias("cnt_6h"),
        F.round("value_sum_6h", 6).alias("sum_6h"),
        F.round("value_mean_6h", 6).alias("mean_6h"),
    )


_Q_ROLLING_SQL = """
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events
)
SELECT user_id, event_id, ts_us,
       count(value) OVER w AS cnt_6h,
       round(sum(value) OVER w, 6) AS sum_6h,
       round(avg(value) OVER w, 6) AS mean_6h
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)
"""


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup clustering on documents (operators/dedup.py).
    Not SQL-expressible (xxhash64 signature family) — rows-only check."""
    _ensure_package_shipped(spark)
    from rustiflow_spark.operators.dedup import minhash_lsh_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.6).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "is_keeper",
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures + near-dup pairs (rows-only check)."""
    _ensure_package_shipped(spark)
    from rustiflow_spark.operators.dedup import simhash_neardup_pairs, simhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = simhash_signatures(docs, "doc_id", "text")
    return sigs.select(F.col("doc_id").cast("long").alias("doc_id"), "simhash")


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID over documents (rows-only check)."""
    _ensure_package_shipped(spark)
    from rustiflow_spark.operators.textstats import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return language_id(docs, "text").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang_pred",
        F.col("lang_pred_hits").cast("long").alias("lang_pred_hits"),
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors (rows-only check; the
    exact-top-k variant `similarity_topk` carries the SQL oracle)."""
    _ensure_package_shipped(spark)
    from rustiflow_spark.operators.similarity import ann_topk_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    return ann_topk_lsh(emb, queries, k=5, n_planes=6, n_tables=6).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.round("cosine", 4).alias("cos"),
    )


def q_token_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule flagship shape: a token-sequence table (tokens synthesized
    deterministically from the documents text per FIXTURES.md §4) through
    the full pipeline — sessionize by source + lag features. Rows-only
    check (token arrays are not SQL-expressible portably)."""
    _ensure_package_shipped(spark)
    from rustiflow_spark.config import EngineConfig
    from rustiflow_spark.pipeline import token_feature_pipeline

    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rank = F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    tokens = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr(
            "transform(split(text, ' '), w -> CAST(length(w) * 31 + ascii(w) AS INT))"
        ).alias("tokens"),
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_tok"),
        "source",
        # events 60 s apart within each source -> multi-event sessions cut
        # by terminator events (doc_id % 11)
        (F.lit(1_700_000_000_000_000) + rank.cast("long") * 60_000_000).alias("ts_us"),
        (F.col("doc_id") % 2).cast("int").alias("direction"),
        F.when(F.col("doc_id") % 11 == 0, 1).otherwise(0).cast("int").alias("terminator"),
        F.col("doc_id").alias("event_seq"),
    )
    # one session stream per source (doc events 1 min apart)
    renamed = tokens.withColumnRenamed("doc_id", "orig_doc_id").withColumn(
        "doc_id", F.lit("all")
    )
    cfg = EngineConfig(active_timeout=10_000_000, idle_timeout=600, scan_mode="none")
    out = token_feature_pipeline(renamed, cfg, lags=[1])
    return out.select(
        "source",
        F.col("session_index").cast("long").alias("session_index"),
        "first_ts_us",
        "cause",
        F.col("event_count").cast("long").alias("event_count"),
        F.round("n_tok_total", 6).alias("n_tok_total"),
        F.round("n_tok_mean", 6).alias("n_tok_mean"),
        F.round("n_tok_total_lag1", 6).alias("n_tok_total_lag1"),
    )


# --------------------------------------------------------------------------
# Contract surface
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sessionized feature extraction on sf0.001."""
    return q_session_features(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "session_features": q_session_features,
        "welford_stats": q_welford_stats,
        "iat_window": q_iat_window,
        "flag_counts": q_flag_counts,
        "session_annotation": q_session_annotation,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "similarity_topk": q_similarity_topk,
        "asof_join": q_asof_join,
        "lag_features": q_lag_features,
        "rolling_features": q_rolling_features,
        "minhash_dedup": q_minhash_dedup,
        "simhash": q_simhash,
        "langid": q_langid,
        "ann_topk": q_ann_topk,
        "token_pipeline": q_token_pipeline,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "session_features": _Q_SESSION_SQL,
        "welford_stats": _Q_WELFORD_SQL,
        "iat_window": _Q_IAT_SQL,
        "flag_counts": _Q_FLAGS_SQL,
        "session_annotation": _Q_ANNOTATION_SQL,
        "dedup_exact": _Q_DEDUP_SQL,
        "text_stats": _Q_TEXT_SQL,
        "similarity_topk": _Q_SIM_SQL,
        "asof_join": _Q_ASOF_SQL,
        "lag_features": _Q_LAG_SQL,
        "rolling_features": _Q_ROLLING_SQL,
    }
