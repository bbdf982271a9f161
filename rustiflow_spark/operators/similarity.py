"""Similarity search over embedding columns.

brute_force_topk: exact cosine top-k — the correctness baseline. All math
is JVM-side higher-order functions (zip_with/aggregate) over
array<double>; ranking via window row_number.

ann_topk_lsh: the scale path — random-hyperplane LSH with multiple probe
tables; each query only scores candidates sharing a bucket in any table,
turning the N×M cross join into T bucket-equi-joins. Recall is tunable via
(n_planes, n_tables).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a: str, b: str):
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")


def _norm(a: str):
    return F.sqrt(F.expr(f"aggregate(transform({a}, x -> x * x), 0D, (acc, v) -> acc + v)"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: returns (query_id, rank, neighbor_id, cosine)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("qe"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("ce"),
    )
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot("qe", "ce") / (_norm("qe") * _norm("ce"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _bucket_expr(emb_alias: str, planes: np.ndarray) -> "F.Column":
    planes_lit = F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in planes])
    return F.expr(
        "aggregate(transform(__planes,"
        f" p -> IF(aggregate(zip_with({emb_alias}, p, (x, y) -> x * y), 0D,"
        " (acc, v) -> acc + v) >= 0, 1L, 0L)),"
        " 0L, (acc, b) -> acc * 2 + b)"
    ), planes_lit


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 11,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via multi-table random-hyperplane LSH.

    Candidates = corpus vectors sharing the query's bucket in >=1 of
    n_tables hash tables; exact cosine is computed only on candidates."""
    first = corpus.select(F.size(emb_col).alias("d")).first()
    d = dim or (first["d"] if first else 0)
    rng = np.random.RandomState(seed)

    def with_buckets(df: DataFrame, id_alias: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(id_alias),
            F.col(emb_col).cast("array<double>").alias(f"__e_{id_alias}"),
        )
        tables = []
        for t in range(n_tables):
            planes = rng.randn(n_planes, d)
            expr, planes_lit = _bucket_expr(f"__e_{id_alias}", planes)
            tables.append(
                out.withColumn("__planes", planes_lit)
                .withColumn("bucket", expr)
                .withColumn("table_id", F.lit(t))
                .drop("__planes")
            )
        res = tables[0]
        for t in tables[1:]:
            res = res.unionByName(t)
        return res

    # NB: the two with_buckets calls must see the SAME plane sequence
    rng = np.random.RandomState(seed)
    cb = with_buckets(corpus, "neighbor_id")
    rng = np.random.RandomState(seed)
    qb = with_buckets(queries, "query_id")

    cands = (
        qb.join(cb, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = _dot("__e_query_id", "__e_neighbor_id") / (
        _norm("__e_query_id") * _norm("__e_neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
