"""Similarity search over embedding columns.

brute_force_topk: exact cosine top-k — the correctness baseline. All math
is JVM-side higher-order functions (zip_with/aggregate) over
array<double>; ranking via window row_number.

ann_topk_lsh: the scale path — random-hyperplane LSH with multiple probe
tables; each query only scores candidates sharing a bucket in any table,
turning the N×M cross join into T bucket-equi-joins. Recall is tunable via
(n_planes, n_tables).

ivf_fit / ann_topk_ivf: the second scale path — IVF-flat (inverted-file)
partitioned search. A tiny k-means codebook is trained with exact integer
arithmetic (quantized embeddings, Lloyd iterations as distributed
assign/recompute jobs; only the K×d centroid table touches the driver),
the corpus becomes K inverted lists, and each query probes only its
nprobe nearest lists — candidate generation is a broadcast map + an
equi-join on the list id, never N×M. The integer quantization makes the
whole fit order-independent and bit-exactly replayable (summation order
cannot change the result), which is what lets a DuckDB oracle verify the
centroids, the list assignment, and the probed top-k.
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
    mode: str = "arrow",
) -> DataFrame:
    """Approximate cosine top-k via multi-table random-hyperplane LSH.

    Candidates = corpus vectors sharing the query's bucket in >=1 of
    n_tables hash tables; exact cosine is computed only on candidates.

    Plan shape: ALL n_tables buckets (and the vector norm) are computed
    in ONE pass per row and posexploded to (table_id, bucket) — the
    round-5 shape unioned n_tables separate scans of the corpus, paying
    the parquet decode and scan setup n_tables times, and re-derived
    both norms per candidate PAIR (guide §2.4 / §1.2). posexplode's
    0-based position IS the old table_id literal.

    mode='arrow' (default, the scale path): one Arrow batch pass
    computes every plane dot with the SAME left-to-right fold order as
    the Catalyst aggregate — vectorized across rows but sequential over
    dimensions (acc += q[j] * p[j] for j in 0..d-1), so every
    intermediate double is bit-identical to the HOF fold and the >= 0
    sign test (hence the candidate set, hence the output) cannot
    diverge. np.sqrt and Math.sqrt are both IEEE-correctly-rounded, so
    the norms match too. mode='catalyst' is the zero-Python
    expression-tree twin (oracle-replay shape); equality of the two is
    pytest-asserted."""
    first = corpus.select(F.size(emb_col).alias("d")).first()
    d = dim or (first["d"] if first else 0)
    # NB: corpus and query sides must see the SAME plane sequence
    rng = np.random.RandomState(seed)
    all_planes = [rng.randn(n_planes, d) for _ in range(n_tables)]
    if mode not in ("arrow", "catalyst"):
        raise ValueError(f"ann_topk_lsh: unknown mode {mode!r}")
    # T*P plane dots per row dominate a compressed narrow scan
    # (CLAUDE.md convention; no-op at real scale)
    from rustiflow_spark.parallelism import ensure_min_parallelism

    corpus = ensure_min_parallelism(corpus)

    def bucket_col(emb_alias: str, planes: np.ndarray):
        planes_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in row]) for row in planes]
        )
        return F.aggregate(
            F.transform(
                planes_lit,
                lambda p: F.when(
                    F.aggregate(
                        F.zip_with(F.col(emb_alias), p, lambda x, y: x * y),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                    >= 0,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, b: acc * 2 + b,
        )

    # (n_tables * n_planes, d) plane matrix for the Arrow path
    Pm = np.concatenate(all_planes, axis=0) if all_planes else np.zeros((0, d))

    def arrow_buckets(id_alias: str):
        e = f"__e_{id_alias}"
        nrm = f"__n_{id_alias}"

        def per_batch(it):
            import pandas as pd

            for pdf in it:
                n = len(pdf)
                if n == 0:
                    pdf[nrm] = np.array([], dtype="float64")
                    pdf["__bks"] = []
                    yield pdf
                    continue
                Q = np.asarray(pdf[e].tolist(), dtype=np.float64)
                # exact replay of the Catalyst left fold: vectorized over
                # rows, SEQUENTIAL over dimensions — each per-plane acc
                # is ((0 + q0*p0) + q1*p1) + ... like aggregate()
                acc = np.zeros((n, Pm.shape[0]))
                nacc = np.zeros(n)
                for j in range(Q.shape[1]):
                    acc += Q[:, j : j + 1] * Pm[None, :, j]
                    nacc += Q[:, j] * Q[:, j]
                bits = (acc >= 0).astype(np.int64).reshape(n, n_tables, n_planes)
                buckets = np.zeros((n, n_tables), dtype=np.int64)
                for p in range(n_planes):
                    buckets = buckets * 2 + bits[:, :, p]
                out = pdf.copy()
                out[nrm] = np.sqrt(nacc)
                out["__bks"] = list(buckets)
                yield out

        return per_batch

    def with_buckets(df: DataFrame, id_alias: str) -> DataFrame:
        e = f"__e_{id_alias}"
        out = df.select(
            F.col(id_col).alias(id_alias),
            F.col(emb_col).cast("array<double>").alias(e),
        )
        if mode == "arrow":
            out = out.mapInPandas(
                arrow_buckets(id_alias),
                schema=f"{id_alias} long, {e} array<double>,"
                f" __n_{id_alias} double, __bks array<long>",
            )
            return out.select(
                "*", F.posexplode("__bks").alias("table_id", "bucket")
            ).drop("__bks")
        out = out.withColumn(f"__n_{id_alias}", _norm(e))
        return out.select(
            "*",
            F.posexplode(
                F.array(*[bucket_col(e, p) for p in all_planes])
            ).alias("table_id", "bucket"),
        )

    cb = with_buckets(corpus, "neighbor_id")
    qb = with_buckets(queries, "query_id")

    cands = (
        qb.join(cb, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = _dot("__e_query_id", "__e_neighbor_id") / (
        F.col("__n_query_id") * F.col("__n_neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# --- IVF-flat (inverted-file) ANN -------------------------------------------
#
# All fit arithmetic is on QUANT-scaled int64 embeddings: integer sums are
# associative, so the distributed Lloyd recompute is bit-exact regardless of
# partitioning/summation order — the property that makes the codebook
# oracle-able and the fit reproducible across cluster sizes.

_IVF_QUANT = 1024


def _quant_expr(emb_col: str):
    return F.expr(
        f"transform(cast({emb_col} as array<double>),"
        f" x -> cast(round(x * {_IVF_QUANT}) as bigint))"
    )


def _cent_lit(centroids: np.ndarray):
    return F.array(
        *[F.array(*[F.lit(int(x)) for x in row]) for row in centroids]
    )


def _ivf_dists_expr(qe_col: str):
    """array<bigint> squared-L2 distances of qe_col to each __cents row."""
    return F.expr(
        f"transform(__cents, c -> aggregate(zip_with({qe_col}, c,"
        " (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v))"
    )


def _ivf_cluster_expr(dists_col: str):
    """0-based index of the min of a precomputed distance array; ties
    resolve to the lowest index (array_position returns the FIRST
    occurrence). Takes the materialized dists column — inlining the K x d
    distance computation twice (for array_position and array_min) would
    double the dominant per-row cost of assignment."""
    return (
        F.expr(f"array_position({dists_col}, array_min({dists_col}))").cast("int")
        - 1
    )


def ivf_assign(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    centroids: np.ndarray,
    mode: str = "arrow",
) -> DataFrame:
    """Nearest-centroid assignment: (__id, __qe, cluster), ties to the
    lowest cluster index. Default 'arrow' — the scale path; both modes
    are bit-identical (tested), so the oracle contract holds either way.

    mode='catalyst': the zero-Python expression plan (_ivf_dists_expr +
    array_position) — the oracle-replayable path, O(K) array expressions
    per row, right for small codebooks.

    mode='arrow': Arrow-batched NumPy — scores = ||c||^2 - 2 q·c as ONE
    float64 matmul per batch (dropping the row-constant ||q||^2 keeps the
    ordering and the tie pattern). Every product is integral and bounded
    by d * max|q| * max|c| << 2^53 (guarded loudly per batch), so float64
    is EXACT and np.argmin's first-min matches array_position's
    first-occurrence tie-break: both modes are bit-identical (asserted in
    tests). This is THE scale path — SemDeDup-sized codebooks (K in the
    thousands) cost one BLAS matmul instead of K Catalyst array
    aggregates per row. Quantization stays in Catalyst (Spark round is
    HALF_UP; np.round is banker's — computing qe in NumPy would diverge
    on exact halves)."""
    # K distance evaluations per row dominate a compressed narrow scan
    # (CLAUDE.md convention; no-op at real scale)
    from rustiflow_spark.parallelism import ensure_min_parallelism

    q = ensure_min_parallelism(df).select(
        F.col(id_col).alias("__id"), _quant_expr(emb_col).alias("__qe")
    )
    return _assign_qe(q, centroids, mode)


def _assign_qe(q: DataFrame, centroids: np.ndarray, mode: str) -> DataFrame:
    """ivf_assign's core over an already-quantized (__id, __qe) frame —
    shared with ivf_fit's Lloyd passes."""
    if mode == "catalyst":
        return (
            q.withColumn("__cents", _cent_lit(centroids))
            .withColumn("__dists", _ivf_dists_expr("__qe"))
            .select("__id", "__qe", _ivf_cluster_expr("__dists").alias("cluster"))
        )
    if mode != "arrow":
        raise ValueError(f"ivf_assign: unknown mode {mode!r}")
    C = np.asarray(centroids, dtype=np.float64)
    cn = (C * C).sum(axis=1)
    d = C.shape[1]
    cmax = float(np.abs(C).max()) if C.size else 0.0

    def assign(it):
        for pdf in it:
            if len(pdf) == 0:
                pdf["cluster"] = np.array([], dtype="int32")
                yield pdf
                continue
            Q = np.asarray(pdf["__qe"].tolist(), dtype=np.float64)
            qmax = float(np.abs(Q).max()) if Q.size else 0.0
            # exactness guard on the FULL score cn - 2 q.c, not each term:
            # |score| <= d*max|c|^2 + 2*d*max|q|*max|c| must stay < 2^53
            # or integers round-to-even and a one-unit cluster gap can
            # falsely tie (review finding)
            if d * (cmax * cmax + 2.0 * qmax * cmax) >= 2.0**53:
                raise ValueError(
                    "ivf_assign(arrow): quantized magnitudes overflow the"
                    " exact-float64 bound; lower the quantization scale"
                )
            scores = cn - 2.0 * (Q @ C.T)
            pdf = pdf.copy()
            pdf["cluster"] = np.argmin(scores, axis=1).astype("int32")
            yield pdf

    return q.mapInPandas(
        assign, schema="__id long, __qe array<bigint>, cluster int"
    )


def ivf_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_lists: int = 8,
    iters: int = 2,
    seed_ids: list[int] | None = None,
    sample_fraction: float | None = None,
    sample_seed: int = 7,
    assign_mode: str = "arrow",
) -> np.ndarray:
    """Train an IVF codebook: (n_lists, d) int64 centroids in QUANT space.

    Seeds are the corpus vectors with ids `seed_ids` (default: the n_lists
    smallest ids — pass stride-spread ids for better initial coverage; the
    Lloyd iterations wash the seeding out). Each iteration is one
    distributed assign + per-dimension integer sum/count job; only the
    K×d centroid table ever reaches the driver.

    sample_fraction: fit on a Bernoulli sample of the corpus instead of
    every vector — THE scale path at 100 TB (Lloyd passes over a ~0.1-1%
    sample cost 100-1000× less and assignment quality is insensitive to
    the training sample once lists are balanced; recall-vs-exact is
    asserted in tests/test_training_ops.py). Seeds (default or explicit
    seed_ids) are drawn from the sample, so seed_ids must survive it —
    prefer the default seeding with sampled fits. None = full-corpus fit
    (the bit-replayable oracle default).

    assign_mode: 'catalyst' (oracle default) or 'arrow' — at SemDeDup-
    sized K the Catalyst assignment embeds a K x d literal array in the
    plan and pays K array aggregates per row; the Arrow matmul is
    bit-identical (see ivf_assign) and turns each Lloyd pass into one
    BLAS call per batch. Codebooks from the two modes are identical.
    """
    q = corpus.select(
        F.col(id_col).alias("__id"), _quant_expr(emb_col).alias("__qe")
    )
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
        # deterministic hash sampling by id, NOT df.sample(): Bernoulli
        # sample() draws per-PARTITION randoms, so the training set (and
        # therefore the codebook) would change with the scan's partition
        # count — an 8-core and a 32-core run of the same job would fit
        # different centroids (caught by a two-parallelism checksum
        # mismatch). The hash draw is partition- and engine-invariant.
        q = q.where(
            F.pmod(F.xxhash64("__id", F.lit(int(sample_seed))), 1_000_000)
            < int(sample_fraction * 1_000_000)
        )
    # every Lloyd iteration re-reads the training set: persist the
    # quantized projection once instead of re-scanning the source per pass
    # (released in the finally even when seeding or a pass fails).
    # Spread first — the per-row K-distance assignment work would
    # otherwise inherit a compressed narrow scan's few partitions
    from rustiflow_spark.parallelism import ensure_min_parallelism

    q = ensure_min_parallelism(q).persist()
    try:
        if seed_ids is not None:
            seeds = (
                q.filter(F.col("__id").isin([int(s) for s in seed_ids]))
                .orderBy("__id")
                .collect()
            )
        else:
            seeds = q.orderBy("__id").limit(n_lists).collect()
        if len(seeds) != n_lists:
            raise ValueError(
                f"ivf_fit: {len(seeds)} seed vectors found, need exactly"
                f" n_lists={n_lists} (truncate seed_ids explicitly if over)"
            )
        cents = np.array([r["__qe"] for r in seeds], dtype=np.int64)
        for _ in range(iters):
            if assign_mode == "arrow":
                # fused assign + per-batch partial Lloyd stats: the
                # posexplode shape materialized one JVM row per (vector,
                # dimension) just to sum it; here each Arrow batch emits
                # a K x d partial (cluster, pos, sum, count) table —
                # integer sums are associative, so the recompute is
                # bit-identical to the exploded aggregation (the
                # modes-identical pytest pins it)
                stats = _lloyd_stats_arrow(q, cents).collect()
            else:
                assigned = _assign_qe(q, cents, assign_mode).select(
                    F.col("cluster").alias("__cl"),
                    F.posexplode("__qe").alias("__pos", "__val"),
                )
                stats = (
                    assigned.groupBy("__cl", "__pos")
                    .agg(F.sum("__val").alias("s"), F.count("*").alias("n"))
                    .collect()
                )
            new = cents.copy()  # empty cluster keeps its previous centroid
            for r in stats:
                if int(r["n"]) == 0:
                    continue
                # exact integer floor division (n > 0, so // == floor even
                # for negative sums); no 2^53 double-precision cliff
                new[r["__cl"], r["__pos"]] = int(r["s"]) // int(r["n"])
            cents = new
    finally:
        q.unpersist()
    return cents


def _lloyd_stats_arrow(q: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(__cl, __pos, s, n) partial-summed per Arrow batch then reduced —
    one Lloyd recompute job with nothing wider than K x d rows shuffled.
    Assignment math is _assign_qe's exact float64 score (same guard,
    same argmin first-min tie-break); sums accumulate the original
    int64 quantized values, so results are exactly the exploded
    aggregation's."""
    C = np.asarray(centroids, dtype=np.float64)
    cn = (C * C).sum(axis=1)
    K, d = C.shape
    cmax = float(np.abs(C).max()) if C.size else 0.0

    def per_batch(it):
        import pandas as pd

        sums = np.zeros((K, d), dtype=np.int64)
        counts = np.zeros(K, dtype=np.int64)
        for pdf in it:
            if len(pdf) == 0:
                continue
            Qi = np.asarray(pdf["__qe"].tolist(), dtype=np.int64)
            Q = Qi.astype(np.float64)
            qmax = float(np.abs(Q).max()) if Q.size else 0.0
            if d * (cmax * cmax + 2.0 * qmax * cmax) >= 2.0**53:
                raise ValueError(
                    "ivf_fit(arrow): quantized magnitudes overflow the"
                    " exact-float64 bound; lower the quantization scale"
                )
            cl = np.argmin(cn - 2.0 * (Q @ C.T), axis=1)
            for k in range(K):
                m = cl == k
                if m.any():
                    sums[k] += Qi[m].sum(axis=0)
                    counts[k] += int(m.sum())
        yield pd.DataFrame(
            {
                "__cl": np.repeat(np.arange(K), d),
                "__pos": np.tile(np.arange(d), K),
                "s": sums.reshape(-1),
                "n": np.repeat(counts, d),
            }
        )

    partials = q.mapInPandas(
        per_batch, schema="__cl int, __pos int, s long, n long"
    )
    return partials.groupBy("__cl", "__pos").agg(
        F.sum("s").alias("s"), F.sum("n").alias("n")
    )


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    n_lists: int = 8,
    nprobe: int = 2,
    iters: int = 2,
    seed_ids: list[int] | None = None,
    centroids: np.ndarray | None = None,
    broadcast_probes: bool = True,
    fit_sample_fraction: float | None = None,
    assign_mode: str = "arrow",
) -> DataFrame:
    """IVF-flat approximate top-k: probe the nprobe nearest inverted lists.

    Corpus-side work is a map-only broadcast assignment (no shuffle of the
    corpus beyond the final candidate equi-join on the list id); the
    query side explodes into nprobe rows. Candidates = corpus vectors in a
    probed list, scored with exact double cosine and ranked — never N×M.

    broadcast_probes=True (default) is the right plan whenever the query
    batch fits in executor memory: list_id has only n_lists distinct
    values, so a shuffle join on it would pile the corpus onto K reducers.
    Set it False only for huge query batches, and raise n_lists so the
    shuffle key has enough cardinality to spread.
    """
    if centroids is None:
        centroids = ivf_fit(
            corpus, id_col, emb_col, n_lists, iters, seed_ids,
            sample_fraction=fit_sample_fraction, assign_mode=assign_mode,
        )
    # corpus assignment stays an INLINE map-only projection (an
    # ivf_assign + re-join would shuffle the corpus twice); at the K
    # where O(K) Catalyst exprs per row hurt, the PQ / semantic_dedup
    # paths carry the Arrow assignment
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(emb_col).cast("array<double>").alias("__e_n"),
            _quant_expr(emb_col).alias("__qe"),
        )
        .withColumn("__cents", _cent_lit(centroids))
        .withColumn("__dists", _ivf_dists_expr("__qe"))
        .withColumn("list_id", _ivf_cluster_expr("__dists"))
        .drop("__cents", "__qe", "__dists")
    )
    # probe list selection: relational (posexplode + row_number) so ties
    # resolve identically in Spark and any SQL replay — (dist, list idx)
    qd = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).cast("array<double>").alias("__e_q"),
            _quant_expr(emb_col).alias("__qe"),
        )
        .withColumn("__cents", _cent_lit(centroids))
        .select(
            "query_id",
            "__e_q",
            F.posexplode(_ivf_dists_expr("__qe")).alias("list_id", "__dist"),
        )
    )
    wp = Window.partitionBy("query_id").orderBy(F.asc("__dist"), F.asc("list_id"))
    probes = (
        qd.withColumn("__pr", F.row_number().over(wp))
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "__e_q", "list_id")
    )
    if broadcast_probes:
        probes = F.broadcast(probes)
    cands = probes.join(c, "list_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = _dot("__e_q", "__e_n") / (_norm("__e_q") * _norm("__e_n"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def centroid_table(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    scale: int = 1024,
) -> DataFrame:
    """Per-group per-position INTEGER sums of a quantized vector column:
    (group, pos, s, n) — the mergeable form of a class-centroid / profile
    -embedding computation (same design rule as the sketches: integer
    accumulation is order-independent, so shards merge with groupBy-sum
    and two engines agree bit-for-bit).

    pos is 1-based. s = sum over rows of round(vec[pos] * scale); the
    centroid coordinate is s / (n * scale).
    """
    q = df.select(
        F.col(group_col),
        F.expr(
            f"transform(`{vec_col}`, x ->"
            f" cast(round(cast(x as double) * {int(scale)}) as bigint))"
        ).alias("__q"),
    )
    x = q.select(group_col, F.posexplode("__q").alias("__pos0", "__v"))
    return (
        x.groupBy(group_col, (F.col("__pos0") + 1).alias("pos"))
        .agg(F.sum("__v").alias("s"), F.count("*").alias("n"))
    )


def group_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    scale: int = 1024,
) -> DataFrame:
    """Assembled per-group mean vectors (group, n, centroid array<double>)
    from centroid_table — deterministic regardless of row order because
    the accumulation is integral."""
    t = centroid_table(df, group_col, vec_col, scale)
    # per-position n in the struct: ragged-length vectors (or null
    # elements) average over the rows that HAVE the position, not over
    # max(n) (review finding)
    return (
        t.groupBy(group_col)
        .agg(
            F.max("n").alias("n"),
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("s"), F.col("n").alias("np")))
            ).alias("__ps"),
        )
        .select(
            group_col,
            "n",
            F.expr(
                f"transform(__ps, p -> cast(p.s as double)"
                f" / (p.np * {int(scale)}))"
            ).alias("centroid"),
        )
    )


# --- Random projection (sparse Achlioptas), deterministic integer form ---

_RP_M31 = (1 << 31) - 1
_RP_A = 48271


def projection_matrix(in_dim: int, out_dim: int, seed: int = 7) -> list[list[int]]:
    """Deterministic sparse random-projection matrix with entries in
    {-1, 0, +1} at density 1/3 (Achlioptas 2003: such a matrix satisfies
    the JL lemma with the same guarantees as Gaussian entries, at a third
    of the work). Entry (k, j) = md5("seed:k:j") mod 6 — a pure function
    of its arguments that any engine regenerates bit-for-bit (the oracle
    SQL embeds the resulting terms as literals anyway).

    An affine Lehmer mix is NOT usable here: over sequential (k, j)
    inputs it advances by a constant stride, so entries land on a
    lattice and the rows come out nearly parallel (observed: off-diagonal
    Gram entries the size of the diagonal, kNN recall flat in out_dim —
    caught by the recall test). md5 breaks the affine structure."""
    import hashlib

    mat: list[list[int]] = []
    for k in range(out_dim):
        row = []
        for j in range(in_dim):
            h = int.from_bytes(
                hashlib.md5(f"{seed}:{k}:{j}".encode()).digest()[:8], "big"
            )
            r = h % 6
            row.append(1 if r == 0 else (-1 if r == 1 else 0))
        mat.append(row)
    return mat


def random_project(
    df: DataFrame,
    vec_col: str,
    in_dim: int,
    out_dim: int,
    seed: int = 7,
    scale: int = 1024,
    out_col: str = "proj",
) -> DataFrame:
    """Project an embedding column to ``out_dim`` integer components —
    the dimensionality-reduction front end for the ANN family (project,
    then LSH/IVF the short vectors; JL preserves pairwise geometry).

    Exact-arithmetic shape (repo convention): the vector is quantized
    once (round(x*scale) as bigint) and each output component is a ±
    sum of the nonzero-entry positions — pure integer Catalyst
    expressions, zero shuffle, zero Python, bit-replayable by the
    DuckDB oracle. Cosine/ranking users need no rescaling; metric users
    multiply by sqrt(3/out_dim)/scale (Achlioptas variance correction).

    ``in_dim`` must equal the stored vector length: element_at past the
    end raises under ANSI mode (loud, not silently wrong).
    Magnitudes: |component| <= in_dim * scale * max|x| — int64-safe for
    any real embedding."""
    if out_dim <= 0 or in_dim <= 0:
        raise ValueError("random_project: dims must be positive")
    # per-row work is ~in_dim*out_dim/3 integer adds; a compressed
    # small-file scan otherwise serializes it on a couple of tasks
    # (scan partitions are sized by COMPRESSED bytes — decontam.py)
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    mat = projection_matrix(in_dim, out_dim, seed)
    qv = (
        f"transform(`{vec_col}`,"
        f" x -> cast(round(cast(x as double) * {int(scale)}) as bigint))"
    )
    comps = []
    for row in mat:
        terms = [
            f"{'+' if e > 0 else '-'} element_at(__qv, {j + 1})"
            for j, e in enumerate(row)
            if e != 0
        ]
        comps.append(" ".join(terms).lstrip("+ ") if terms else "0L")
    arr = "array(" + ", ".join(f"cast({c} as bigint)" for c in comps) + ")"
    return (
        df.withColumn("__qv", F.expr(qv))
        .withColumn(out_col, F.expr(arr))
        .drop("__qv")
    )


# --- Product quantization (PQ): memory-bound ANN codes --------------------
# The 100-TB ANN memory story: a 64-dim float32 embedding is 256 bytes; its
# PQ code is m bytes (m subspace codebook indices). pq_fit runs the SAME
# integer-quantized Lloyd as ivf_fit once per subspace slice, so codebooks
# inherit every exactness property (order-independent integer recompute,
# lowest-index tie-breaks, deterministic id-hash sampling) and the whole
# fit/encode/score chain is bit-replayable by a SQL oracle.


def pq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    m: int = 4,
    k_codes: int = 16,
    iters: int = 2,
    seed_ids: list[int] | None = None,
    sample_fraction: float | None = None,
    sample_seed: int = 7,
    assign_mode: str = "arrow",
    dim: int | None = None,
) -> np.ndarray:
    """(m, k_codes, d/m) int64 codebooks in QUANT space — one ivf_fit per
    subspace slice. m independent fits keep the oracle replay structurally
    identical to the IVF one; at scale pair with sample_fraction +
    assign_mode='arrow' exactly like ivf_fit."""
    # dim param skips the dimension-probe job (one extra scan otherwise);
    # an empty corpus fails loudly instead of a NoneType subscript
    if dim is None:
        row = corpus.select(emb_col).first()
        if row is None:
            raise ValueError("pq_fit: empty corpus")
        dim = len(row[0])
    d = int(dim)
    if d % m != 0:
        raise ValueError(f"pq_fit: dim {d} not divisible by m={m}")
    dsub = d // m

    def fit_sub(j: int) -> np.ndarray:
        sub = corpus.select(
            F.col(id_col).alias("__sid"),
            F.expr(f"slice(`{emb_col}`, {j * dsub + 1}, {dsub})").alias("__sub"),
        )
        return ivf_fit(
            sub, "__sid", "__sub", n_lists=k_codes, iters=iters,
            seed_ids=seed_ids, sample_fraction=sample_fraction,
            sample_seed=sample_seed, assign_mode=assign_mode,
        )

    # the m subspace fits are independent Lloyd chains: submit them from
    # a thread pool so each fit's small sequential jobs (seed collect +
    # per-iteration stats) back-fill the others' scheduling gaps (guide
    # §2.6 — overlap independent jobs). Results are deterministic per
    # subspace, so concurrency cannot change the codebooks.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(m, 4)) as pool:
        books = list(pool.map(fit_sub, range(m)))
    return np.stack(books)


def _pq_code_expr(qe_col: str, book: np.ndarray, j: int, dsub: int):
    """0-based nearest-centroid index of subspace j's slice of qe_col,
    ties to the lowest code (array_position first-min, the ivf_assign
    convention)."""
    cents = ", ".join(
        "array(" + ", ".join(str(int(x)) + "L" for x in row) + ")"
        for row in book
    )
    sub = f"slice({qe_col}, {j * dsub + 1}, {dsub})"
    dists = (
        f"transform(array({cents}), c -> aggregate(zip_with({sub}, c,"
        " (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v))"
    )
    return F.expr(
        f"CAST(array_position({dists}, array_min({dists})) AS INT) - 1"
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    mode: str = "arrow",
) -> DataFrame:
    """(id, codes array<int> of length m). mode='catalyst' is the
    zero-Python oracle path; 'arrow' does m small exact-float64 matmuls
    per batch (the ivf_assign argument — every product integral and
    < 2^53, np.argmin first-min == array_position tie-break)."""
    m, k_codes, dsub = codebooks.shape
    # m x k distance evaluations per row dominate a compressed narrow
    # scan (CLAUDE.md convention; no-op at real scale)
    from rustiflow_spark.parallelism import ensure_min_parallelism

    q = ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("__id"), _quant_expr(emb_col).alias("__qe")
    )
    if mode == "catalyst":
        return q.select(
            "__id",
            F.array(
                *[_pq_code_expr("__qe", codebooks[j], j, dsub) for j in range(m)]
            ).alias("codes"),
        )
    if mode != "arrow":
        raise ValueError(f"pq_encode: unknown mode {mode!r}")
    C = codebooks.astype(np.float64)
    cn = (C * C).sum(axis=2)  # (m, k)
    cmax = float(np.abs(C).max()) if C.size else 0.0

    def encode(it):
        for pdf in it:
            if len(pdf) == 0:
                pdf["codes"] = []
                yield pdf[["__id", "codes"]]
                continue
            Q = np.asarray(pdf["__qe"].tolist(), dtype=np.float64)
            qmax = float(np.abs(Q).max()) if Q.size else 0.0
            # full-score bound, see ivf_assign
            if dsub * (cmax * cmax + 2.0 * qmax * cmax) >= 2.0**53:
                raise ValueError(
                    "pq_encode(arrow): quantized magnitudes overflow the"
                    " exact-float64 bound; lower the quantization scale"
                )
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                Qj = Q[:, j * dsub : (j + 1) * dsub]
                scores = cn[j] - 2.0 * (Qj @ C[j].T)
                codes[:, j] = np.argmin(scores, axis=1)
            out = pdf[["__id"]].copy()
            out["codes"] = list(codes)
            yield out

    return q.mapInPandas(encode, schema="__id long, codes array<int>").select(
        F.col("__id"), F.col("codes")
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    encode_mode: str = "arrow",
    codes: DataFrame | None = None,
    ivf_centroids: np.ndarray | None = None,
    nprobe: int = 2,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: each query precomputes its
    m x k_codes integer distance table (exact squared L2 of the query
    slice to every centroid), broadcasts it, and every corpus code pays
    m array lookups + an integer sum — the classic memory-bound ADC scan,
    byte-sized codes instead of float vectors. Map-only over the code
    table (no shuffle of the corpus), distributed top-k via
    TakeOrderedAndProject. Exact integers end-to-end, so ranking (dist
    asc, neighbor asc) replays identically in SQL.

    Pass `codes` to reuse a pre-encoded corpus (the deployment shape: the
    code table is written once and scanned per query batch).

    ivf_centroids: IVF-PQ composition — prune the scan to each query's
    nprobe nearest inverted lists (an ivf_fit codebook over the FULL
    vectors) before ADC-scoring, turning the full-corpus scan into an
    equi-join on the list id; with nprobe == n_lists this degrades
    exactly to the full scan (equivalence pytest-asserted). The codes
    table gains a `list_id` column computed by the same ivf_assign the
    flat IVF path uses."""
    m, k_codes, dsub = codebooks.shape
    if codes is None:
        codes = pq_encode(corpus, codebooks, id_col, emb_col, mode=encode_mode)
    if ivf_centroids is not None:
        if "list_id" in codes.columns:
            # pre-encoded deployment shape: the codes table already
            # carries its list assignment — re-deriving it would rescan
            # the raw corpus and collide on the column (round-5 ADVICE)
            pass
        else:
            lists = ivf_assign(
                corpus, id_col, emb_col, ivf_centroids, mode=encode_mode
            ).select("__id", F.col("cluster").alias("list_id"))
            codes = codes.join(lists, "__id")
        qp = (
            queries.select(
                F.col(id_col).alias("query_id"),
                _quant_expr(emb_col).alias("__qe"),
            )
            .withColumn("__cents", _cent_lit(ivf_centroids))
            .select(
                "query_id",
                F.posexplode(_ivf_dists_expr("__qe")).alias("list_id", "__ld"),
            )
        )
        wp = Window.partitionBy("query_id").orderBy(
            F.asc("__ld"), F.asc("list_id")
        )
        probes = (
            qp.withColumn("__pr", F.row_number().over(wp))
            .filter(F.col("__pr") <= nprobe)
            .select("query_id", "list_id")
        )
    tables = []
    for j in range(m):
        cents = ", ".join(
            "array(" + ", ".join(str(int(x)) + "L" for x in row) + ")"
            for row in codebooks[j]
        )
        sub = f"slice(__qe, {j * dsub + 1}, {dsub})"
        tables.append(
            f"transform(array({cents}), c -> aggregate(zip_with({sub}, c,"
            " (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v))"
        )
    qd = queries.select(
        F.col(id_col).alias("query_id"), _quant_expr(emb_col).alias("__qe")
    ).select(
        "query_id", F.expr("array(" + ", ".join(tables) + ")").alias("__dt")
    )
    if ivf_centroids is not None:
        cand = (
            F.broadcast(qd.join(probes, "query_id"))
            .join(
                codes.select(
                    F.col("__id").alias("neighbor_id"), "codes", "list_id"
                ),
                "list_id",
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
    else:
        cand = F.broadcast(qd).join(
            codes.select(F.col("__id").alias("neighbor_id"), "codes"),
            F.col("query_id") != F.col("neighbor_id"),
        )
    adc = F.expr(
        "aggregate(zip_with(codes, __dt,"
        " (c, t) -> element_at(t, c + 1)), 0L, (acc, v) -> acc + v)"
    )
    ranked = (
        cand.withColumn("adc_dist", adc)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.asc("adc_dist"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rank") <= k)
    )
    return ranked.select("query_id", "rank", "neighbor_id", "adc_dist")
