"""Point-in-time (as-of) join — leakage-free temporal feature enrichment.

The reference engine has no joins (SURVEY.md §2.6); the north rule requires
a true as-of join over (entity, timestamp). The primary implementation here
is deliberately NOT a pandas merge_asof kernel: a backward as-of join is
expressible as a union + ordered window `last(..., ignorenulls)` — pure
Catalyst, whole-stage codegen, one shuffle, and AQE-skew-splittable, which
beats shipping both sides through Arrow at 100 TB. The plan:

    right' = right rows tagged 0, payload packed into one struct column
    left'  = left rows tagged 1, payload null
    union  -> window over (by) ordered by (ts, tag, payload):
              last(payload, ignorenulls=True)  [backward-looking only]
    filter tag=1 -> unpack struct

    The payload struct in the ordering makes ties on (key, ts) among right
    rows deterministic (greatest payload wins) across runs and partitionings.

Leakage-freedom is structural: the window is ROWS UNBOUNDED PRECEDING..
CURRENT ROW, and right rows at ts == left ts sort before left rows
(allow_exact_matches semantics of pandas.merge_asof / DuckDB ASOF JOIN).

A pandas-kernel variant (asof_join_kernel) is provided for the 'nearest'
direction and as a cross-check; it co-partitions by entity and runs
pd.merge_asof per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _has_map(dt) -> bool:
    """True if the datatype (or any nested field) is a MapType — structs
    containing maps are not orderable in Spark, so they fall out of the
    deterministic payload tiebreak in both as-of implementations."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.StructType):
        return any(_has_map(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _has_map(dt.elementType)
    return False



def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    left_ts: str = "ts_us",
    right_ts: str = "ts_us",
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward/forward as-of join: each left row gets the most recent
    (direction='backward') or next (direction='forward') right row per key.

    Right payload columns are suffixed. Exact-timestamp matches are included
    (pandas merge_asof allow_exact_matches=True semantics).
    """
    by = [by] if isinstance(by, str) else list(by)
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    # Built from SQL strings end-to-end: one py4j round trip per
    # expression instead of a Column-constructor call per node (~0.3 s of
    # driver-side plan-construction latency on wide payloads, BENCH.md
    # round 3).
    payload_cols = [c for c in right.columns if c not in by and c != right_ts]
    payload = "struct(" + ", ".join(
        [f"`{right_ts}` as __asof_ts"] + [f"`{c}`" for c in payload_cols]
    ) + ")"

    r = right.selectExpr(
        *[f"`{c}`" for c in by],
        f"`{right_ts}` as __ts",
        "0 as __tag",
        f"{payload} as __payload",
    )
    left_cols = left.columns
    payload_ddl = r.schema["__payload"].dataType.simpleString()
    nonkey = [c for c in left_cols if c not in by]
    l = left.selectExpr(
        *[f"`{c}`" for c in by],
        f"`{left_ts}` as __ts",
        "1 as __tag",
        f"cast(null as {payload_ddl}) as __payload",
        *[f"`{c}`" for c in nonkey],
    )
    r = r.selectExpr(
        *[f"`{c}`" for c in by],
        "__ts",
        "__tag",
        "__payload",
        *[
            f"cast(null as {left.schema[c].dataType.simpleString()}) as `{c}`"
            for c in nonkey
        ],
    )
    unioned = l.unionByName(r)

    # Deterministic tiebreak for multiple right rows at the same (key, ts):
    # order by the payload struct itself, so the greatest payload wins
    # regardless of partitioning/run (left rows are separated by __tag
    # first, so their null payload never participates). Structs containing
    # maps are not orderable in Spark — those fall back to tag-only order.
    tie = ", __payload ASC" if not _has_map(r.schema["__payload"].dataType) else ""
    kq = ", ".join(f"`{c}`" for c in by)
    ts_dir = "ASC" if direction == "backward" else "DESC"
    matched = unioned.selectExpr(
        "*",
        f"last(__payload, true) OVER (PARTITION BY {kq} "
        f"ORDER BY __ts {ts_dir}, __tag ASC{tie} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as __match",
    )
    out = matched.where("__tag = 1")

    if tolerance_us is not None:
        delta = (
            "__ts - __match.__asof_ts"
            if direction == "backward"
            else "__match.__asof_ts - __ts"
        )
        out = out.withColumn(
            "__match",
            F.expr(f"case when {delta} <= {int(tolerance_us)}L then __match end"),
        )

    return out.selectExpr(
        *[f"`{c}`" for c in left_cols],
        f"__match.__asof_ts as `{right_ts}{suffix}`",
        *[f"__match.`{c}` as `{c}{suffix}`" for c in payload_cols],
    )


def point_in_time_join(
    spine: DataFrame,
    tables: list[tuple[DataFrame, str]],
    by: str | list[str],
    spine_ts: str = "ts_us",
    right_ts: str = "ts_us",
    tolerance_us: int | None = None,
    strategy: str = "single_pass",
) -> DataFrame:
    """Point-in-time enrichment of an (entity, timestamp) spine against
    several feature tables — the feature-store "PIT join" (north rule).

    Each (table, suffix) pair contributes its most recent row at or before
    the spine timestamp per entity, leakage-free.

    strategy='single_pass' (default): union ALL K tables with the spine,
    one payload struct column per table, and compute K last(...,
    ignorenulls) functions over ONE ordered window — a single shuffle for
    the whole enrichment regardless of K. strategy='chained' is the K
    independent as-of passes (one shuffle each); semantics are identical
    (same deterministic greatest-payload tiebreak per table), and the
    equivalence is pytest-asserted.
    """
    if strategy == "chained":
        out = spine
        for tbl, suffix in tables:
            out = asof_join(
                out,
                tbl,
                by=by,
                left_ts=spine_ts,
                right_ts=right_ts,
                tolerance_us=tolerance_us,
                suffix=suffix,
            )
        return out
    if strategy != "single_pass":
        raise ValueError("strategy must be 'single_pass' or 'chained'")

    by = [by] if isinstance(by, str) else list(by)
    k = len(tables)
    payload_cols: list[list[str]] = []
    dims: list[DataFrame] = []
    payload_ddls: list[str] = []
    for tbl, _suffix in tables:
        pcols = [c for c in tbl.columns if c not in by and c != right_ts]
        payload_cols.append(pcols)
        payload = "struct(" + ", ".join(
            [f"`{right_ts}` as __asof_ts"] + [f"`{c}`" for c in pcols]
        ) + ")"
        d = tbl.selectExpr(
            *[f"`{c}`" for c in by],
            f"`{right_ts}` as __ts",
            "0 as __tag",
            f"{payload} as __p",
        )
        dims.append(d)
        payload_ddls.append(d.schema["__p"].dataType.simpleString())

    spine_nonkey = [c for c in spine.columns if c not in by]
    # spine: all payloads null, own columns carried
    l = spine.selectExpr(
        *[f"`{c}`" for c in by],
        f"`{spine_ts}` as __ts",
        "1 as __tag",
        *[f"cast(null as {payload_ddls[i]}) as __p_{i}" for i in range(k)],
        *[f"`{c}`" for c in spine_nonkey],
    )
    # dim i: its payload in __p_i, null elsewhere, spine columns null
    parts = [l]
    for i, d in enumerate(dims):
        parts.append(
            d.selectExpr(
                *[f"`{c}`" for c in by],
                "__ts",
                "__tag",
                *[
                    (f"__p as __p_{j}" if j == i
                     else f"cast(null as {payload_ddls[j]}) as __p_{j}")
                    for j in range(k)
                ],
                *[
                    f"cast(null as {spine.schema[c].dataType.simpleString()})"
                    f" as `{c}`"
                    for c in spine_nonkey
                ],
            )
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)

    # deterministic tiebreak among same-table rows at equal (key, ts):
    # order by every orderable payload column (rows of table i differ only
    # in __p_i; the other payload columns are null-equal there)
    ties = ", ".join(
        f"__p_{i} ASC"
        for i, d in enumerate(dims)
        if not _has_map(d.schema["__p"].dataType)
    )
    tie = f", {ties}" if ties else ""
    kq = ", ".join(f"`{c}`" for c in by)
    lasts = [
        f"last(__p_{i}, true) OVER (PARTITION BY {kq} "
        f"ORDER BY __ts ASC, __tag ASC{tie} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as __m_{i}"
        for i in range(k)
    ]
    matched = unioned.selectExpr("*", *lasts).where("__tag = 1")

    out_cols = [f"`{c}`" for c in spine.columns]
    for i, (_tbl, suffix) in enumerate(tables):
        m = f"__m_{i}"
        if tolerance_us is not None:
            matched = matched.withColumn(
                m,
                F.expr(
                    f"case when __ts - {m}.__asof_ts <= {int(tolerance_us)}L "
                    f"then {m} end"
                ),
            )
        out_cols.append(f"{m}.__asof_ts as `{right_ts}{suffix}`")
        out_cols.extend(
            f"{m}.`{c}` as `{c}{suffix}`" for c in payload_cols[i]
        )
    return matched.selectExpr(*out_cols)


def asof_join_kernel(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    left_ts: str = "ts_us",
    right_ts: str = "ts_us",
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """pandas merge_asof variant over co-partitioned entity groups.

    Supports direction='nearest' in addition to backward/forward. Used as a
    cross-check of the Catalyst path and for nearest-match semantics the
    union-window trick can't express.
    """
    import pandas as pd
    from pyspark.sql import types as T

    by = [by] if isinstance(by, str) else list(by)
    payload_cols = [c for c in right.columns if c not in by and c != right_ts]
    out_fields = list(left.schema.fields)
    out_fields.append(T.StructField(f"{right_ts}{suffix}", T.LongType()))
    for c in payload_cols:
        out_fields.append(
            T.StructField(f"{c}{suffix}", right.schema[c].dataType)
        )
    schema = T.StructType(out_fields)
    left_cols = left.columns

    l = left.withColumn("__side", F.lit(1))
    r = right.select(
        *by,
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    ).withColumn("__side", F.lit(0))
    cog = l.unionByName(r, allowMissingColumns=True)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        lt = pdf[pdf["__side"] == 1][left_cols + [left_ts] if left_ts not in left_cols else left_cols].copy()
        rt = pdf[pdf["__side"] == 0][["__rts"] + [f"__p_{c}" for c in payload_cols]].copy()
        if not len(lt):
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        lt = lt.sort_values(left_ts, kind="mergesort")
        rt = rt.sort_values("__rts", kind="mergesort")
        merged = pd.merge_asof(
            lt,
            rt.rename(columns={"__rts": left_ts + "__r"}),
            left_on=left_ts,
            right_on=left_ts + "__r",
            direction=direction,
            tolerance=tolerance_us,
        )
        merged = merged.rename(columns={left_ts + "__r": f"{right_ts}{suffix}"})
        for c in payload_cols:
            merged = merged.rename(columns={f"__p_{c}": f"{c}{suffix}"})
        return merged[[f.name for f in schema.fields]]

    return cog.groupBy(*by).applyInPandas(run, schema=schema)
