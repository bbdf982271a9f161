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

    payload_cols = [c for c in right.columns if c not in by and c != right_ts]
    payload = F.struct(
        F.col(right_ts).alias("__asof_ts"), *[F.col(c) for c in payload_cols]
    )

    r = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        payload.alias("__payload"),
    )
    left_cols = left.columns
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    # align schemas for union
    l = l.select(*by, "__ts", "__tag", "__payload", *[c for c in left_cols if c not in by])
    r = r.select(*by, "__ts", "__tag", "__payload", *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in by])
    unioned = l.unionByName(r)

    # Deterministic tiebreak for multiple right rows at the same (key, ts):
    # order by the payload struct itself, so the greatest payload wins
    # regardless of partitioning/run (left rows are separated by __tag
    # first, so their null payload never participates). Structs containing
    # maps are not orderable in Spark — those fall back to tag-only order.
    from pyspark.sql import types as T

    def _has_map(dt: T.DataType) -> bool:
        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return _has_map(dt.elementType)
        return False

    orderable = not _has_map(r.schema["__payload"].dataType)
    tie = [F.asc("__payload")] if orderable else []
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.asc("__ts"), F.asc("__tag"), *tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.desc("__ts"), F.asc("__tag"), *tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = matched.filter(F.col("__tag") == 1)

    if tolerance_us is not None:
        delta = (
            F.col("__ts") - F.col("__match.__asof_ts")
            if direction == "backward"
            else F.col("__match.__asof_ts") - F.col("__ts")
        )
        out = out.withColumn(
            "__match", F.when(delta <= F.lit(tolerance_us), F.col("__match"))
        )

    sel = [F.col(c) for c in left_cols]
    sel.append(F.col("__match.__asof_ts").alias(f"{right_ts}{suffix}"))
    for c in payload_cols:
        sel.append(F.col(f"__match.{c}").alias(f"{c}{suffix}"))
    return out.select(*sel)


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
