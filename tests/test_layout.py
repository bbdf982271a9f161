"""Bucketed-table layout: the write-once shuffle for repeated joins.

The plan assertions are the point — two tables bucketed on the same key
and count must sort-merge-join with NO Exchange on either side (and no
Sort when sortBy matched), while the same join over plain parquet plans
two Exchanges. Values must be identical either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rustiflow_spark.operators.layout import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    facts = spark.range(50_000).select(
        F.pmod(F.col("id"), F.lit(997)).alias("user_id"),
        (F.col("id") % 31).cast("double").alias("v"),
    )
    dims = spark.range(997).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("grp"), (F.col("id") % 7).cast("string")).alias("grp"),
    )
    spark.sql("DROP TABLE IF EXISTS bk_facts")
    spark.sql("DROP TABLE IF EXISTS bk_dims")
    write_bucketed(
        facts, "bk_facts", ["user_id"], 8,
        sort_cols=["user_id"], path=str(base / "facts"),
    )
    write_bucketed(
        dims, "bk_dims", ["user_id"], 8,
        sort_cols=["user_id"], path=str(base / "dims"),
    )
    facts.write.mode("overwrite").parquet(str(base / "facts_plain"))
    dims.write.mode("overwrite").parquet(str(base / "dims_plain"))
    yield {"base": base, "facts": facts, "dims": dims}
    spark.sql("DROP TABLE IF EXISTS bk_facts")
    spark.sql("DROP TABLE IF EXISTS bk_dims")


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_shuffle(spark, tables):
    joined = colocated_join(spark, "bk_facts", "bk_dims", ["user_id"])
    plan = _executed(joined)
    assert "Exchange" not in plan, plan[:3000]
    assert "SortMergeJoin" in plan, plan[:3000]

    # the same join over plain parquet shuffles both sides
    base = tables["base"]
    pf = spark.read.parquet(str(base / "facts_plain")).hint("merge")
    pdm = spark.read.parquet(str(base / "dims_plain")).hint("merge")
    plain_plan = _executed(pf.join(pdm, ["user_id"]))
    assert plain_plan.count("Exchange") >= 2

    # identical values either way
    a = (
        joined.groupBy("grp").agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .orderBy("grp").collect()
    )
    b = (
        spark.read.parquet(str(base / "facts_plain"))
        .join(spark.read.parquet(str(base / "dims_plain")), ["user_id"])
        .groupBy("grp").agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .orderBy("grp").collect()
    )
    assert a == b


def test_bucketed_groupby_no_shuffle(spark, tables):
    """Aggregation on the bucket key also rides the bucket layout: no
    Exchange before the final aggregate."""
    agg = spark.table("bk_facts").groupBy("user_id").agg(F.sum("v").alias("s"))
    plan = _executed(agg)
    assert "Exchange" not in plan, plan[:3000]


def test_salted_join_matches_plain(spark):
    """salted_join (all-salt and hot-key-targeted) must equal the plain
    join exactly for inner and left, including unmatched left rows."""
    from rustiflow_spark.operators.skew import salted_join

    facts = spark.range(20_000).select(
        # one mega-hot key (0) plus a long tail, and keys 900+ miss the dim
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(1000)))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(900).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("attr")
    )
    hot = spark.createDataFrame([(0,)], ["k"])

    def canon(df):
        return sorted(map(tuple, df.select("k", "v", "attr").collect()))

    for how in ("inner", "left"):
        plain = canon(facts.join(dim, ["k"], how))
        assert canon(salted_join(facts, dim, ["k"], n_salts=8, how=how)) == plain
        assert (
            canon(salted_join(facts, dim, ["k"], n_salts=8, hot_keys=hot, how=how))
            == plain
        )

    with pytest.raises(ValueError):
        salted_join(facts, dim, ["k"], how="full")
