"""Leakage-free encoders (operators/encoding.py) + multi-table PIT join.

Oracles are hand-computed pandas expanding/rank equivalents — the same
strictly-past discipline the contract queries verify against DuckDB.
"""

import numpy as np
import pandas as pd
import pytest

from rustiflow_spark.operators.asof import point_in_time_join
from rustiflow_spark.operators.encoding import (
    quantile_bin,
    target_encode_expanding,
    zscore_normalize,
)


@pytest.fixture(scope="module")
def enc_df(spark):
    rng = np.random.RandomState(7)
    n = 400
    pdf = pd.DataFrame(
        {
            "cat": rng.choice(["a", "b", "c"], n),
            "ts_us": rng.randint(0, 10_000_000, n).astype("int64"),
            "row_id": np.arange(n, dtype="int64"),
            "y": np.round(rng.randn(n) * 10, 3),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_target_encode_expanding_matches_pandas(spark, enc_df):
    df, pdf = enc_df
    out = (
        target_encode_expanding(df, "cat", "y", "ts_us", order_col="row_id")
        .orderBy("row_id")
        .toPandas()
    )
    p = pdf.sort_values(["cat", "ts_us", "row_id"]).copy()
    g = p.groupby("cat")["y"]
    p["exp_n"] = g.cumcount()
    p["exp_mean"] = (
        g.transform(lambda s: s.expanding().mean().shift(1))
    )
    p = p.sort_values("row_id")
    assert out["cat_te_n"].tolist() == p["exp_n"].tolist()
    assert np.allclose(
        out["cat_te"].astype(float), p["exp_mean"].astype(float), equal_nan=True
    )


def test_target_encode_smoothing_and_prior(spark, enc_df):
    df, _ = enc_df
    out = (
        target_encode_expanding(
            df, "cat", "y", "ts_us", order_col="row_id", prior=0.5, smoothing=10.0
        )
        .orderBy("row_id")
        .toPandas()
    )
    # first row of each category has no history -> shrunk fully to prior
    first = out[out["cat_te_n"] == 0]
    assert len(first) == 3
    assert np.allclose(first["cat_te"], 0.5)
    # smoothing requires a prior
    with pytest.raises(ValueError):
        target_encode_expanding(df, "cat", "y", "ts_us", smoothing=5.0)


def test_quantile_bin_equi_depth(spark, enc_df):
    df, pdf = enc_df
    out = (
        quantile_bin(df, "y", 4, by="cat", order_col="row_id")
        .orderBy("row_id")
        .toPandas()
    )
    # each group's bins are equi-depth (sizes differ by at most 1)
    for _, grp in out.groupby("cat"):
        sizes = grp["y_bin"].value_counts()
        assert sizes.max() - sizes.min() <= 1
        # bin order follows value order
        means = grp.groupby("y_bin")["y"].mean()
        assert means.sort_index().is_monotonic_increasing


def test_zscore_normalize_matches_group_stats(spark, enc_df):
    df, pdf = enc_df
    out = zscore_normalize(df, ["y"], by="cat").orderBy("row_id").toPandas()
    p = pdf.sort_values("row_id").copy()
    stats = pdf.groupby("cat")["y"].agg(["mean", lambda s: s.std(ddof=0)])
    stats.columns = ["mean", "std"]
    exp = (p["y"].values - stats.loc[p["cat"], "mean"].values) / stats.loc[
        p["cat"], "std"
    ].values
    assert np.allclose(out["y_z"].astype(float), exp)
    # broadcast join: stats side must be a BroadcastExchange, not a shuffle
    plan = zscore_normalize(df, ["y"], by="cat")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_zscore_zero_variance_group_is_null(spark):
    pdf = pd.DataFrame({"k": ["a"] * 3 + ["b"] * 3, "v": [5.0] * 3 + [1.0, 2.0, 3.0]})
    out = zscore_normalize(spark.createDataFrame(pdf), ["v"], by="k").toPandas()
    assert out[out["k"] == "a"]["v_z"].isna().all()
    assert np.allclose(out[out["k"] == "b"]["v_z"].sort_values(), [-1.224745, 0.0, 1.224745], atol=1e-5)


def test_point_in_time_multi_table(spark):
    spine = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x", "x", "x", "y"],
                "ts_us": [100, 200, 300, 150],
                "row_id": [0, 1, 2, 3],
            }
        )
    )
    t1 = spark.createDataFrame(
        pd.DataFrame({"k": ["x", "x"], "ts_us": [90, 250], "f1": [1.0, 2.0]})
    )
    t2 = spark.createDataFrame(
        pd.DataFrame({"k": ["x", "y"], "ts_us": [200, 100], "f2": [7.0, 9.0]})
    )
    out = (
        point_in_time_join(spine, [(t1, "_a"), (t2, "_b")], by="k")
        .orderBy("row_id")
        .toPandas()
    )
    assert out["f1_a"].tolist()[0:3] == [1.0, 1.0, 2.0]
    assert pd.isna(out["f1_a"].iloc[3])
    # exact-timestamp match included (ts 200 sees t2@200)
    assert out["f2_b"].tolist()[1] == 7.0
    assert pd.isna(out["f2_b"].iloc[0])
    assert out["f2_b"].iloc[3] == 9.0


def test_target_encode_split_matches_plain(spark, enc_df):
    from rustiflow_spark.operators.encoding import target_encode_expanding_split

    df, _ = enc_df
    dfi = df.withColumn("yi", (df["y"] * 1000).cast("long"))
    plain = (
        target_encode_expanding(dfi, "cat", "yi", "ts_us", order_col="row_id")
        .orderBy("row_id")
        .toPandas()
    )
    for chunk in (1_000_000, 200_000, 37):  # several rows, few rows, ~1 row per chunk
        split = (
            target_encode_expanding_split(
                dfi, "cat", "yi", "ts_us", chunk_us=chunk, order_col="row_id"
            )
            .orderBy("row_id")
            .toPandas()
        )
        assert split["cat_te_n"].tolist() == plain["cat_te_n"].tolist(), chunk
        assert np.allclose(
            split["cat_te"].astype(float),
            plain["cat_te"].astype(float),
            equal_nan=True,
        ), chunk


def test_target_encode_split_rejects_bad_chunk(spark, enc_df):
    from rustiflow_spark.operators.encoding import target_encode_expanding_split

    df, _ = enc_df
    with pytest.raises(ValueError):
        target_encode_expanding_split(df, "cat", "y", "ts_us", chunk_us=0)


def test_point_in_time_single_pass_equals_chained(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    n = 500
    spine = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": rng.randint(0, 20, n),
                "ts_us": rng.randint(0, 300, n).astype("int64"),
                "row_id": np.arange(n, dtype="int64"),
            }
        )
    )
    dims = []
    for i in range(3):
        m = 120
        dims.append(
            (
                spark.createDataFrame(
                    pd.DataFrame(
                        {
                            "k": rng.randint(0, 20, m),
                            "ts_us": rng.randint(0, 300, m).astype("int64"),
                            f"f{i}": rng.randint(0, 1000, m).astype("int64"),
                        }
                    )
                ),
                f"_d{i}",
            )
        )
    a = (
        point_in_time_join(spine, dims, by="k", strategy="single_pass")
        .orderBy("row_id")
        .toPandas()
    )
    b = (
        point_in_time_join(spine, dims, by="k", strategy="chained")
        .orderBy("row_id")
        .toPandas()
    )
    assert sorted(a.columns) == sorted(b.columns)
    for c in sorted(a.columns):
        av, bv = a[c], b[c]
        assert (av.isna() == bv.isna()).all(), c
        assert (av.dropna().values == bv.dropna().values).all(), c
    # single pass = exactly one window shuffle for all 3 tables
    plan = (
        point_in_time_join(spine, dims, by="k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_quantile_bin_split_matches_plain(spark, enc_df):
    from rustiflow_spark.operators.encoding import quantile_bin_split

    df, _ = enc_df
    plain = (
        quantile_bin(df, "y", 7, by="cat", order_col="row_id")
        .orderBy("row_id")
        .toPandas()
    )
    for chunks in (64, 3, 1):
        split = (
            quantile_bin_split(
                df, "y", 7, by="cat", order_col="row_id", n_chunks=chunks
            )
            .orderBy("row_id")
            .toPandas()
        )
        assert split["y_bin"].tolist() == plain["y_bin"].tolist(), chunks


def test_quantile_bin_split_ties_and_small_groups(spark):
    import numpy as np

    from rustiflow_spark.operators.encoding import quantile_bin_split

    # massive ties (3 distinct values), plus a group smaller than n_bins
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 90 + ["b"] * 3,
            "v": ([1.0] * 30 + [2.0] * 30 + [3.0] * 30) + [5.0, 5.0, 9.0],
            "i": np.arange(93, dtype="int64"),
        }
    )
    df = spark.createDataFrame(pdf)
    plain = (
        quantile_bin(df, "v", 8, by="g", order_col="i").orderBy("i").toPandas()
    )
    split = (
        quantile_bin_split(df, "v", 8, by="g", order_col="i", n_chunks=16)
        .orderBy("i")
        .toPandas()
    )
    assert split["v_bin"].tolist() == plain["v_bin"].tolist()


def test_quantile_bin_split_nulls_match_plain(spark):
    """NULL values: ntile sorts them FIRST; the split path must pin them
    to chunk 0 and count them in __t (review finding: least() skipped
    the null arithmetic and emitted out-of-range bins)."""
    import numpy as np

    from rustiflow_spark.operators.encoding import quantile_bin_split

    pdf = pd.DataFrame(
        {
            "g": ["a"] * 10,
            "v": [1.0, 2.0, 3.0, 4.0, None, 6.0, 7.0, None, 9.0, 10.0],
            "i": np.arange(10, dtype="int64"),
        }
    )
    df = spark.createDataFrame(pdf)
    plain = quantile_bin(df, "v", 4, by="g", order_col="i").orderBy("i").toPandas()
    split = (
        quantile_bin_split(df, "v", 4, by="g", order_col="i", n_chunks=4)
        .orderBy("i")
        .toPandas()
    )
    assert split["v_bin"].tolist() == plain["v_bin"].tolist()
    assert split["v_bin"].max() <= 4


def test_robust_scale_hand_computed(spark):
    from rustiflow_spark.operators.encoding import robust_scale

    pdf = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 4,
            "v": [1.0, 2.0, 3.0, 4.0, 100.0, 5.0, 5.0, 5.0, 9.0],
            "i": np.arange(9, dtype="int64"),
        }
    )
    got = (
        robust_scale(spark.createDataFrame(pdf), "v", "g", "i")
        .orderBy("i")
        .toPandas()
    )
    # group a (n=5): sorted 1,2,3,4,100 -> lower med (rank 3) = 3
    # |x-3| = 2,1,0,1,97 sorted 0,1,1,2,97 -> MAD (rank 3) = 1
    exp_a = [(x - 3.0) / 1.0 for x in [1.0, 2.0, 3.0, 4.0, 100.0]]
    # group b (n=4): sorted 5,5,5,9 -> lower med (rank 2) = 5
    # |x-5| = 0,0,0,4 -> MAD (rank 2) = 0 -> NULL scaling
    a = got[got["g"] == "a"]["v_robust"].tolist()
    b = got[got["g"] == "b"]["v_robust"].tolist()
    assert a == exp_a
    assert all(pd.isna(x) for x in b)
    # the outlier moved neither median nor MAD: scaling of the inliers
    # is untouched by the 100.0 (the point of robust vs zscore)
    assert a[:4] == [-2.0, -1.0, 0.0, 1.0]


def test_robust_scale_partition_invariant(spark):
    from rustiflow_spark.operators.encoding import robust_scale

    rng = np.random.default_rng(12)
    pdf = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], size=500),
            "v": rng.normal(size=500),
            "i": np.arange(500, dtype="int64"),
        }
    )
    a = (
        robust_scale(spark.createDataFrame(pdf).repartition(1), "v", "g", "i")
        .orderBy("i")
        .toPandas()["v_robust"]
    )
    b = (
        robust_scale(spark.createDataFrame(pdf).repartition(16), "v", "g", "i")
        .orderBy("i")
        .toPandas()["v_robust"]
    )
    assert a.tolist() == b.tolist()
