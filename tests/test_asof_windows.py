"""As-of join, window features, checkpoint/resume: correctness + zero
temporal leakage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rustiflow_spark.operators.asof import asof_join, asof_join_kernel
from rustiflow_spark.operators.windows import (
    add_lag_lead_features,
    forward_fill,
    rolling_time_features,
)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(0)
    n_l, n_r = 400, 150
    left = pd.DataFrame(
        {
            "entity": rng.randint(0, 12, n_l),
            "ts_us": rng.randint(0, 10_000_000, n_l).astype(np.int64),
            "x": rng.randn(n_l).round(4),
            "row_id": np.arange(n_l, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "entity": rng.randint(0, 12, n_r),
            "ts_us": rng.randint(0, 10_000_000, n_r).astype(np.int64),
            "y": rng.randn(n_r).round(4),
        }
    ).drop_duplicates(["entity", "ts_us"])
    return left, right


def pandas_asof(left, right, direction="backward", tolerance=None):
    out = []
    for e, lt in left.groupby("entity"):
        rt = right[right["entity"] == e].sort_values("ts_us")
        lt = lt.sort_values("ts_us")
        m = pd.merge_asof(
            lt,
            rt[["ts_us", "y"]].rename(columns={"ts_us": "rts"}),
            left_on="ts_us",
            right_on="rts",
            direction=direction,
            tolerance=tolerance,
        )
        out.append(m)
    return pd.concat(out).sort_values("row_id").reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas(spark, frames, direction):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            by="entity",
            direction=direction,
        )
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    exp = pandas_asof(left, right, direction)
    assert np.allclose(
        got["y_r"].astype(float), exp["y"].astype(float), equal_nan=True
    )
    assert np.array_equal(
        got["ts_us_r"].fillna(-1).astype(np.int64),
        exp["rts"].fillna(-1).astype(np.int64),
    )


def test_asof_join_tolerance(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            by="entity",
            tolerance_us=500_000,
        )
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    exp = pandas_asof(left, right, tolerance=500_000)
    assert np.allclose(got["y_r"].astype(float), exp["y"].astype(float), equal_nan=True)


def test_asof_kernel_matches_catalyst(spark, frames):
    left, right = frames
    a = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right), by="entity")
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    b = (
        asof_join_kernel(
            spark.createDataFrame(left), spark.createDataFrame(right), by="entity"
        )
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    assert np.allclose(a["y_r"].astype(float), b["y_r"].astype(float), equal_nan=True)


def test_asof_no_temporal_leakage(spark, frames):
    """Backward as-of output must be invariant when future right rows are
    dropped: for each left row, deleting right rows with ts > left.ts must
    not change its match (north-rule leakage test)."""
    left, right = frames
    cutoff = 5_000_000
    l_cut = left[left["ts_us"] <= cutoff]
    full = (
        asof_join(spark.createDataFrame(l_cut), spark.createDataFrame(right), by="entity")
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    trimmed_right = right[right["ts_us"] <= cutoff]
    trimmed = (
        asof_join(
            spark.createDataFrame(l_cut), spark.createDataFrame(trimmed_right), by="entity"
        )
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    assert np.allclose(
        full["y_r"].astype(float), trimmed["y_r"].astype(float), equal_nan=True
    )


def test_lag_lead_and_leakage(spark, frames):
    left, _ = frames
    sdf = spark.createDataFrame(left)
    out = add_lag_lead_features(
        sdf, ["entity"], "ts_us", ["x"], lags=[1, 2], leads=[1], order_col="row_id"
    ).toPandas()
    # reference via pandas
    pdf = left.sort_values(["entity", "ts_us", "row_id"])
    exp_lag1 = pdf.groupby("entity")["x"].shift(1)
    exp = pdf.assign(x_lag1=exp_lag1).sort_values("row_id")
    got = out.sort_values("row_id")
    assert np.allclose(
        got["x_lag1"].astype(float).to_numpy(),
        exp["x_lag1"].astype(float).to_numpy(),
        equal_nan=True,
    )
    # leakage: lag features unchanged when future rows (per entity) removed
    cutoff = 5_000_000
    kept = left[left["ts_us"] <= cutoff]
    trimmed = add_lag_lead_features(
        spark.createDataFrame(kept), ["entity"], "ts_us", ["x"], lags=[1, 2],
        order_col="row_id",
    ).toPandas()
    joined = got[got["ts_us"] <= cutoff].merge(
        trimmed[["row_id", "x_lag1", "x_lag2"]], on="row_id", suffixes=("", "_t")
    )
    assert np.allclose(
        joined["x_lag1"].astype(float),
        joined["x_lag1_t"].astype(float),
        equal_nan=True,
    )


def test_forward_fill(spark):
    pdf = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2],
            "ts_us": [1, 2, 3, 4, 1, 2],
            "v": [10.0, None, None, 20.0, None, 5.0],
        }
    )
    out = (
        forward_fill(spark.createDataFrame(pdf), ["k"], "ts_us", ["v"])
        .toPandas()
        .sort_values(["k", "ts_us"])
    )
    assert out["v_ffill"].tolist()[:4] == [10.0, 10.0, 10.0, 20.0]
    assert pd.isna(out["v_ffill"].tolist()[4])
    assert out["v_ffill"].tolist()[5] == 5.0


def test_rolling_time_features(spark, frames):
    left, _ = frames
    out = rolling_time_features(
        spark.createDataFrame(left), ["entity"], "ts_us", "x", {"1s": 1_000_000}
    ).toPandas()
    # brute-force check on a sample
    sample = out.sample(30, random_state=1)
    for _, r in sample.iterrows():
        mask = (
            (left["entity"] == r["entity"])
            & (left["ts_us"] >= r["ts_us"] - 1_000_000)
            & (left["ts_us"] <= r["ts_us"])
        )
        assert r["x_cnt_1s"] == mask.sum()
        assert np.isclose(r["x_sum_1s"], left.loc[mask, "x"].sum())


def test_checkpoint_resume(spark, tmp_path):
    from rustiflow_spark.checkpoint import read_output, run_with_checkpoints

    pdf = pd.DataFrame(
        {
            "k": [f"k{i % 7}" for i in range(100)],
            "v": np.arange(100, dtype=np.int64),
        }
    )
    sdf = spark.createDataFrame(pdf)
    out_path = str(tmp_path / "ckpt")

    def process(df):
        from pyspark.sql import functions as F

        return df.groupBy("k").agg(F.sum("v").alias("v_sum"))

    s1 = run_with_checkpoints(sdf, ["k"], out_path, process, n_buckets=4, input_fingerprint="fp1")
    assert s1["completed"] == 4 and s1["skipped"] == 0
    # resume: everything skipped
    s2 = run_with_checkpoints(sdf, ["k"], out_path, process, n_buckets=4, input_fingerprint="fp1")
    assert s2["completed"] == 0 and s2["skipped"] == 4
    # changed input fingerprint: reprocess
    s3 = run_with_checkpoints(sdf, ["k"], out_path, process, n_buckets=4, input_fingerprint="fp2")
    assert s3["completed"] == 4
    res = read_output(spark, out_path).toPandas()
    exp = pdf.groupby("k")["v"].sum()
    got = res.set_index("k")["v_sum"]
    assert all(got[k] == exp[k] for k in exp.index)


def test_forward_fill_split_matches_plain(spark):
    import numpy as np

    from rustiflow_spark.operators.windows import forward_fill_split

    rng = np.random.RandomState(13)
    n = 500
    pdf = pd.DataFrame(
        {
            "k": rng.randint(0, 6, n),
            "ts_us": rng.randint(0, 100_000, n).astype("int64"),
            "seq": np.arange(n, dtype="int64"),
            "v": np.where(rng.rand(n) < 0.4, np.nan, rng.randn(n).round(3)),
        }
    )
    df = spark.createDataFrame(pdf)
    plain = (
        forward_fill(df, ["k"], "ts_us", ["v"], order_col="seq")
        .orderBy("seq")
        .toPandas()
    )
    for chunk in (1_000_000, 7_000, 13):
        split = (
            forward_fill_split(
                df, ["k"], "ts_us", ["v"], chunk_us=chunk, order_col="seq"
            )
            .orderBy("seq")
            .toPandas()
        )
        a, b = split["v_ffill"], plain["v_ffill"]
        assert (a.isna() == b.isna()).all(), chunk
        assert np.allclose(a.dropna(), b.dropna()), chunk
    import pytest as _pt

    with _pt.raises(ValueError):
        forward_fill_split(df, ["k"], "ts_us", ["v"], chunk_us=0)
