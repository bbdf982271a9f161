"""quota_sample + temporal_split (operators/sampling.py)."""
import numpy as np
import pandas as pd
import pytest

from rustiflow_spark.operators.sampling import quota_sample, temporal_split


@pytest.fixture(scope="module")
def strata(spark):
    rng = np.random.default_rng(5)
    n = 2000
    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype="int64"),
            "src": rng.choice(["big", "mid", "tiny"], p=[0.8, 0.18, 0.02], size=n),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_quota_exact_counts(strata):
    df, pdf = strata
    got = quota_sample(df, "src", "id", quota=50).toPandas()
    sizes = pdf.groupby("src").size()
    kept = got.groupby("src").size()
    for s in sizes.index:
        assert kept.get(s, 0) == min(50, sizes[s])


def test_quota_partition_invariant_and_deterministic(strata):
    df, _ = strata
    a = set(quota_sample(df.repartition(1), "src", "id", 30).toPandas()["id"])
    b = set(quota_sample(df.repartition(16), "src", "id", 30).toPandas()["id"])
    c = set(quota_sample(df, "src", "id", 30).toPandas()["id"])
    assert a == b == c
    d = set(quota_sample(df, "src", "id", 30, seed=99).toPandas()["id"])
    assert d != a  # different seed, different draw


def test_quota_rank_col_and_errors(strata):
    df, _ = strata
    got = quota_sample(df, "src", "id", 10, rank_col="r").toPandas()
    assert got.groupby("src")["r"].max().le(10).all()
    assert got.groupby("src")["r"].min().eq(1).all()
    with pytest.raises(ValueError):
        quota_sample(df, "src", "id", 0)


def test_temporal_split_embargo_boundaries(spark):
    pdf = pd.DataFrame({"ts": [10, 20, 21, 30, 31], "v": range(5)})
    df = spark.createDataFrame(pdf)
    got = (
        temporal_split(df, "ts", cutoff=30, embargo=20)
        .orderBy("ts")
        .toPandas()
    )
    # ts<=20 train; 20<ts<=30 embargo; ts>30 test (boundaries inclusive
    # on the left of each region)
    assert got["split"].tolist() == [
        "train", "train", "embargo", "embargo", "test",
    ]


def test_temporal_split_no_embargo(spark):
    pdf = pd.DataFrame({"ts": [1, 2, 3], "v": range(3)})
    got = temporal_split(spark.createDataFrame(pdf), "ts", cutoff=2).toPandas()
    assert sorted(got["split"]) == ["test", "train", "train"]


def test_temporal_split_no_shuffle(spark):
    df = spark.createDataFrame(pd.DataFrame({"ts": [1, 2], "v": [0, 1]}))
    plan = (
        temporal_split(df, "ts", 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_negative_samples_deterministic_and_exclusive(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from rustiflow_spark.operators.sampling import negative_samples

    items = spark.range(100).select(F.col("id").alias("item_id"))
    pairs = spark.range(10).select(
        F.col("id").alias("q"), (F.col("id") * 3).alias("pos")
    )
    out = negative_samples(
        pairs, items, "q", "pos", "item_id", k=5
    ).toPandas()
    assert len(out) == 50
    assert out.groupby("q")["item_id"].nunique().eq(5).all()
    merged = out.merge(
        pairs.toPandas(), on="q"
    )
    assert (merged["item_id"] != merged["pos"]).all(), "positive leaked"
    # partition-invariant: same triples from a different partitioning
    out2 = negative_samples(
        pairs.repartition(7), items.repartition(5), "q", "pos", "item_id", k=5
    ).toPandas()
    a = out.sort_values(["q", "neg_rank"]).values.tolist()
    b = out2.sort_values(["q", "neg_rank"]).values.tolist()
    assert a == b
    # dense-id fast path (no rank join) draws the identical triples
    out3 = negative_samples(
        pairs, items, "q", "pos", "item_id", k=5, dense_ids=True
    ).toPandas().sort_values(["q", "neg_rank"]).values.tolist()
    assert out3 == a


def test_negative_samples_multi_positive_queries(spark):
    """A query with several positives must never see ANY of them as a
    negative, and gets ONE k-negative list, not one per pair (review
    finding: per-pair filtering leaked each pair's positive through the
    other pair's rows)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from rustiflow_spark.operators.sampling import negative_samples

    items = spark.range(20).select(F.col("id").alias("item_id"))
    pairs = spark.createDataFrame(
        pd.DataFrame({"q": [1, 1, 2], "pos": [5, 9, 0]})
    )
    out = negative_samples(
        pairs, items, "q", "pos", "item_id", k=15, buffer=30
    ).toPandas()
    q1 = out[out["q"] == 1]
    assert len(q1) == 15  # one list per QUERY
    assert 5 not in set(q1["item_id"]) and 9 not in set(q1["item_id"])
    # n_items + dense_ids: no item scan, same draws
    out2 = negative_samples(
        pairs, items, "q", "pos", "item_id", k=15, buffer=30,
        dense_ids=True, n_items=20,
    ).toPandas()
    assert (
        out.sort_values(["q", "neg_rank"]).values.tolist()
        == out2.sort_values(["q", "neg_rank"]).values.tolist()
    )
