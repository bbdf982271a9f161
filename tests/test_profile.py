"""Table profiler (operators/profile.py) + hash_cross encoder."""
import numpy as np
import pandas as pd
import pytest

from rustiflow_spark.operators.encoding import hash_cross
from rustiflow_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def tbl(spark):
    pdf = pd.DataFrame(
        {
            "a": pd.array([1, 2, 2, None, 10], dtype="Int64"),
            "b": ["x", None, "y", "y", None],
            "c": [0.5, 0.5, 0.5, 0.5, 0.5],
        }
    )
    return spark.createDataFrame(pdf)


def test_profile_exact_values(tbl):
    got = profile_table(tbl).toPandas().set_index("col_name")
    assert got.loc["a"].tolist() == [5, 1, 3, "1", "10"]
    assert got.loc["b"].tolist() == [5, 2, 2, "x", "y"]
    assert got.loc["c"].tolist() == [5, 0, 1, "0.5", "0.5"]
    # long format, ordered by col_name
    assert got.index.tolist() == ["a", "b", "c"]


def test_profile_min_max_native_order(spark):
    # "10" < "9" lexicographically — native-type aggregation must win
    df = spark.createDataFrame(pd.DataFrame({"v": [9, 10, 2]}))
    got = profile_table(df).toPandas()
    assert got["min_s"].iloc[0] == "2"
    assert got["max_s"].iloc[0] == "10"


def test_profile_subset_and_empty_cols(tbl):
    got = profile_table(tbl, cols=["b"]).toPandas()
    assert got["col_name"].tolist() == ["b"]
    with pytest.raises(ValueError):
        profile_table(tbl, cols=[])


def test_profile_approx_mode(spark):
    n = 5000
    df = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(n, dtype="int64") % 1000})
    )
    got = profile_table(df, exact_distinct=False, rsd=0.05).toPandas()
    assert abs(got["n_distinct"].iloc[0] - 1000) <= 1000 * 0.15
    assert got["n"].iloc[0] == n and got["n_null"].iloc[0] == 0


def test_profile_plan_shape(tbl):
    """Exact mode pays the Expand (documented); approx mode must not —
    one partial-aggregate pass, no Expand."""
    exact = (
        profile_table(tbl)._jdf.queryExecution().executedPlan().toString()
    )
    approx = (
        profile_table(tbl, exact_distinct=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact
    assert "Expand" not in approx
    for plan in (exact, approx):
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


def test_hash_cross_basics(spark):
    pdf = pd.DataFrame(
        {
            "x": ["a", "a", "b", None, "NULL"],
            "y": ["p", "q", "p", "p", "p"],
        }
    )
    df = spark.createDataFrame(pdf)
    got = hash_cross(df, ["x", "y"], 16, hash_fn="md5").toPandas()
    assert got["cross_bucket"].between(0, 15).all()
    # same inputs -> same bucket; the NULL sentinel differs from "NULL"
    g = hash_cross(df, ["x", "y"], 16, hash_fn="md5").toPandas()
    assert g["cross_bucket"].tolist() == got["cross_bucket"].tolist()
    row_null = got.loc[pdf["x"].isna(), "cross_bucket"].iloc[0]
    row_str = got.loc[pdf["x"] == "NULL", "cross_bucket"].iloc[0]
    # both rows share y='p'; the hash keys must differ (buckets may
    # collide for other widths, so check the full-width hash instead)
    wide = hash_cross(df, ["x", "y"], 2**31 - 1, hash_fn="md5").toPandas()
    assert (
        wide.loc[pdf["x"].isna(), "cross_bucket"].iloc[0]
        != wide.loc[pdf["x"] == "NULL", "cross_bucket"].iloc[0]
    )


def test_hash_cross_modes_and_errors(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": ["a", "b"], "y": [1, 2]}))
    xx = hash_cross(df, ["x", "y"], 8).toPandas()
    assert xx["cross_bucket"].between(0, 7).all()
    with pytest.raises(ValueError):
        hash_cross(df, ["x"], 0)
    with pytest.raises(ValueError):
        hash_cross(df, ["x"], 4, hash_fn="sha1")


def test_hash_cross_no_shuffle(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": ["a", "b"], "y": [1, 2]}))
    plan = (
        hash_cross(df, ["x", "y"], 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_histogram_drift_detects_shift(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from rustiflow_spark.operators.profile import histogram_drift

    n = 4000
    base = spark.range(n).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.abs(F.xxhash64("id")) % 100).cast("double").alias("v"),
    )
    # same distribution -> tiny statistic
    same = histogram_drift(
        base.where("id % 4 < 2"), base.where("id % 4 >= 2"),
        "v", by="g", lo=0, hi=100, n_bins=16,
    ).toPandas()
    # shifted current (+40 clamps into the top bins) -> large statistic
    shifted = histogram_drift(
        base,
        base.withColumn("v", F.col("v") + 40.0),
        "v", by="g", lo=0, hi=100, n_bins=16,
    ).toPandas()
    # "same" is still two DIFFERENT random samples: chi2 ~ df(=15)
    # in expectation, i.e. ~15e6 scaled; the +40 shift lands ~50x that
    assert (shifted["chi2_scaled"].min()) > 20 * max(
        1, same["chi2_scaled"].max()
    )
    # out-of-range values clamp into edge bins (count as drift mass)
    clamp = histogram_drift(
        base, base.withColumn("v", F.lit(1e9)),
        "v", by="g", lo=0, hi=100, n_bins=16,
    ).toPandas()
    assert (clamp["n_cur"] == clamp["n_ref"]).all()
    assert (clamp["chi2_scaled"] > 0).all()


def test_validate_expectations_counts(spark):
    import pandas as pd

    from rustiflow_spark.operators.profile import validate_expectations

    pdf = pd.DataFrame(
        {
            "id": [1, 2, 2, 4],
            "v": [5.0, None, 200.0, 50.0],
            "s": ["a", "b", "zz", "a"],
        }
    )
    df = spark.createDataFrame(pdf)
    out = validate_expectations(
        df,
        [
            {"kind": "not_null", "col": "v"},
            {"kind": "between", "col": "v", "lo": 0, "hi": 100},
            {"kind": "in_set", "col": "s", "values": ["a", "b"]},
            {"kind": "regex", "col": "s", "pattern": "^[ab]$"},
            {"kind": "unique", "col": "id"},
            {"kind": "expr", "name": "v_lt_300", "sql": "v < 300"},
        ],
    ).toPandas().set_index("rule")
    assert out.loc["not_null_v", "n_violations"] == 1
    assert out.loc["between_v", "n_violations"] == 2  # NULL + 200
    assert out.loc["in_set_s", "n_violations"] == 1   # zz
    assert out.loc["regex_s", "n_violations"] == 1
    assert out.loc["unique_id", "n_violations"] == 1  # one extra 2
    # NULL < 300 is NULL -> NOT NULL -> no violation (documented)
    assert out.loc["v_lt_300", "n_violations"] == 0
    assert not out.loc["between_v", "passed"]
    assert (out["n_rows"] == 4).all()


def test_drift_hist_windows_merge_losslessly(spark):
    """Adjacent emitted windows groupBy-sum to exactly the batch
    histogram of their union — the mergeable-table contract that lets a
    continuous stream replace any batch drift read."""
    import pandas as pd
    from pyspark.sql import functions as F

    n = 2000
    ev = spark.range(n).select(
        (F.col("id") * 1_000_000).alias("ts_us"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.abs(F.xxhash64("id")) % 100).cast("double").alias("v"),
    )
    # batch twin of drift_hist_stream's binning, split in two hours
    b = F.least(
        F.lit(15),
        F.greatest(F.lit(0), F.floor((F.col("v") - 0) * 16 / 100).cast("int")),
    )
    per_hour = (
        ev.select("g", (F.col("ts_us") / 3_600_000_000).cast("long").alias("h"), b.alias("bin"))
        .groupBy("g", "h", "bin")
        .agg(F.count("*").alias("n"))
    )
    merged = (
        per_hour.groupBy("g", "bin").agg(F.sum("n").alias("n"))
        .orderBy("g", "bin")
        .toPandas()
    )
    whole = (
        ev.select("g", b.alias("bin")).groupBy("g", "bin")
        .agg(F.count("*").alias("n")).orderBy("g", "bin").toPandas()
    )
    assert merged.values.tolist() == whole.values.tolist()


def test_histogram_drift_one_sided_group_is_max_not_crash(spark):
    """A group present on only one side (a NEW category in serving data)
    must score the complete-separation supremum scale*(n_ref+n_cur), not
    crash with ANSI DIVIDE_BY_ZERO (review finding)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from rustiflow_spark.operators.profile import histogram_drift

    ref = spark.createDataFrame(
        pd.DataFrame({"g": ["A"] * 10, "v": [float(i) for i in range(10)]})
    )
    cur = spark.createDataFrame(
        pd.DataFrame(
            {"g": ["A"] * 10 + ["B"] * 7,
             "v": [float(i) for i in range(10)] + [50.0] * 7}
        )
    )
    out = histogram_drift(
        ref, cur, "v", by="g", lo=0, hi=100, n_bins=16
    ).toPandas().set_index("g")
    assert out.loc["B", "n_ref"] == 0 and out.loc["B", "n_cur"] == 7
    assert out.loc["B", "chi2_scaled"] == 1_000_000 * 7
    assert out.loc["A", "chi2_scaled"] == 0  # identical histograms


def test_validate_expectations_regex_full_match(spark):
    """The regex rule is a FULL match: a value merely CONTAINING a match
    must count as a violation (review finding: bare rlike is substring
    search)."""
    import pandas as pd

    from rustiflow_spark.operators.profile import validate_expectations

    df = spark.createDataFrame(
        pd.DataFrame({"s": ["src1", "xxsrc1yy", "nope"]})
    )
    out = validate_expectations(
        df, [{"kind": "regex", "col": "s", "pattern": "src[0-9]+"}]
    ).toPandas()
    assert out["n_violations"].iloc[0] == 2  # xxsrc1yy AND nope
    # duplicate default names get index suffixes
    two = validate_expectations(
        df,
        [
            {"kind": "regex", "col": "s", "pattern": "src[0-9]+"},
            {"kind": "regex", "col": "s", "pattern": ".*"},
        ],
    ).toPandas()
    assert sorted(two["rule"]) == ["regex_s_0", "regex_s_1"]


def test_validate_expectations_default_vs_explicit_name_collision(spark):
    """A DEFAULT name colliding with another rule's EXPLICIT name: the
    default holder gets the index suffix, the explicit one keeps its
    contract name (review finding: a set-membership test exempted both)."""
    import pandas as pd

    from rustiflow_spark.operators.profile import validate_expectations

    df = spark.createDataFrame(pd.DataFrame({"x": [1, None]}))
    out = validate_expectations(
        df,
        [
            {"kind": "not_null", "col": "x"},  # default name: not_null_x
            {"kind": "expr", "name": "not_null_x", "sql": "x IS NOT NULL"},
        ],
    ).toPandas()
    assert sorted(out["rule"]) == ["not_null_x", "not_null_x_0"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate explicit"):
        validate_expectations(
            df,
            [
                {"kind": "expr", "name": "g", "sql": "x > 0"},
                {"kind": "expr", "name": "g", "sql": "x < 9"},
            ],
        )


def test_histogram_drift_null_values_match_across_sides(spark):
    """Equal NULL mass on both sides must NOT score as drift: NULLs bin
    to a dedicated -1 bucket that joins across sides (round-5 ADVICE —
    a NULL bin key never matches itself in the full-outer join, so the
    old binning scored complete separation for identical inputs)."""
    from rustiflow_spark.operators.profile import histogram_drift

    pdf = pd.DataFrame({"v": [1.0, 2.0, None, None, 50.0]})
    ref = spark.createDataFrame(pdf)
    cur = spark.createDataFrame(pdf)
    out = histogram_drift(ref, cur, "v", lo=0, hi=100, n_bins=4).toPandas()
    assert out["n_ref"].iloc[0] == 5 and out["n_cur"].iloc[0] == 5
    assert out["chi2_scaled"].iloc[0] == 0  # identical incl. NULL mass
