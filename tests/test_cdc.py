"""merge_upsert / scd2_history (operators/cdc.py) semantics."""

import pandas as pd
import pytest

from rustiflow_spark.operators.cdc import merge_upsert, scd2_history


def test_merge_upsert_semantics(spark):
    snap = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 4, 5], "v": [10.0, 20.0, 30.0, 40.0, 50.0]})
    )
    changes = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [3, 3, 4, 9],
                "v": [31.0, 32.0, 0.0, 90.0],
                "seq": [1, 2, 1, 1],
                "is_delete": [False, False, True, False],
            }
        )
    )
    out = (
        merge_upsert(snap, changes, ["k"], "seq", delete_col="is_delete")
        .orderBy("k")
        .toPandas()
    )
    assert out["k"].tolist() == [1, 2, 3, 5, 9]
    # last-writer-wins: seq 2 beats seq 1 on key 3; key 4 tombstoned
    assert out.set_index("k")["v"].to_dict() == {
        1: 10.0, 2: 20.0, 3: 32.0, 5: 50.0, 9: 90.0
    }


def test_merge_upsert_without_deletes(spark):
    snap = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]}))
    changes = spark.createDataFrame(
        pd.DataFrame({"k": [2, 3], "v": [22.0, 33.0], "seq": [1, 1]})
    )
    out = merge_upsert(snap, changes, ["k"], "seq").orderBy("k").toPandas()
    assert out.set_index("k")["v"].to_dict() == {1: 1.0, 2: 22.0, 3: 33.0}


def test_scd2_history_collapses_noops(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["u"] * 5 + ["w"],
                "ts": [10, 20, 30, 40, 50, 7],
                "seq": [0, 1, 2, 3, 4, 5],
                "attr": ["a", "a", "b", "b", "a", "z"],
            }
        )
    )
    out = (
        scd2_history(df, ["k"], "ts", ["attr"], order_col="seq")
        .orderBy("k", "valid_from")
        .toPandas()
    )
    u = out[out["k"] == "u"]
    assert u["attr"].tolist() == ["a", "b", "a"]
    assert u["valid_from"].tolist() == [10, 30, 50]
    assert u["valid_to"].tolist()[:2] == [30, 50]
    assert pd.isna(u["valid_to"].iloc[2])
    assert u["is_current"].tolist() == [False, False, True]
    w = out[out["k"] == "w"]
    assert len(w) == 1 and bool(w["is_current"].iloc[0])


def test_scd2_end_of_time_and_null_attrs(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["u", "u", "u"],
                "ts": [1, 2, 3],
                "seq": [0, 1, 2],
                "attr": [None, None, "a"],
            }
        )
    )
    out = (
        scd2_history(df, ["k"], "ts", ["attr"], order_col="seq", end_of_time=99)
        .orderBy("valid_from")
        .toPandas()
    )
    # null==null collapses (eqNullSafe), so two versions: null then 'a'
    assert len(out) == 2
    assert out["valid_to"].tolist() == [3, 99]
    assert out["is_current"].tolist() == [False, True]


def test_pit_enrich_matches_exact_version(spark):
    from rustiflow_spark.streaming.enrich_stream import pit_enrich_stream

    dim = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["u", "u", "w"],
                "valid_from": [10, 30, 0],
                "valid_to": [30, 100, 100],
                "regime": ["a", "b", "z"],
            }
        )
    )
    facts = spark.createDataFrame(
        pd.DataFrame({"k": ["u", "u", "u", "w"], "ts": [10, 29, 30, 50]})
    )
    out = pit_enrich_stream(facts, dim, ["k"], "ts").orderBy("ts", "k").toPandas()
    # boundary: ts==valid_from joins the NEW version; ts==valid_to excluded
    assert out["regime_dim"].tolist() == ["a", "a", "b", "z"]
    plan = (
        pit_enrich_stream(facts, dim, ["k"], "ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_merge_upsert_fuzz_vs_pandas(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    snap_keys = rng.choice(np.arange(200), size=120, replace=False)
    snap = pd.DataFrame({"k": snap_keys, "v": rng.randn(120).round(3)})
    # changes touch existing + new keys; seq unique per key (ties on seq
    # would make last-writer-wins ambiguous by design)
    chg_rows = []
    for k in rng.choice(np.arange(250), size=80, replace=False):
        for seq in range(rng.randint(1, 4)):
            chg_rows.append(
                {
                    "k": k,
                    "v": round(float(rng.randn()), 3),
                    "seq": seq + 1,
                    "is_delete": bool(rng.rand() < 0.2),
                }
            )
    chg = pd.DataFrame(chg_rows)
    out = (
        merge_upsert(
            spark.createDataFrame(snap),
            spark.createDataFrame(chg),
            ["k"],
            "seq",
            delete_col="is_delete",
        )
        .orderBy("k")
        .toPandas()
    )
    # pandas oracle
    latest = (
        chg.sort_values(["k", "seq"]).groupby("k", as_index=False).last()
    )
    kept = snap[~snap["k"].isin(latest["k"])]
    ups = latest[~latest["is_delete"]][["k", "v"]]
    exp = (
        pd.concat([kept, ups])
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == exp["k"].tolist()
    assert np.allclose(out["v"], exp["v"])


def test_scd2_fuzz_tiling_and_reconstruction(spark):
    import numpy as np

    rng = np.random.RandomState(23)
    n = 600
    ev = pd.DataFrame(
        {
            "k": rng.randint(0, 25, n),
            "ts": rng.randint(0, 500, n).astype("int64"),  # plenty of ts ties
            "seq": np.arange(n, dtype="int64"),
            "attr": rng.choice(["a", "b", "c"], n),
        }
    )
    # make (k, ts) unique so 'the version at ts' is well-defined; keep
    # cross-key ties
    ev = ev.drop_duplicates(subset=["k", "ts"]).reset_index(drop=True)
    out = (
        scd2_history(
            spark.createDataFrame(ev), ["k"], "ts", ["attr"], order_col="seq",
            end_of_time=10_000,
        )
        .orderBy("k", "valid_from")
        .toPandas()
    )
    for k, grp in out.groupby("k"):
        # versions tile: each valid_to == next valid_from; last hits EOT
        assert grp["valid_to"].tolist()[:-1] == grp["valid_from"].tolist()[1:]
        assert grp["valid_to"].iloc[-1] == 10_000
        assert grp["is_current"].tolist() == [False] * (len(grp) - 1) + [True]
        # no zero-information versions
        assert (grp["attr"].values[1:] != grp["attr"].values[:-1]).all()
    # reconstruction: every source event's attr equals the version
    # covering its timestamp
    for _, r in ev.sample(100, random_state=1).iterrows():
        g = out[(out["k"] == r["k"])
                & (out["valid_from"] <= r["ts"]) & (r["ts"] < out["valid_to"])]
        assert len(g) == 1
        assert g["attr"].iloc[0] == r["attr"]
