"""Token-array MinHash (operators/dedup.py token_minhash_signatures)."""
import numpy as np
import pandas as pd
import pytest

from rustiflow_spark.operators.dedup import (
    minhash_lsh_candidates,
    token_minhash_params,
    token_minhash_signatures,
)


def _toks(rng, n):
    return rng.integers(0, 5000, size=n).astype("int32").tolist()


@pytest.fixture(scope="module")
def seqs(spark):
    rng = np.random.default_rng(8)
    base = _toks(rng, 200)
    near = list(base)
    near[17] = 9999  # one-token edit
    rows = [(0, base), (1, near), (2, _toks(rng, 200)), (3, _toks(rng, 2))]
    pdf = pd.DataFrame({"doc_id": [r[0] for r in rows], "tokens": [r[1] for r in rows]})
    return spark.createDataFrame(pdf)


def test_signature_shape_and_determinism(seqs):
    got = (
        token_minhash_signatures(seqs, "tokens", num_perm=16)
        .orderBy("doc_id")
        .toPandas()
    )
    assert all(len(s) == 16 for s in got["minhash"])
    again = (
        token_minhash_signatures(seqs.repartition(7), "tokens", num_perm=16)
        .orderBy("doc_id")
        .toPandas()
    )
    assert [list(x) for x in got["minhash"]] == [list(x) for x in again["minhash"]]


def test_jaccard_estimate_orders_pairs(seqs):
    got = (
        token_minhash_signatures(seqs, "tokens", num_perm=64)
        .orderBy("doc_id")
        .toPandas()
    )
    sig = {r.doc_id: np.array(r.minhash) for r in got.itertuples()}
    est_near = (sig[0] == sig[1]).mean()
    est_far = (sig[0] == sig[2]).mean()
    # one edit in 200 tokens kills <= 2*n grams of ~198: true J ~ 0.97
    assert est_near > 0.8
    assert est_far < 0.2


def test_short_sequences_single_gram(spark):
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "tokens": [[1, 2], [1, 2], [3]]}
    )
    got = (
        token_minhash_signatures(
            spark.createDataFrame(pdf), "tokens", num_perm=8, n=3
        )
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(got["minhash"].iloc[0]) == list(got["minhash"].iloc[1])
    assert list(got["minhash"].iloc[0]) != list(got["minhash"].iloc[2])


def test_plugs_into_lsh_candidates(seqs):
    sigs = token_minhash_signatures(seqs, "tokens", num_perm=64)
    pairs = minhash_lsh_candidates(
        sigs, "doc_id", num_perm=64, bands=16
    ).toPandas()
    keys = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in keys
    assert (0, 2) not in keys


def test_md5_mode_and_plan(seqs):
    out = token_minhash_signatures(seqs, "tokens", num_perm=4, hash_fn="md5")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    got = out.orderBy("doc_id").toPandas()
    assert all(len(s) == 4 for s in got["minhash"])
    with pytest.raises(ValueError):
        token_minhash_signatures(seqs, "tokens", num_perm=0)
    with pytest.raises(ValueError):
        token_minhash_signatures(seqs, "tokens", hash_fn="crc")


def test_params_regenerable_and_in_range(spark):
    ps = token_minhash_params(32)
    assert ps == token_minhash_params(32)
    M = (1 << 31) - 1
    for a, b in ps:
        assert 1 <= a < M and 0 <= b < M
    assert len({p[0] for p in ps}) > 28  # essentially all distinct
