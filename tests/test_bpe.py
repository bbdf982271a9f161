"""Distributed BPE learning (operators/bpe.py) vs a line-by-line
Python reference implementation."""
import numpy as np
import pandas as pd
import pytest

from rustiflow_spark.operators.bpe import bpe_apply, bpe_learn, merge_pair_expr


def _ref_merge(seq, a, b, new):
    """Greedy left-to-right non-overlapping rewrite."""
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(new)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _ref_bpe(seqs, n_merges, base):
    merges = []
    cur = [list(s) for s in seqs]
    for it in range(n_merges):
        counts = {}
        for s in cur:
            for x, y in zip(s, s[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        new = base + it
        merges.append({"it": it, "a": a, "b": b, "new_id": new, "cnt": cnt})
        cur = [_ref_merge(s, a, b, new) for s in cur]
    return merges, cur


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(77)
    seqs = [
        rng.integers(0, 12, size=rng.integers(2, 40)).astype("int32").tolist()
        for _ in range(120)
    ] + [[5], []]  # degenerate: single-token and empty sequences
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(seqs), dtype="int64"), "tokens": seqs}
    )
    return spark.createDataFrame(pdf), seqs


def test_bpe_learn_matches_reference(corpus):
    df, seqs = corpus
    merges, out = bpe_learn(df, "tokens", n_merges=6, new_id_base=1000)
    ref_merges, ref_seqs = _ref_bpe(seqs, 6, 1000)
    assert merges == ref_merges
    got = out.orderBy("doc_id").toPandas()["tokens"]
    assert [list(s) for s in got] == ref_seqs


def test_bpe_aa_run_parity(spark):
    """(a, a) merges need run parity: [1,1,1] -> [new, 1]; the fold
    branch, not the vectorized one."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "tokens": [[1, 1, 1], [1, 1, 1, 1], [2, 1, 1, 2]],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        df.selectExpr("doc_id", merge_pair_expr("tokens", 1, 1, 9) + " AS t")
        .orderBy("doc_id")
        .toPandas()["t"]
    )
    assert [list(s) for s in out] == [[9, 1], [9, 9], [2, 9, 2]]


def test_bpe_learn_prefers_run_pair_like_reference(spark):
    """A corpus dominated by a run of one token exercises the greedy
    a==b counting + rewrite end-to-end vs the reference."""
    seqs = [[3] * 9, [3, 4, 3, 3], [4, 3, 3, 4]]
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "tokens": [list(map(int, s)) for s in seqs]}
    )
    df = spark.createDataFrame(pdf)
    merges, out = bpe_learn(df, "tokens", n_merges=3, new_id_base=50)
    ref_merges, ref_seqs = _ref_bpe(seqs, 3, 50)
    assert merges == ref_merges
    got = out.orderBy("doc_id").toPandas()["tokens"]
    assert [list(s) for s in got] == ref_seqs


def test_bpe_apply_matches_learn_rewrite(corpus):
    df, seqs = corpus
    merges, out_learn = bpe_learn(df, "tokens", n_merges=4, new_id_base=1000)
    out_apply = bpe_apply(df, "tokens", merges, out_col="enc")
    a = out_learn.orderBy("doc_id").toPandas()["tokens"]
    b = out_apply.orderBy("doc_id").toPandas()["enc"]
    assert [list(s) for s in a] == [list(s) for s in b]


def test_bpe_min_count_stops_early(spark):
    pdf = pd.DataFrame({"doc_id": [0], "tokens": [[1, 2, 3]]})
    merges, _ = bpe_learn(
        spark.createDataFrame(pdf), "tokens", n_merges=5,
        new_id_base=10, min_count=2,
    )
    assert merges == []  # every pair occurs once
    with pytest.raises(ValueError):
        bpe_learn(spark.createDataFrame(pdf), "tokens", 0, 10)


def test_bpe_apply_plan_is_projection_only(spark):
    pdf = pd.DataFrame({"doc_id": [0], "tokens": [[1, 2, 1, 2]]})
    df = spark.createDataFrame(pdf)
    out = bpe_apply(
        df, "tokens", [{"a": 1, "b": 2, "new_id": 7}], out_col="enc",
        checkpoint_every=100,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_bpe_decode_inverts_nested_merges(spark):
    """decode must expand in REVERSE merge order: a later merge's pair
    can reference an earlier merge's new_id."""
    import pandas as pd

    from rustiflow_spark.operators.bpe import bpe_decode, bpe_learn

    pdf = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "tokens": [[1, 2, 3, 1, 2, 3]] * 4 + [[1, 2], [3]],
        }
    )
    df = spark.createDataFrame(pdf)
    merges, enc = bpe_learn(df, "tokens", n_merges=3, new_id_base=1_000_000)
    assert len(merges) >= 2  # (1,2) then ((1,2),3) chain on this corpus
    dec = bpe_decode(enc, "tokens", merges).orderBy("doc_id").toPandas()
    assert [list(t) for t in dec["tokens"]] == [list(t) for t in pdf["tokens"]]
    # encoded corpus is actually shorter (merges fired before inversion)
    enc_len = enc.selectExpr("sum(size(tokens))").first()[0]
    assert enc_len < sum(len(t) for t in pdf["tokens"])
