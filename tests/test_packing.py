"""Sequence packing + token chunking (operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, doc_id long, n_tok long")


def test_pack_chunks_spanning_and_offsets(spark):
    from rustiflow_spark.operators.packing import pack_chunks

    # stream: 3 + 4 + 6 tokens, L=5 → chunks: [aaa bb][bb cccc][cc]
    df = _docs(spark, [("s", 1, 3), ("s", 2, 4), ("s", 3, 6)])
    out = pack_chunks(df, ["source"], ["doc_id"], max_len=5)
    rows = {
        (r.doc_id, r.chunk_id): (r.tok_start, r.chunk_offset, r.seg_len, r.n_chunks)
        for r in out.collect()
    }
    assert rows == {
        (1, 0): (0, 0, 3, 1),          # doc1 fully in chunk 0 at offset 0
        (2, 0): (0, 3, 2, 2),          # doc2 head fills chunk 0
        (2, 1): (2, 0, 2, 2),          # doc2 tail opens chunk 1
        (3, 1): (0, 2, 3, 2),          # doc3 head after doc2's tail
        (3, 2): (3, 0, 3, 2),          # doc3 tail opens chunk 2
    }
    # conservation: segments of each doc sum to n_tok
    sums = out.groupBy("doc_id").agg(F.sum("seg_len").alias("t")).collect()
    assert {r.doc_id: r.t for r in sums} == {1: 3, 2: 4, 3: 6}


def test_pack_chunks_streams_independent_and_zero_tok(spark):
    from rustiflow_spark.operators.packing import pack_chunks

    df = _docs(
        spark,
        [("a", 1, 7), ("a", 2, 0), ("a", 3, 1), ("b", 1, 2)],
    )
    out = pack_chunks(df, ["source"], ["doc_id"], max_len=4).collect()
    # zero-token doc emits nothing; each stream starts at chunk 0
    assert {(r.source, r.doc_id, r.chunk_id) for r in out} == {
        ("a", 1, 0), ("a", 1, 1), ("a", 3, 1), ("b", 1, 0)
    }
    with pytest.raises(ValueError):
        pack_chunks(df, ["source"], ["doc_id"], max_len=0)


def test_pack_chunks_doc_longer_than_many_chunks(spark):
    from rustiflow_spark.operators.packing import pack_chunks

    df = _docs(spark, [("s", 1, 2), ("s", 2, 23)])
    out = pack_chunks(df, ["source"], ["doc_id"], max_len=4)
    seg = {r.chunk_id: r.seg_len for r in out.where("doc_id = 2").collect()}
    # 23 tokens starting at offset 2: 2 + 4*5 + 1
    assert seg == {0: 2, 1: 4, 2: 4, 3: 4, 4: 4, 5: 4, 6: 1}
    assert out.where("doc_id = 2").first().n_chunks == 7


def test_chunk_tokens_overlap_and_tail(spark):
    from rustiflow_spark.operators.packing import chunk_tokens

    df = spark.createDataFrame(
        [(1, list(range(10))), (2, [5]), (3, [])], "doc_id long, tokens array<int>"
    )
    out = chunk_tokens(df, "tokens", chunk_len=4, overlap=2)
    got = {
        (r.doc_id, r.chunk_index): (list(r.chunk), r.chunk_n_tok)
        for r in out.collect()
    }
    # stride 2: starts 0,2,4,6,8 for n=10; empty array emits nothing
    assert got == {
        (1, 0): ([0, 1, 2, 3], 4),
        (1, 1): ([2, 3, 4, 5], 4),
        (1, 2): ([4, 5, 6, 7], 4),
        (1, 3): ([6, 7, 8, 9], 4),
        (1, 4): ([8, 9], 2),
        (2, 0): ([5], 1),
    }
    with pytest.raises(ValueError):
        chunk_tokens(df, "tokens", chunk_len=4, overlap=4)


def test_packing_plans_stay_jvm_side(spark):
    from rustiflow_spark.operators.packing import chunk_tokens, pack_chunks

    df = _docs(spark, [("s", 1, 3)])
    p1 = pack_chunks(df, ["source"], ["doc_id"], max_len=5)._jdf.queryExecution().executedPlan().toString()
    tf = spark.createDataFrame([(1, [1, 2, 3])], "doc_id long, tokens array<int>")
    p2 = chunk_tokens(tf)._jdf.queryExecution().executedPlan().toString()
    for p in (p1, p2):
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the only shuffle in pack_chunks is the window's partitioning
    assert p1.count("Exchange") == 1
    assert "Exchange" not in p2  # chunking is embarrassingly parallel
