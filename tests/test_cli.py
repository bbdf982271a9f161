"""CLI drive: extract from pcap and from parquet, resume via checkpoints."""

from __future__ import annotations

import json

import pandas as pd

DATA = "/root/reference/rustiflow/tests/data"


def test_cli_extract_pcap(spark, tmp_path, capsys):
    from rustiflow_spark.cli import main

    out = str(tmp_path / "flows")
    rc = main([
        "extract", "--input", DATA, "--input-format", "pcap",
        "--output", out, "--schema", "cic",
        "--scan-mode", "none", "--cores", "4",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] > 0
    from rustiflow_spark.session import get_spark

    sp = get_spark("cli-check", cores=4)
    flows = sp.read.parquet(out)
    assert len(flows.columns) == 100  # CIC schema width
    assert flows.count() == summary["rows"]


def test_cli_tokens_parquet(spark, tmp_path, capsys):
    from rustiflow_spark.cli import main
    from rustiflow_spark.sources.synth import generate_token_sequences

    pdf = generate_token_sequences(n_docs=30, seed=3)
    src = str(tmp_path / "tok.parquet")
    cols = ["doc_id", "n_tok", "source", "ts_us", "direction", "terminator", "event_seq"]
    spark.createDataFrame(pdf[cols]).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "sessions")
    rc = main([
        "tokens", "--input", src, "--output", out,
        "--active-timeout", "10000000", "--idle-timeout", "120",
        "--scan-mode", "none", "--cores", "4",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] > 0
