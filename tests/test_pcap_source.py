"""Engine-level pcap ingestion: read_pcap on the executors must equal the
driver-side decoder, and feed sessionize_packets end-to-end."""

from __future__ import annotations

import pandas as pd

from rustiflow_spark.config import EngineConfig
from rustiflow_spark.operators.sessionize import sessionize_packets
from rustiflow_spark.sources.pcap import decode_pcap, read_pcap

DATA = "/root/reference/rustiflow/tests/data"


def test_read_pcap_matches_local_decode(spark):
    sdf = read_pcap(spark, f"{DATA}/nmap_tcp_syn_version.pcap")
    got = sdf.toPandas().sort_values(["ts_us", "event_seq"]).reset_index(drop=True)
    exp = decode_pcap(f"{DATA}/nmap_tcp_syn_version.pcap")
    assert len(got) == len(exp)
    for col in ("ts_us", "src_ip", "dst_ip", "src_port", "dst_port", "protocol",
                "flags", "length", "data_length", "window_size"):
        assert got[col].tolist() == exp[col].tolist(), col


def test_read_pcap_sessionize_end_to_end(spark):
    cfg = EngineConfig(active_timeout=3600, idle_timeout=120,
                       expiration_check_interval=60)
    flows = sessionize_packets(read_pcap(spark, DATA), cfg).toPandas()
    # both nmap fixtures decoded together: flows from each capture present
    assert len(flows) > 0
    assert (flows["protocol"] == 6).any() and (flows["protocol"] == 17).any()
