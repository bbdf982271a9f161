"""Vectorized pcap decode parity: _decode_records_df must produce exactly
the rows of the scalar reference decoder (_decode_records / _parse_*) in
the same arrival order, across every frame shape the encoder can produce —
both endiannesses, µs/ns timestamp units, Ethernet and Linux-cooked link
layers, 802.1Q VLAN tags, IPv4 (incl. dropped non-first fragments), IPv6
with and without extension headers (the ext-header packets take the scalar
fallback inside the vectorized path), TCP options, ICMP/ICMPv6, undecodable
ethertypes, and a truncated final record."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from rustiflow_spark.sources.pcap import (
    _decode_records,
    _decode_records_df,
    parse_pcap_header,
)
from rustiflow_spark.sources.pcap_write import encode_pcap_bytes


def _mixed_rows(n: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    proto = rng.choice([6, 17, 1, 58], n, p=[0.5, 0.3, 0.1, 0.1])
    v6 = rng.random(n) < 0.3
    # ICMP type mismatch with IP version is fine: 1 over v6 decodes as proto 1
    src4 = rng.choice(["10.0.0.1", "10.0.0.2", "192.168.1.9"], n)
    src6 = rng.choice(["2001:db8::1", "2001:db8::2", "fe80::9"], n)
    return pd.DataFrame(
        {
            "ts_us": 1_700_000_000_000_000
            + np.cumsum(rng.integers(0, 2000, n)),
            "proto": proto,
            "v6": v6,
            "vlan": rng.random(n) < 0.25,
            "ext": v6 & (rng.random(n) < 0.4),
            "src_ip": np.where(v6, src6, src4),
            "dst_ip": np.where(v6, "2001:db8::ff", "172.16.0.9"),
            "src_port": rng.integers(1024, 60000, n),
            "dst_port": rng.integers(1, 1024, n),
            "dlen": rng.integers(0, 300, n),
            "fin": (rng.random(n) < 0.1).astype(int),
            "syn": (rng.random(n) < 0.1).astype(int),
            "rst": (rng.random(n) < 0.05).astype(int),
            "psh": (rng.random(n) < 0.3).astype(int),
            "ack": (rng.random(n) < 0.8).astype(int),
            "hdr_opt": rng.choice([0, 4, 12], n),
            "seq": rng.integers(0, 2**32, n),
            "ack_seq": rng.integers(0, 2**32, n),
            "window": rng.integers(0, 65536, n),
            "icmp_type": rng.integers(0, 20, n),
            "icmp_code": rng.integers(0, 4, n),
            "inject_frag": rng.random(n) < 0.1,
            "inject_arp": rng.random(n) < 0.1,
        }
    )


def _norm(x):
    if x is None or x is pd.NA or (isinstance(x, float) and math.isnan(x)):
        return None
    return int(x) if isinstance(x, (int, np.integer, float)) else x


def _assert_parity(data: bytes):
    endian, ns, link = parse_pcap_header(data)
    scalar = pd.DataFrame(_decode_records(data, 24, endian, ns, link))
    vec, offs = _decode_records_df(data, 24, endian, ns, link)
    assert len(scalar) == len(vec)
    assert offs.size == len(vec)
    assert np.all(np.diff(offs) > 0)  # arrival order
    if len(vec) == 0:
        return
    for c in vec.columns:
        a = [_norm(x) for x in scalar[c].tolist()]
        b = [_norm(x) for x in vec[c].tolist()]
        assert a == b, c


@pytest.mark.parametrize("endian", ["<", ">"])
@pytest.mark.parametrize("ns", [False, True])
@pytest.mark.parametrize("sll", [False, True])
def test_parity_all_framings(endian, ns, sll):
    pdf = _mixed_rows(400, seed=hash((endian, ns, sll)) % 2**31)
    _assert_parity(encode_pcap_bytes(pdf, endian=endian, ns=ns, sll=sll))


def test_parity_truncated_tail():
    data = encode_pcap_bytes(_mixed_rows(100, seed=5))
    for cut in (1, 7, 15, 23, 40):
        _assert_parity(data[: len(data) - cut])


def test_parity_stop_before_matches_scalar():
    data = encode_pcap_bytes(_mixed_rows(200, seed=9))
    endian, ns, link = parse_pcap_header(data)
    stop = len(data) // 2
    scalar = pd.DataFrame(
        _decode_records(data, 24, endian, ns, link, stop_before=stop)
    )
    vec, _ = _decode_records_df(data, 24, endian, ns, link, stop_before=stop)
    assert len(scalar) == len(vec)
    assert scalar["ts_us"].tolist() == vec["ts_us"].tolist()


def test_decode_column_pruning():
    data = encode_pcap_bytes(_mixed_rows(300, seed=11))
    from rustiflow_spark.sources.pcap import decode_pcap_bytes

    full = decode_pcap_bytes(data)
    pruned = decode_pcap_bytes(
        data, columns=["ts_us", "length", "data_length", "protocol"]
    )
    assert list(pruned.columns) == [
        "protocol", "ts_us", "data_length", "length", "event_seq"
    ]
    assert len(pruned) == len(full)
    for c in ("ts_us", "length", "data_length", "protocol", "event_seq"):
        assert pruned[c].tolist() == full[c].tolist(), c
