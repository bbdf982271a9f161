"""Decoder robustness mirroring the reference's parser tests
(pcap_reader_test.rs:49-63: short/unsupported frames never panic;
packet_features.rs:164-273 fragment + extension-header rules)."""

from __future__ import annotations

import struct

import pytest

from pcap_decoder import _parse_ethernet_like, _parse_ipv4, _parse_ipv6, decode_pcap


def _pcap_bytes(frames: list[bytes], link_type: int = 1) -> bytes:
    out = bytearray()
    out += struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, link_type)
    # little-endian magic actually stores d4c3b2a1 on disk
    out[:4] = b"\xd4\xc3\xb2\xa1"
    for f in frames:
        out += struct.pack("<IIII", 1, 0, len(f), len(f))
        out += f
    return bytes(out)


def test_short_unsupported_frame_does_not_crash(tmp_path):
    p = tmp_path / "short.pcap"
    p.write_bytes(_pcap_bytes([b"\x01\x02\x03"]))
    df = decode_pcap(str(p))
    assert len(df) == 0


def test_unknown_ethertype_skipped(tmp_path):
    frame = b"\xff" * 12 + struct.pack(">H", 0x1234) + b"\x00" * 40
    p = tmp_path / "weird.pcap"
    p.write_bytes(_pcap_bytes([frame]))
    assert len(decode_pcap(str(p))) == 0


def test_ipv4_nonfirst_fragment_dropped():
    # frag offset 5 -> non-first fragment (packet_features.rs:165-167)
    hdr = bytearray(20 + 20)
    hdr[0] = 0x45
    hdr[2:4] = struct.pack(">H", 40)
    hdr[6:8] = struct.pack(">H", 5)
    hdr[9] = 6
    assert _parse_ipv4(bytes(hdr), 0) is None
    # first fragment (offset 0, MF set only in flags bits) is parsed
    hdr[6:8] = struct.pack(">H", 0x2000)
    assert _parse_ipv4(bytes(hdr), 0) is not None


def test_ipv6_esp_rejected_and_hopbyhop_skipped():
    # ESP next header -> reject (packet_features.rs:257)
    base = bytearray(40)
    base[0] = 0x60
    base[6] = 50  # ESP
    assert _parse_ipv6(bytes(base + bytearray(8)), 0) is None
    # hop-by-hop (0) then TCP
    pkt = bytearray(40)
    pkt[0] = 0x60
    pkt[6] = 0  # hop-by-hop
    ext = bytearray(8)
    ext[0] = 6  # next header TCP
    ext[1] = 0  # (0+1)*8 = 8 bytes
    tcp = bytearray(20)
    tcp[12] = 5 << 4
    row = _parse_ipv6(bytes(pkt + ext + tcp), 0)
    assert row is not None and row["protocol"] == 6


def test_ipv6_nonfirst_fragment_dropped():
    pkt = bytearray(40)
    pkt[0] = 0x60
    pkt[6] = 44  # fragment header
    frag = bytearray(8)
    frag[0] = 6
    frag[2:4] = struct.pack(">H", 8 << 3)  # offset 8 -> non-first
    assert _parse_ipv6(bytes(pkt + frag + bytearray(20)), 0) is None


def test_vlan_tag_unwrapped(tmp_path):
    ip = bytearray(20 + 20)
    ip[0] = 0x45
    ip[2:4] = struct.pack(">H", 40)
    ip[9] = 6
    ip[12:16] = bytes([10, 0, 0, 1])
    ip[16:20] = bytes([10, 0, 0, 2])
    tcp_off = 20
    ip[tcp_off + 12] = 5 << 4
    frame = b"\x00" * 12 + struct.pack(">H", 0x8100) + struct.pack(">HH", 0, 0x0800) + bytes(ip)
    p = tmp_path / "vlan.pcap"
    p.write_bytes(_pcap_bytes([frame]))
    df = decode_pcap(str(p))
    assert len(df) == 1 and df.iloc[0]["protocol"] == 6
