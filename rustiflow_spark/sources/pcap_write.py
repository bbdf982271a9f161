"""Classic-pcap encoder: packet-event rows -> capture bytes.

The write-side complement of sources/pcap.py, used by the pcap round-trip
contract query (and tests) to exercise the full decode chain
(pcap.rs:66-210 framing; packet_features.rs:164-373 header extraction)
against synthesized ground truth: encode deterministic packets into real
capture files, decode them with read_pcap, and compare with the synthesis
arithmetic replayed in SQL.

Supports the same envelope variety the decoder handles: both byte orders,
microsecond and nanosecond timestamp magic, Ethernet and Linux-cooked (SLL)
link types, optional 802.1Q VLAN tags, IPv4 and IPv6 (with an optional
hop-by-hop extension header), TCP options padding, and deliberately
undecodable frames (non-first IPv4 fragments, ARP) that the decoder must
drop.
"""

from __future__ import annotations

import ipaddress
import struct

import pandas as pd

_MAGICS = {
    ("<", False): b"\xd4\xc3\xb2\xa1",
    (">", False): b"\xa1\xb2\xc3\xd4",
    ("<", True): b"\x4d\x3c\xb2\xa1",
    (">", True): b"\xa1\xb2\x3c\x4d",
}


def _transport_bytes(r) -> bytes:
    dlen = int(r.dlen)
    if r.proto == 6:
        opt = int(r.hdr_opt)  # extra TCP option bytes (multiple of 4)
        data_offset = (20 + opt) // 4
        flags = (
            int(r.fin) * 1 + int(r.syn) * 2 + int(r.rst) * 4
            + int(r.psh) * 8 + int(r.ack) * 16
        )
        hdr = struct.pack(
            ">HHIIBBHHH",
            int(r.src_port), int(r.dst_port), int(r.seq) & 0xFFFFFFFF,
            int(r.ack_seq) & 0xFFFFFFFF, data_offset << 4, flags,
            int(r.window), 0, 0,
        )
        return hdr + b"\x00" * (opt + dlen)
    if r.proto == 17:
        return struct.pack(
            ">HHHH", int(r.src_port), int(r.dst_port), 8 + dlen, 0
        ) + b"\x00" * dlen
    # ICMP / ICMPv6: 4-byte header + payload
    return struct.pack(
        ">BBH", int(r.icmp_type), int(r.icmp_code), 0
    ) + b"\x00" * dlen


def _ip_bytes(r, transport: bytes) -> bytes:
    proto = int(r.proto)
    if bool(r.v6):
        src = ipaddress.IPv6Address(r.src_ip).packed
        dst = ipaddress.IPv6Address(r.dst_ip).packed
        ext = b""
        next_header = proto
        if bool(r.ext):
            # hop-by-hop: next header + len 0 (8 bytes total) + padding
            ext = struct.pack(">BB", proto, 0) + b"\x00" * 6
            next_header = 0
        payload_len = len(ext) + len(transport)
        hdr = struct.pack(
            ">IHBB", 0x60000000, payload_len, next_header, 64
        ) + src + dst
        return hdr + ext + transport
    src = ipaddress.IPv4Address(r.src_ip).packed
    dst = ipaddress.IPv4Address(r.dst_ip).packed
    total = 20 + len(transport)
    hdr = struct.pack(">BBHHHBBH", 0x45, 0, total, 0, 0, 64, proto, 0)
    return hdr + src + dst + transport


def _frag_frame() -> bytes:
    """Non-first IPv4 fragment (frag offset 100) — decoder must drop it
    (packet_features.rs fragment rule; pcap.py:_parse_ipv4)."""
    hdr = struct.pack(">BBHHHBBH", 0x45, 0, 20 + 12, 0, 100, 64, 17, 0)
    return hdr + b"\x0a\x00\x00\x01" + b"\x0a\x00\x00\x02" + b"\x00" * 12


def _link_wrap(ip: bytes, v6: bool, vlan: bool, sll: bool,
               ethertype: int | None = None) -> bytes:
    et = ethertype if ethertype is not None else (0x86DD if v6 else 0x0800)
    if vlan:
        # [.. 0x8100][TCI][real ethertype][ip]: decoder reads payload[2:4]
        first = 0x8100
        body = struct.pack(">HH", 0, et) + ip
    else:
        first = et
        body = ip
    if sll:
        return b"\x00" * 14 + struct.pack(">H", first) + body
    return b"\x00" * 12 + struct.pack(">H", first) + body


def encode_pcap_bytes(
    pdf: pd.DataFrame,
    endian: str = "<",
    ns: bool = False,
    sll: bool = False,
) -> bytes:
    """Encode packet rows into one classic-pcap capture.

    Required columns: ts_us, proto, v6, vlan, ext, src_ip, dst_ip,
    src_port, dst_port, dlen, fin, syn, rst, psh, ack, hdr_opt, seq,
    ack_seq, window, icmp_type, icmp_code, inject_frag, inject_arp.
    """
    link_type = 113 if sll else 1
    parts = [
        _MAGICS[(endian, ns)]
        + struct.pack(endian + "HHiIII", 2, 4, 0, 0, 65535, link_type)
    ]

    def record(ts_us: int, frame: bytes) -> None:
        frac = (ts_us % 1_000_000) * (1000 if ns else 1)
        parts.append(
            struct.pack(
                endian + "IIII", ts_us // 1_000_000, frac,
                len(frame), len(frame),
            )
        )
        parts.append(frame)

    for r in pdf.itertuples(index=False):
        ts_us = int(r.ts_us)
        if bool(r.inject_arp):
            # undecodable ethertype — must be skipped by the decoder
            record(ts_us, _link_wrap(b"\x00" * 28, False, False, sll, 0x0806))
        frame = _link_wrap(
            _ip_bytes(r, _transport_bytes(r)), bool(r.v6), bool(r.vlan), sll
        )
        record(ts_us, frame)
        if bool(r.inject_frag):
            record(ts_us, _link_wrap(_frag_frame(), False, False, sll))
    return b"".join(parts)
