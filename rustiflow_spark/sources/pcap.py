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
    """Decode records starting at byte `off`. A record whose header starts
    at >= stop_before is left for the next split (its body may still be
    read from this buffer past stop_before — splits read with overlap)."""
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


def decode_pcap_bytes(data: bytes) -> pd.DataFrame:
    endian, ns, link_type = parse_pcap_header(data)
    rows = _decode_records(data, 24, endian, ns, link_type)
    df = pd.DataFrame(rows)
    if len(df):
        df = df.sort_values("ts_us", kind="mergesort").reset_index(drop=True)
        df["event_seq"] = range(len(df))
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
    Returns None when no boundary exists within _RESYNC_SCAN bytes."""
    frac_lim = 1_000_000_000 if ns else 1_000_000
    n = len(data)
    limit = min(n - 16, start + _RESYNC_SCAN)
    for o in range(start, limit + 1):
        p = o
        ok = 0
        while ok < chain and p + 16 <= n:
            ts_sec, ts_frac, incl, orig = struct.unpack(
                endian + "IIII", data[p : p + 16]
            )
            if not (_TS_SEC_MIN <= ts_sec <= _TS_SEC_MAX):
                break
            if ts_frac >= frac_lim or incl == 0:
                break
            if incl > MAX_SANE_FRAME or orig > MAX_SANE_FRAME:
                break
            p += 16 + incl
            ok += 1
        if ok == chain or (ok >= 1 and p + 16 > n):
            return o
    return None


def decode_pcap_split(
    path: str, start: int, end: int, endian: str, ns: bool, link_type: int
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
    offs: list[int] = []
    rows = _decode_records(
        data, local, endian, ns, link_type,
        stop_before=end - start, offsets_out=offs,
    )
    df = pd.DataFrame(rows)
    if len(df):
        df["event_seq"] = np.asarray(offs, dtype=np.int64) + start
        df = df.sort_values(
            ["ts_us", "event_seq"], kind="mergesort"
        ).reset_index(drop=True)
    return df


def read_pcap(spark, path: str, split_size: int | None = None):
    """Distributed pcap source: path/glob of .pcap files -> packet-event
    DataFrame (schema.PACKET_EVENT_SCHEMA), decoded on the executors.

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
    (path-hash << 34) | absolute-record-offset — a different value from the
    default mode's packet index but the identical (ts_us, event_seq) sort
    order. Splits read byte ranges directly from the file path, so the
    path must be visible from the executors (local/NFS; on object stores
    keep the default whole-file mode or mount the bucket).
    """
    import glob as globmod
    import zlib

    from rustiflow_spark.schema import PACKET_EVENT_SCHEMA

    cols = [f.name for f in PACKET_EVENT_SCHEMA.fields]

    if split_size is not None:
        if os.path.isdir(path):
            files = sorted(globmod.glob(os.path.join(path, "*.pcap")))
        else:
            files = sorted(globmod.glob(path))
        specs = []
        for fp in files:
            with open(fp, "rb") as f:
                endian, ns, link = parse_pcap_header(f.read(24))
            size = os.path.getsize(fp)
            start = 24
            while start < size:
                end = min(start + split_size, size)
                specs.append((fp, start, end, endian, ns, link))
                start = end
        if not specs:
            return spark.createDataFrame([], schema=PACKET_EVENT_SCHEMA)

        def decode_splits(batches):
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    out = decode_pcap_split(
                        r.path, int(r.start), int(r.end),
                        r.endian, bool(r.ns), int(r.link),
                    )
                    if not len(out):
                        continue
                    base = (zlib.crc32(r.path.encode()) & 0x1FFFFFFF) << 34
                    out["event_seq"] = base + out["event_seq"].astype("int64")
                    yield out.reindex(columns=cols)

        spec_df = spark.createDataFrame(
            specs, schema="path string, start long, end long, endian string, ns boolean, link int"
        ).repartition(len(specs))
        return spec_df.mapInPandas(decode_splits, schema=PACKET_EVENT_SCHEMA)

    def decode(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                out = decode_pcap_bytes(bytes(row["content"]))
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
        .mapInPandas(decode, schema=PACKET_EVENT_SCHEMA)
    )
