"""Pure-Python oracle: row-by-row transliteration of the reference engine's
semantics, used only to validate the Spark kernels at test scale.

Semantics sources (all in /root/reference/rustiflow/src/):
  - flow_table.rs:23-246      FlowTable: directed-key map + reverse lookup,
                              expiry-on-arrival, periodic virtual-time scan,
                              flush-with-sort.
  - flows/basic_flow.rs       TCP lifecycle state machine, timeouts.
  - flows/features/*.rs       feature modules (Welford stats, IAT, active/
                              idle, subflow, bulk, payload/header/packet len,
                              tcp flags, window, icmp, retransmission,
                              tcp quality, timing).

This is NOT the engine — the engine is the vectorized Spark pipeline in
rustiflow_spark/. This file intentionally trades speed for line-by-line
auditability against the reference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

from rustiflow_spark.config import (
    ACK_FLAG,
    ACTIVE_IDLE_TIMEOUT_US,
    BULK_IDLE_MS,
    CAUSE_ACTIVE,
    CAUSE_IDLE,
    CAUSE_NONE,
    CAUSE_SHUTDOWN,
    CAUSE_TCP_RESET,
    CAUSE_TCP_TERM,
    CLOSE_BIDIRECTIONAL,
    CLOSE_FOUR_WAY,
    CLOSE_HALF,
    CLOSE_NONE,
    CLOSE_NOT_APPLICABLE,
    CLOSE_RESET,
    CLOSE_SIMULTANEOUS,
    FIN_FLAG,
    MIN_BULK_PACKETS,
    PROTO_ICMP,
    PROTO_ICMPV6,
    PROTO_TCP,
    SUBFLOW_TIMEOUT_US,
    SYN_FLAG,
)

U32 = 0xFFFFFFFF


@dataclass
class Packet:
    """PacketFeatures analog (packet_features.rs:60-84)."""

    src_ip: str
    dst_ip: str
    src_port: int
    dst_port: int
    protocol: int
    ts_us: int
    fin_flag: int = 0
    syn_flag: int = 0
    rst_flag: int = 0
    psh_flag: int = 0
    ack_flag: int = 0
    urg_flag: int = 0
    cwr_flag: int = 0
    ece_flag: int = 0
    data_length: int = 0
    header_length: int = 0
    length: int = 0
    window_size: int = 0
    sequence_number: int = 0
    sequence_number_ack: int = 0
    icmp_type: Optional[int] = None
    icmp_code: Optional[int] = None

    @property
    def flags(self) -> int:
        return (
            (FIN_FLAG if self.fin_flag else 0)
            | (SYN_FLAG if self.syn_flag else 0)
            | (0b100 if self.rst_flag else 0)
            | (0b1000 if self.psh_flag else 0)
            | (ACK_FLAG if self.ack_flag else 0)
            | (0b100000 if self.urg_flag else 0)
            | (0b1000000 if self.ece_flag else 0)
            | (0b10000000 if self.cwr_flag else 0)
        )

    def key(self):
        return (self.src_ip, self.src_port, self.dst_ip, self.dst_port, self.protocol)

    def rkey(self):
        return (self.dst_ip, self.dst_port, self.src_ip, self.src_port, self.protocol)


class Stats:
    """FeatureStats — Welford accumulator (features/util.rs:28-131)."""

    def __init__(self) -> None:
        self.total = 0.0
        self._min = math.inf
        self._max = -math.inf
        self.mean = 0.0
        self.m2 = 0.0
        self.count = 0

    def add(self, value: float) -> None:
        self.total += value
        self._min = min(self._min, value)
        self._max = max(self._max, value)
        self.count += 1
        delta = value - self.mean
        self.mean += delta / self.count
        self.m2 += delta * (value - self.mean)

    @property
    def min(self) -> float:
        return self._min if self.count else 0.0

    @property
    def max(self) -> float:
        return self._max if self.count else 0.0

    @property
    def std(self) -> float:
        return math.sqrt(self.m2 / self.count) if self.count else 0.0

    def values(self) -> dict:
        return {
            "total": self.total,
            "mean": self.mean,
            "std": self.std,
            "max": self.max,
            "min": self.min,
            "count": self.count,
        }


def safe_div(a: float, b: float) -> float:
    return 0.0 if b == 0 else a / b


def safe_rate(value: float, duration_us: float) -> float:
    return safe_div(value, duration_us / 1_000_000.0)


class OracleFlow:
    """One live flow: BasicFlow + every feature module (cic_flow.rs:25-37,
    rusti_flow.rs:28-43)."""

    def __init__(self, pkt: Packet) -> None:
        self.flow_key = f"{pkt.src_ip}:{pkt.src_port}-{pkt.dst_ip}:{pkt.dst_port}-{pkt.protocol}"
        self.src_ip, self.src_port = pkt.src_ip, pkt.src_port
        self.dst_ip, self.dst_port = pkt.dst_ip, pkt.dst_port
        self.protocol = pkt.protocol
        self.first_ts = pkt.ts_us
        self.last_ts = pkt.ts_us
        self.cause = CAUSE_NONE

        # BasicFlow TCP lifecycle (basic_flow.rs:70-85)
        self.state_fwd = "Established"
        self.state_bwd = "Established"
        self.expected_ack_seq_fwd: Optional[int] = None
        self.expected_ack_seq_bwd: Optional[int] = None
        self.saw_syn_fwd = False
        self.saw_syn_ack_bwd = False
        self.expected_handshake_ack_seq_fwd: Optional[int] = None
        self.handshake_completed = False
        self.reset_before_handshake = False
        self.reset_after_handshake = False
        self.close_style = CLOSE_NONE
        self.saw_fin_fwd = False
        self.saw_fin_bwd = False
        self.simultaneous_close = False

        # IATStats (iat_stats.rs)
        self.iat = Stats()
        self.fwd_iat = Stats()
        self.bwd_iat = Stats()
        self._last_ts_any: Optional[int] = None
        self._last_ts_fwd: Optional[int] = None
        self._last_ts_bwd: Optional[int] = None

        # ActiveIdleStats (active_idle_stats.rs)
        self.active_start = pkt.ts_us
        self.active_end = pkt.ts_us
        self.active_stats = Stats()
        self.idle_stats = Stats()

        # SubflowStats (subflow_stats.rs)
        self.subflow_count = 0
        self._seen_packet = False

        # BulkStats (bulk_stats.rs)
        self.fwd_bulk_size = Stats()
        self.fwd_bulk_packets = Stats()
        self.fwd_bulk_duration = Stats()
        self.bwd_bulk_size = Stats()
        self.bwd_bulk_packets = Stats()
        self.bwd_bulk_duration = Stats()
        self._fwd_bulk: Optional[list] = None  # [start, last, count, size]
        self._bwd_bulk: Optional[list] = None

        # Payload (payload_stats.rs)
        self.payload_len = Stats()
        self.fwd_payload_len = Stats()
        self.bwd_payload_len = Stats()
        self.fwd_non_zero_payload = 0
        self.bwd_non_zero_payload = 0

        # Header (header_stats.rs)
        self.header_len = Stats()
        self.fwd_header_len = Stats()
        self.bwd_header_len = Stats()

        # PacketLength (packet_stats.rs)
        self.fwd_packet_len = Stats()
        self.bwd_packet_len = Stats()

        # TcpFlagStats (tcp_flag_stats.rs)
        self.flag_counts = {
            d + f: 0
            for d in ("fwd_", "bwd_")
            for f in ("fin", "syn", "rst", "psh", "ack", "urg", "cwr", "ece")
        }

        # WindowSize (window_size_stats.rs)
        self.fwd_init_window = 0
        self.bwd_init_window = 0
        self.window_size = Stats()
        self.fwd_window_size = Stats()
        self.bwd_window_size = Stats()

        # ICMP (icmp_stats.rs)
        self.icmp_first = True
        self.icmp_type: Optional[int] = None
        self.icmp_code: Optional[int] = None
        self.icmp_echo_request = 0
        self.icmp_echo_reply = 0
        self.icmp_error = 0
        self.icmp_dest_unreachable = 0

        # Retransmission (retransmission_stats.rs)
        self.fwd_retrans = 0
        self.bwd_retrans = 0
        self._fwd_ranges: list = []
        self._bwd_ranges: list = []

        # TcpQuality (tcp_quality_stats.rs)
        self.fwd_dup_ack = 0
        self.bwd_dup_ack = 0
        self.fwd_zero_window = 0
        self.bwd_zero_window = 0
        self._last_fwd_ack: Optional[tuple] = None
        self._last_bwd_ack: Optional[tuple] = None

        # Timing (timing_stats.rs)
        self.first_ts_fwd: Optional[int] = None
        self.first_ts_bwd: Optional[int] = None
        self.last_ts_fwd: Optional[int] = None
        self.last_ts_bwd: Optional[int] = None

    # --- BasicFlow state machine -------------------------------------------

    def _observe_handshake(self, pkt: Packet, fwd: bool) -> None:
        # basic_flow.rs:92-119
        if self.protocol != PROTO_TCP or self.handshake_completed:
            return
        if fwd and pkt.syn_flag > 0 and pkt.ack_flag == 0:
            self.saw_syn_fwd = True
            self.saw_syn_ack_bwd = False
            self.expected_handshake_ack_seq_fwd = None
            return
        if (not fwd) and self.saw_syn_fwd and pkt.syn_flag > 0 and pkt.ack_flag > 0:
            self.saw_syn_ack_bwd = True
            self.expected_handshake_ack_seq_fwd = (pkt.sequence_number + 1) & U32
            return
        if (
            fwd
            and self.saw_syn_fwd
            and self.saw_syn_ack_bwd
            and pkt.ack_flag > 0
            and pkt.syn_flag == 0
            and pkt.sequence_number_ack == self.expected_handshake_ack_seq_fwd
        ):
            self.handshake_completed = True

    def _update_close_style(self, cause: str) -> None:
        # basic_flow.rs:121-141
        if self.protocol != PROTO_TCP:
            self.close_style = CLOSE_NOT_APPLICABLE
        elif cause == CAUSE_TCP_RESET:
            self.close_style = CLOSE_RESET
        elif self.saw_fin_fwd and self.saw_fin_bwd:
            if self.state_fwd == "FinAcked" and self.state_bwd == "FinAcked":
                self.close_style = (
                    CLOSE_SIMULTANEOUS if self.simultaneous_close else CLOSE_FOUR_WAY
                )
            else:
                self.close_style = CLOSE_BIDIRECTIONAL
        elif self.saw_fin_fwd or self.saw_fin_bwd:
            self.close_style = CLOSE_HALF
        else:
            self.close_style = CLOSE_NONE

    def _is_tcp_finished(self, pkt: Packet, fwd: bool) -> bool:
        # basic_flow.rs:155-191
        if pkt.fin_flag > 0:
            if fwd:
                if self.state_bwd == "FinSent":
                    self.simultaneous_close = True
                self.saw_fin_fwd = True
                self.state_fwd = "FinSent"
                self.expected_ack_seq_bwd = (pkt.sequence_number + pkt.data_length + 1) & U32
            else:
                if self.state_fwd == "FinSent":
                    self.simultaneous_close = True
                self.saw_fin_bwd = True
                self.state_bwd = "FinSent"
                self.expected_ack_seq_fwd = (pkt.sequence_number + pkt.data_length + 1) & U32

        if (
            self.state_bwd == "FinSent"
            and fwd
            and self.expected_ack_seq_fwd is not None
            and pkt.sequence_number_ack == self.expected_ack_seq_fwd
        ):
            self.state_bwd = "FinAcked"
        elif (
            self.state_fwd == "FinSent"
            and not fwd
            and self.expected_ack_seq_bwd is not None
            and pkt.sequence_number_ack == self.expected_ack_seq_bwd
        ):
            self.state_fwd = "FinAcked"

        return self.state_fwd == "FinAcked" and self.state_bwd == "FinAcked"

    # --- Feature modules ----------------------------------------------------

    def _update_bulk(self, pkt: Packet, fwd: bool) -> None:
        # bulk_stats.rs:115-161 — ms-truncated timestamps, skip length==0
        current_ts = pkt.ts_us // 1000
        if pkt.length == 0:
            return
        bulk = self._fwd_bulk if fwd else self._bwd_bulk
        if bulk is not None:
            gap_ms = current_ts - bulk[1]
            if gap_ms > BULK_IDLE_MS:
                self._finalize_bulk(bulk, fwd)
                new_bulk = [current_ts, current_ts, 1, pkt.length]
                if fwd:
                    self._fwd_bulk = new_bulk
                else:
                    self._bwd_bulk = new_bulk
            else:
                bulk[2] += 1
                bulk[3] += pkt.length
                bulk[1] = current_ts
        else:
            new_bulk = [current_ts, current_ts, 1, pkt.length]
            if fwd:
                self._fwd_bulk = new_bulk
            else:
                self._bwd_bulk = new_bulk
            # starting a new bulk in this direction finalizes the other side
            self._finalize_current_bulk(not fwd)

    def _finalize_bulk(self, bulk: list, fwd: bool) -> None:
        # bulk_stats.rs:82-96
        if bulk[2] >= MIN_BULK_PACKETS:
            duration_ms = bulk[1] - bulk[0]
            if fwd:
                self.fwd_bulk_packets.add(float(bulk[2]))
                self.fwd_bulk_size.add(float(bulk[3]))
                self.fwd_bulk_duration.add(float(duration_ms))
            else:
                self.bwd_bulk_packets.add(float(bulk[2]))
                self.bwd_bulk_size.add(float(bulk[3]))
                self.bwd_bulk_duration.add(float(duration_ms))

    def _finalize_current_bulk(self, fwd: bool) -> None:
        bulk = self._fwd_bulk if fwd else self._bwd_bulk
        if bulk is not None:
            self._finalize_bulk(bulk, fwd)
        if fwd:
            self._fwd_bulk = None
        else:
            self._bwd_bulk = None

    def fwd_bulk_rate(self) -> float:
        # bulk_stats.rs:65-70 — ms totals divided by 1e6 (CICFlowMeter quirk);
        # zero total duration divides by 0.0 -> +inf, as Rust f64 does
        if self.fwd_bulk_duration.count == 0:
            return 0.0
        denom = self.fwd_bulk_duration.total / 1_000_000.0
        return self.fwd_bulk_size.total / denom if denom else math.inf

    def bwd_bulk_rate(self) -> float:
        if self.bwd_bulk_duration.count == 0:
            return 0.0
        denom = self.bwd_bulk_duration.total / 1_000_000.0
        return self.bwd_bulk_size.total / denom if denom else math.inf

    def _update_retransmission(self, pkt: Packet, fwd: bool) -> None:
        # retransmission_stats.rs:66-146
        if pkt.protocol != PROTO_TCP:
            return
        if pkt.flags == ACK_FLAG and pkt.data_length == 0:
            return
        control = int(pkt.flags & SYN_FLAG != 0) + int(pkt.flags & FIN_FLAG != 0)
        seg_len = pkt.data_length + control
        if seg_len == 0:
            return
        start = pkt.sequence_number
        end = min(start + seg_len, U32)  # saturating u32 add
        ranges = self._fwd_ranges if fwd else self._bwd_ranges
        if any(s < end and start < e for s, e in ranges):
            if fwd:
                self.fwd_retrans += 1
            else:
                self.bwd_retrans += 1
        # insert + merge (retransmission_stats.rs:126-146)
        ns, ne = start, end
        i = 0
        while i < len(ranges):
            cs, ce = ranges[i]
            if ce < ns:
                i += 1
                continue
            if ne < cs:
                break
            ns = min(ns, cs)
            ne = max(ne, ce)
            ranges.pop(i)
        ranges.insert(i, (ns, ne))

    def _update_tcp_quality(self, pkt: Packet, fwd: bool) -> None:
        # tcp_quality_stats.rs:70-94
        if pkt.protocol != PROTO_TCP:
            return
        if pkt.window_size == 0:
            if fwd:
                self.fwd_zero_window += 1
            else:
                self.bwd_zero_window += 1
        candidate = pkt.flags == ACK_FLAG and pkt.data_length == 0
        last = self._last_fwd_ack if fwd else self._last_bwd_ack
        if not candidate:
            new_last = None
        else:
            obs = (pkt.sequence_number_ack, pkt.window_size)
            if last is not None and last == obs:
                if fwd:
                    self.fwd_dup_ack += 1
                else:
                    self.bwd_dup_ack += 1
            new_last = obs
        if fwd:
            self._last_fwd_ack = new_last
        else:
            self._last_bwd_ack = new_last

    def _update_icmp(self, pkt: Packet) -> None:
        # icmp_stats.rs:38-81
        if pkt.protocol not in (PROTO_ICMP, PROTO_ICMPV6):
            return
        if self.icmp_first:
            self.icmp_type = pkt.icmp_type
            self.icmp_code = pkt.icmp_code
            self.icmp_first = False
        t = pkt.icmp_type
        if pkt.protocol == PROTO_ICMP:
            if t == 8:
                self.icmp_echo_request += 1
            elif t == 0:
                self.icmp_echo_reply += 1
            elif t == 3:
                self.icmp_error += 1
                self.icmp_dest_unreachable += 1
            elif t in (4, 5, 11, 12):
                self.icmp_error += 1
        else:
            if t == 128:
                self.icmp_echo_request += 1
            elif t == 129:
                self.icmp_echo_reply += 1
            elif t == 1:
                self.icmp_error += 1
                self.icmp_dest_unreachable += 1
            elif t in (2, 3, 4):
                self.icmp_error += 1

    # --- update / close / expiry -------------------------------------------

    def update(self, pkt: Packet, fwd: bool) -> bool:
        """cic_flow.rs:72-92 — basic flow first, then modules with the
        pre-update last timestamp; returns True if terminated."""
        prev_last = self.last_ts
        self.last_ts = pkt.ts_us
        self._observe_handshake(pkt, fwd)
        terminated = False
        if self._is_tcp_finished(pkt, fwd):
            self.cause = CAUSE_TCP_TERM
            self._update_close_style(self.cause)
            terminated = True
        elif self.protocol == PROTO_TCP and pkt.rst_flag > 0:
            if self.handshake_completed:
                self.reset_after_handshake = True
            else:
                self.reset_before_handshake = True
            self.cause = CAUSE_TCP_RESET
            self._update_close_style(self.cause)
            terminated = True

        ts = pkt.ts_us

        # IAT (ms floats)
        if self._last_ts_any is not None:
            self.iat.add((ts - self._last_ts_any) / 1000.0)
        self._last_ts_any = ts
        if fwd:
            if self._last_ts_fwd is not None:
                self.fwd_iat.add((ts - self._last_ts_fwd) / 1000.0)
            self._last_ts_fwd = ts
        else:
            if self._last_ts_bwd is not None:
                self.bwd_iat.add((ts - self._last_ts_bwd) / 1000.0)
            self._last_ts_bwd = ts

        # Flags
        pfx = "fwd_" if fwd else "bwd_"
        for name, val in (
            ("fin", pkt.fin_flag),
            ("syn", pkt.syn_flag),
            ("rst", pkt.rst_flag),
            ("psh", pkt.psh_flag),
            ("ack", pkt.ack_flag),
            ("urg", pkt.urg_flag),
            ("cwr", pkt.cwr_flag),
            ("ece", pkt.ece_flag),
        ):
            self.flag_counts[pfx + name] += int(val)

        # Header length
        self.header_len.add(float(pkt.header_length))
        (self.fwd_header_len if fwd else self.bwd_header_len).add(float(pkt.header_length))

        # Payload length
        self.payload_len.add(float(pkt.data_length))
        if fwd:
            self.fwd_payload_len.add(float(pkt.data_length))
            if pkt.data_length > 0:
                self.fwd_non_zero_payload += 1
        else:
            self.bwd_payload_len.add(float(pkt.data_length))
            if pkt.data_length > 0:
                self.bwd_non_zero_payload += 1

        # Packet length
        (self.fwd_packet_len if fwd else self.bwd_packet_len).add(float(pkt.length))

        # Bulk
        self._update_bulk(pkt, fwd)

        # Subflow (gap vs flow's pre-update last timestamp)
        if not self._seen_packet:
            self.subflow_count = 1
            self._seen_packet = True
        elif (ts - prev_last) > SUBFLOW_TIMEOUT_US:
            self.subflow_count += 1

        # Active/Idle
        idle_gap = ts - self.active_end
        if idle_gap > ACTIVE_IDLE_TIMEOUT_US:
            active_dur = self.active_end - self.active_start
            if active_dur > 0:
                self.active_stats.add(active_dur / 1000.0)
            self.idle_stats.add(idle_gap / 1000.0)
            self.active_start = ts
        self.active_end = ts

        # ICMP
        self._update_icmp(pkt)

        # Retransmission + TCP quality
        self._update_retransmission(pkt, fwd)
        self._update_tcp_quality(pkt, fwd)

        # Window size
        self.window_size.add(float(pkt.window_size))
        if fwd:
            if self.fwd_window_size.count == 0:
                self.fwd_init_window = pkt.window_size
            self.fwd_window_size.add(float(pkt.window_size))
        else:
            if self.bwd_window_size.count == 0:
                self.bwd_init_window = pkt.window_size
            self.bwd_window_size.add(float(pkt.window_size))

        # Timing
        if fwd:
            if self.first_ts_fwd is None:
                self.first_ts_fwd = ts
            self.last_ts_fwd = ts
        else:
            if self.first_ts_bwd is None:
                self.first_ts_bwd = ts
            self.last_ts_bwd = ts

        return terminated

    def close(self, ts_us: int, cause: str) -> None:
        """BasicFlow.close_flow + every module's close (cic_flow.rs:94-107)."""
        self.cause = cause
        self._update_close_style(cause)
        # ActiveIdle close (active_idle_stats.rs:43-55)
        duration = self.active_end - self.active_start
        if duration > 0:
            self.active_stats.add(duration / 1000.0)
        if cause == CAUSE_IDLE:
            self.idle_stats.add((ts_us - self.active_end) / 1000.0)
        # Bulk close
        self._finalize_current_bulk(True)
        self._finalize_current_bulk(False)

    def is_expired(self, ts_us: int, active_timeout: int, idle_timeout: int):
        # basic_flow.rs:351-370
        if self.cause != CAUSE_NONE:
            return True, self.cause
        if (ts_us - self.first_ts) // 1_000_000 > active_timeout:
            return True, CAUSE_ACTIVE
        if (ts_us - self.last_ts) // 1_000_000 > idle_timeout:
            return True, CAUSE_IDLE
        return False, CAUSE_NONE

    # --- exported feature dict ---------------------------------------------

    def flags_string(self) -> str:
        # tcp_flag_stats.rs:49-82
        fc = self.flag_counts
        out = []
        for ch, name in (("U", "urg"), ("A", "ack"), ("P", "psh"), ("R", "rst"), ("S", "syn"), ("F", "fin")):
            out.append(ch if fc["fwd_" + name] + fc["bwd_" + name] else ".")
        return "".join(out)

    def features(self) -> dict:
        """Full feature superset, flat dict."""
        dur_us = self.last_ts - self.first_ts
        d = {
            "flow_key": self.flow_key,
            "src_ip": self.src_ip,
            "src_port": self.src_port,
            "dst_ip": self.dst_ip,
            "dst_port": self.dst_port,
            "protocol": self.protocol,
            "first_ts_us": self.first_ts,
            "last_ts_us": self.last_ts,
            "duration_us": dur_us,
            "cause": self.cause,
            "close_style": self.close_style if self.protocol == PROTO_TCP else CLOSE_NOT_APPLICABLE,
            "handshake_completed": int(self.handshake_completed),
            "reset_before_handshake": int(self.reset_before_handshake),
            "reset_after_handshake": int(self.reset_after_handshake),
            "subflow_count": self.subflow_count,
            "fwd_init_window_size": self.fwd_init_window,
            "bwd_init_window_size": self.bwd_init_window,
            "icmp_type": self.icmp_type if self.icmp_type is not None else -1,
            "icmp_code": self.icmp_code if self.icmp_code is not None else -1,
            "icmp_echo_request_count": self.icmp_echo_request,
            "icmp_echo_reply_count": self.icmp_echo_reply,
            "icmp_error_count": self.icmp_error,
            "icmp_destination_unreachable_count": self.icmp_dest_unreachable,
            "fwd_retransmission_count": self.fwd_retrans,
            "bwd_retransmission_count": self.bwd_retrans,
            "fwd_duplicate_ack_count": self.fwd_dup_ack,
            "bwd_duplicate_ack_count": self.bwd_dup_ack,
            "fwd_zero_window_count": self.fwd_zero_window,
            "bwd_zero_window_count": self.bwd_zero_window,
            "fwd_non_zero_payload_packets": self.fwd_non_zero_payload,
            "bwd_non_zero_payload_packets": self.bwd_non_zero_payload,
            "fwd_bulk_rate": self.fwd_bulk_rate(),
            "bwd_bulk_rate": self.bwd_bulk_rate(),
            "flags": self.flags_string(),
            "first_ts_fwd_ms": self.first_ts_fwd / 1000.0 if self.first_ts_fwd is not None else 0.0,
            "first_ts_bwd_ms": self.first_ts_bwd / 1000.0 if self.first_ts_bwd is not None else 0.0,
            "last_ts_fwd_ms": self.last_ts_fwd / 1000.0 if self.last_ts_fwd is not None else 0.0,
            "last_ts_bwd_ms": self.last_ts_bwd / 1000.0 if self.last_ts_bwd is not None else 0.0,
            "fwd_duration_ms": (
                (self.last_ts_fwd - self.first_ts_fwd) / 1000.0
                if self.first_ts_fwd is not None
                else 0.0
            ),
            "bwd_duration_ms": (
                (self.last_ts_bwd - self.first_ts_bwd) / 1000.0
                if self.first_ts_bwd is not None
                else 0.0
            ),
        }
        for name, st in (
            ("iat", self.iat),
            ("fwd_iat", self.fwd_iat),
            ("bwd_iat", self.bwd_iat),
            ("active", self.active_stats),
            ("idle", self.idle_stats),
            ("payload_len", self.payload_len),
            ("fwd_payload_len", self.fwd_payload_len),
            ("bwd_payload_len", self.bwd_payload_len),
            ("header_len", self.header_len),
            ("fwd_header_len", self.fwd_header_len),
            ("bwd_header_len", self.bwd_header_len),
            ("fwd_packet_len", self.fwd_packet_len),
            ("bwd_packet_len", self.bwd_packet_len),
            ("window_size", self.window_size),
            ("fwd_window_size", self.fwd_window_size),
            ("bwd_window_size", self.bwd_window_size),
            ("fwd_bulk_packets", self.fwd_bulk_packets),
            ("bwd_bulk_packets", self.bwd_bulk_packets),
            ("fwd_bulk_bytes", self.fwd_bulk_size),
            ("bwd_bulk_bytes", self.bwd_bulk_size),
            ("fwd_bulk_duration", self.fwd_bulk_duration),
            ("bwd_bulk_duration", self.bwd_bulk_duration),
        ):
            for k, v in st.values().items():
                d[f"{name}_{k}"] = v
        for k, v in self.flag_counts.items():
            d[k + "_flag_count"] = v
        return d


class OracleFlowTable:
    """FlowTable transliteration (flow_table.rs:23-246): directed-key map,
    reverse lookup, expiry-on-arrival replacement, periodic virtual-time
    expiry scan, flush sorted by first timestamp."""

    def __init__(
        self,
        active_timeout: int = 3600,
        idle_timeout: int = 120,
        early_export: Optional[int] = None,
        expiration_check_interval: int = 60,
    ) -> None:
        self.flows: dict = {}
        self.active = active_timeout
        self.idle = idle_timeout
        self.early_export = early_export
        self.check_interval_us = expiration_check_interval * 1_000_000
        self.next_check_us: Optional[int] = None
        self.exported: list = []

    def process(self, pkt: Packet) -> None:
        # periodic scan (flow_table.rs:207-219)
        if self.next_check_us is None or pkt.ts_us >= self.next_check_us:
            self._export_expired(pkt.ts_us)
            self.next_check_us = pkt.ts_us + self.check_interval_us

        if self._process_existing(pkt, pkt.key(), True):
            return
        if self._process_existing(pkt, pkt.rkey(), False):
            return
        self._create_and_insert(pkt)

    def _create_and_insert(self, pkt: Packet) -> None:
        flow = OracleFlow(pkt)
        terminated = flow.update(pkt, True)
        if terminated:
            self._export(flow)
        else:
            if self._check_early_export(flow, pkt):
                self._export_snapshot(flow, pkt.ts_us)
            self.flows[pkt.key()] = flow

    def _check_early_export(self, flow: OracleFlow, pkt: Packet) -> bool:
        return (
            self.early_export is not None
            and (pkt.ts_us - flow.first_ts) // 1_000_000 > self.early_export
        )

    def _export_snapshot(self, flow: OracleFlow, ts_us: int) -> None:
        import copy

        snap = copy.deepcopy(flow)
        self.exported.append(snap)

    def _process_existing(self, pkt: Packet, key, fwd: bool) -> bool:
        flow = self.flows.get(key)
        if flow is None:
            return False
        expired, cause = flow.is_expired(pkt.ts_us, self.active, self.idle)
        if expired:
            del self.flows[key]
            flow.close(pkt.ts_us, cause)
            self._export(flow)
            self._create_and_insert(pkt)
        else:
            terminated = flow.update(pkt, fwd)
            if terminated:
                del self.flows[key]
                self._export(flow)
            elif self._check_early_export(flow, pkt):
                self._export_snapshot(flow, pkt.ts_us)
        return True

    def _export(self, flow: OracleFlow) -> None:
        self.exported.append(flow)

    def _export_expired(self, ts_us: int) -> None:
        expired = []
        for key, flow in self.flows.items():
            is_exp, cause = flow.is_expired(ts_us, self.active, self.idle)
            if is_exp:
                expired.append((key, cause))
        for key, cause in expired:
            flow = self.flows.pop(key)
            flow.close(ts_us, cause)
            self._export(flow)

    def flush(self, ts_us: int) -> None:
        # flow_table.rs:180-195 — sort residual flows by first timestamp
        residual = sorted(self.flows.values(), key=lambda f: f.first_ts)
        self.flows.clear()
        for flow in residual:
            flow.close(ts_us, CAUSE_SHUTDOWN)
            self._export(flow)

    def run(self, packets: list) -> list:
        """Process all packets in order, flush at last ts, return feature dicts."""
        for pkt in packets:
            self.process(pkt)
        if packets:
            self.flush(packets[-1].ts_us)
        return [f.features() for f in self.exported]
