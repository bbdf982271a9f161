"""Vectorized per-biflow sessionization + feature extraction kernel.

Runs inside Arrow-batched pandas UDFs (``applyInPandas`` /
``mapInPandas``): one invocation receives all packets of one canonical
biflow key (or a batch of keys), sorted by (ts_us, event_seq), and emits
one output row per exported flow (session), replicating the reference's
``FlowTable`` semantics (rustiflow/src/flow_table.rs:23-246):

  * idle timeout:  (t - last)/1e6  > idle   (basic_flow.rs:365-367)
  * active timeout:(t - first)/1e6 > active (basic_flow.rs:361-363)
  * TCP FIN/RST termination cuts (basic_flow.rs:155-191, 287-308)
  * expired-on-arrival replacement (flow_table.rs:120-126)
  * periodic virtual-time expiry scan (flow_table.rs:207-245) — reproduced
    from a precomputed shard-global scan timeline (see timeline.py)
  * exporter-shutdown flush at the shard's last event time
    (flow_table.rs:180-195)

Key batch-vs-stream insight exploited here: the periodic scan never changes
*which* packet starts a new session (a scan can only close a flow the next
same-biflow packet would also observe as expired, because scan times are
event timestamps processed in order). It only affects the close timestamp
and cause of sessions whose expiry is not observed by a successor packet.
So segmentation is computed locally per biflow, and scan times enter only
the close-ts/cause computation.

All statistics are computed as two-pass vectorized NumPy (float64); the
reference's single-pass Welford accumulation (features/util.rs:97-107) is
mathematically identical for population statistics — parity is asserted via
np.allclose in tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from rustiflow_spark.config import (
    ACK_FLAG,
    ACTIVE_IDLE_TIMEOUT_US,
    BULK_IDLE_MS,
    CAUSE_ACTIVE,
    CAUSE_IDLE,
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
    US_PER_S,
    EngineConfig,
)

U32_MAX = 0xFFFFFFFF


@dataclass
class Session:
    start: int  # index into group arrays (inclusive)
    end: int  # exclusive
    cause: str
    close_ts: int  # observation timestamp passed to close(); same as last
    # packet ts for terminated sessions (close not invoked)
    closed: bool  # whether close() semantics apply (False for TCP-terminated
    # and early-export snapshots: reference exports those
    # without calling close_flow — flow_table.rs:95-97,113-119)
    # TCP lifecycle results (state machine)
    handshake_completed: bool = False
    reset_before_handshake: bool = False
    reset_after_handshake: bool = False
    close_style: str = CLOSE_NONE
    snapshot_of: int = -1  # >=0: early-export snapshot ending at this index


class _TcpState:
    """BasicFlow TCP lifecycle per session (basic_flow.rs:70-190)."""

    __slots__ = (
        "state_fwd",
        "state_bwd",
        "exp_ack_fwd",
        "exp_ack_bwd",
        "saw_syn_fwd",
        "saw_syn_ack_bwd",
        "exp_hs_ack",
        "handshake",
        "reset_before",
        "reset_after",
        "saw_fin_fwd",
        "saw_fin_bwd",
        "simultaneous",
    )

    EST, FIN_SENT, FIN_ACKED = 0, 1, 2

    def __init__(self) -> None:
        self.state_fwd = self.EST
        self.state_bwd = self.EST
        self.exp_ack_fwd = -1
        self.exp_ack_bwd = -1
        self.saw_syn_fwd = False
        self.saw_syn_ack_bwd = False
        self.exp_hs_ack = -1
        self.handshake = False
        self.reset_before = False
        self.reset_after = False
        self.saw_fin_fwd = False
        self.saw_fin_bwd = False
        self.simultaneous = False

    def observe_handshake(self, fwd, syn, ack, seq, ack_seq) -> None:
        if self.handshake:
            return
        if fwd and syn and not ack:
            self.saw_syn_fwd = True
            self.saw_syn_ack_bwd = False
            self.exp_hs_ack = -1
            return
        if (not fwd) and self.saw_syn_fwd and syn and ack:
            self.saw_syn_ack_bwd = True
            self.exp_hs_ack = (seq + 1) & U32_MAX
            return
        if (
            fwd
            and self.saw_syn_fwd
            and self.saw_syn_ack_bwd
            and ack
            and not syn
            and ack_seq == self.exp_hs_ack
        ):
            self.handshake = True

    def is_finished(self, fwd, fin, seq, ack_seq, data_len) -> bool:
        if fin:
            if fwd:
                if self.state_bwd == self.FIN_SENT:
                    self.simultaneous = True
                self.saw_fin_fwd = True
                self.state_fwd = self.FIN_SENT
                self.exp_ack_bwd = (seq + data_len + 1) & U32_MAX
            else:
                if self.state_fwd == self.FIN_SENT:
                    self.simultaneous = True
                self.saw_fin_bwd = True
                self.state_bwd = self.FIN_SENT
                self.exp_ack_fwd = (seq + data_len + 1) & U32_MAX
        if self.state_bwd == self.FIN_SENT and fwd and ack_seq == self.exp_ack_fwd >= 0:
            self.state_bwd = self.FIN_ACKED
        elif self.state_fwd == self.FIN_SENT and (not fwd) and ack_seq == self.exp_ack_bwd >= 0:
            self.state_fwd = self.FIN_ACKED
        return self.state_fwd == self.FIN_ACKED and self.state_bwd == self.FIN_ACKED

    def close_style(self, cause: str) -> str:
        # basic_flow.rs:121-141 (TCP branch; non-TCP handled by caller)
        if cause == CAUSE_TCP_RESET:
            return CLOSE_RESET
        if self.saw_fin_fwd and self.saw_fin_bwd:
            if self.state_fwd == self.FIN_ACKED and self.state_bwd == self.FIN_ACKED:
                return CLOSE_SIMULTANEOUS if self.simultaneous else CLOSE_FOUR_WAY
            return CLOSE_BIDIRECTIONAL
        if self.saw_fin_fwd or self.saw_fin_bwd:
            return CLOSE_HALF
        return CLOSE_NONE


def _first_scan_at_or_after(scan_times: np.ndarray, t: int) -> int:
    """Smallest scan time >= t, or -1."""
    if scan_times.size == 0:
        return -1
    i = int(np.searchsorted(scan_times, t, side="left"))
    if i >= scan_times.size:
        return -1
    return int(scan_times[i])


def _timeout_close(cfg: EngineConfig, first_ts: int, last_ts: int, next_pkt_ts: int,
                   scan_times: np.ndarray, flush_ts: int):
    """Close observation time + cause for a session ending by timeout/flush.

    next_pkt_ts: ts of the next same-biflow packet (it must observe expiry),
    or -1 if the session is the key's last (flush candidate).
    Returns (cause, close_ts, closed_by_flush_sort_rank).
    """
    e_active = cfg.active_expiry_us(first_ts)
    e_idle = cfg.idle_expiry_us(last_ts)
    e = min(e_active, e_idle)
    s = _first_scan_at_or_after(scan_times, e)
    candidates = [c for c in (s, next_pkt_ts) if c >= 0]
    if not candidates:
        # never observed expired before end of input -> exporter shutdown
        return CAUSE_SHUTDOWN, flush_ts
    c = min(candidates)
    if next_pkt_ts < 0 and c > flush_ts:
        # scan time beyond end of input can't happen (scan times are event
        # timestamps), guard anyway
        return CAUSE_SHUTDOWN, flush_ts
    cause = CAUSE_ACTIVE if c >= e_active else CAUSE_IDLE
    return cause, c


def segment_biflow(
    ts: np.ndarray,
    dir_a: np.ndarray,
    protocol: int,
    tcp_ctl: dict | None,
    cfg: EngineConfig,
    scan_times: np.ndarray,
    flush_ts: int,
) -> list[Session]:
    """Split one canonical-biflow packet sequence into exported sessions.

    ts: int64 timestamps (sorted); dir_a: bool, directed-key orientation;
    tcp_ctl: dict of int64 arrays (fin, syn, rst, ack, seq, ack_seq,
    data_len) when protocol is TCP else None.
    """
    n = ts.size
    sessions: list[Session] = []
    has_ctl = tcp_ctl is not None and (
        tcp_ctl["fin"].any() or tcp_ctl["rst"].any() or tcp_ctl["syn"].any()
    )
    active_us = (cfg.active_timeout + 1) * US_PER_S
    idle_us = (cfg.idle_timeout + 1) * US_PER_S
    early_us = cfg.early_export  # threshold in whole seconds (compared via //)

    if not has_ctl:
        # Fast path: pure timeout segmentation, no TCP control flags.
        gap_cut = np.zeros(n, dtype=bool)
        if n > 1:
            gap_cut[1:] = np.diff(ts) >= idle_us
        gap_idx = np.flatnonzero(gap_cut)
        s = 0
        while s < n:
            first = int(ts[s])
            # next idle cut after s
            gi = gap_idx[np.searchsorted(gap_idx, s, side="right"):]
            next_idle = int(gi[0]) if gi.size else n
            # next active cut: first index > s with ts >= first + active_us
            na = int(np.searchsorted(ts, first + active_us, side="left"))
            next_active = na if na > s else n
            cut = min(next_idle, next_active, n)
            if cut >= n:
                cause, close_ts = _timeout_close(
                    cfg, first, int(ts[n - 1]), -1, scan_times, flush_ts
                )
                sessions.append(Session(s, n, cause, close_ts, closed=True))
                break
            cause, close_ts = _timeout_close(
                cfg, first, int(ts[cut - 1]), int(ts[cut]), scan_times, flush_ts
            )
            sessions.append(Session(s, cut, cause, close_ts, closed=True))
            s = cut
        _attach_nontcp_style(sessions, protocol)
        _maybe_add_early_exports(sessions, ts, cfg)
        return sessions

    # TCP path with control flags: per-packet state machine drives cuts.
    # Arrays are converted to Python lists once per group: list indexing of
    # native ints is several times faster than NumPy scalar extraction in
    # this inherently sequential loop, and the handshake/FIN trackers are
    # only invoked for packets that can change their state.
    fin = tcp_ctl["fin"].tolist()
    rst = tcp_ctl["rst"].tolist()
    syn = tcp_ctl["syn"].tolist()
    ack = tcp_ctl["ack"].tolist()
    seq = tcp_ctl["seq"].tolist()
    ack_seq = tcp_ctl["ack_seq"].tolist()
    data_len = tcp_ctl["data_len"].tolist()
    ts_l = ts.tolist()
    dir_l = dir_a.tolist()

    # Fast-forward jump tables (worth building when control packets are
    # sparse): when the handshake is settled (complete, or no pending
    # SYN-ACK, so it cannot progress without another control packet) and no
    # FIN is in flight, a packet can only matter if it carries a control
    # flag, arrives after an idle-expiry gap, or crosses the active limit.
    # Those stop points are tracked with ROLLING pointers into ascending
    # index arrays (amortized O(1) per jump; i is monotone across the
    # group), plus one searchsorted per session for the active limit.
    # Skipped stretches still emit their early-export snapshots (state is
    # constant across a stretch). Control-dense traffic (> 1 control packet
    # per 32 rows) skips the machinery entirely — short sessions pay the
    # per-session active-limit lookup and the jump stops every few packets,
    # so it only adds overhead there (measured -13% on RST-every-23 groups
    # at a gate of 8).
    ctlf = tcp_ctl["fin"] | tcp_ctl["rst"] | tcp_ctl["syn"]
    n_ctl = int(np.count_nonzero(ctlf))
    jump = n >= 64 and n_ctl * 32 < n
    if jump:
        ctl_idx = ctlf.nonzero()[0].tolist()
        idle_idx = (np.flatnonzero(ts[1:] - ts[:-1] >= idle_us) + 1).tolist()
        nc_ptr = 0
        ni_ptr = 0
        n_ctl_idx = len(ctl_idx)
        n_idle_idx = len(idle_idx)

    snapshots: list[Session] = []
    s = 0
    while s < n:
        first = ts_l[s]
        st = _TcpState()
        fwd_dir = dir_l[s]
        i = s
        terminated = False
        term_cause = ""
        prev_t = first
        act_lim = first + active_us
        # first index whose ts crosses the active limit (fixed per session)
        ja = int(np.searchsorted(ts, act_lim)) if jump else n
        while i < n:
            if (
                jump
                and i > s
                and not st.state_fwd
                and not st.state_bwd
                # handshake state can only change on a control packet
                # unless a SYN-ACK is pending (then any fwd ACK completes)
                and (st.handshake or not st.saw_syn_ack_bwd)
            ):
                while nc_ptr < n_ctl_idx and ctl_idx[nc_ptr] < i:
                    nc_ptr += 1
                j = ctl_idx[nc_ptr] if nc_ptr < n_ctl_idx else n
                while ni_ptr < n_idle_idx and idle_idx[ni_ptr] < i:
                    ni_ptr += 1
                if ni_ptr < n_idle_idx and idle_idx[ni_ptr] < j:
                    j = idle_idx[ni_ptr]
                # clamp to i so an already-active-expired packet i falls
                # through to the slow path's break
                if ja < j:
                    j = ja if ja > i else i
                if j > i:
                    if early_us is not None:
                        thr = first + (early_us + 1) * US_PER_S
                        k0 = max(int(np.searchsorted(ts, thr)), i)
                        for k in range(k0, j):
                            snap = Session(
                                s, k + 1, "None", ts_l[k],
                                closed=False, snapshot_of=k,
                            )
                            snap.handshake_completed = st.handshake
                            snapshots.append(snap)
                    prev_t = ts_l[j - 1]
                    i = j
                    continue
            t = ts_l[i]
            if i > s:
                # expiry check before applying packet (flow_table.rs:132-153)
                # t >= min(act_lim, prev+idle) decomposed to avoid min()
                if t >= act_lim or t - prev_t >= idle_us:
                    break
            fwd = dir_l[i] == fwd_dir
            if syn[i] or ack[i]:
                st.observe_handshake(fwd, syn[i] > 0, ack[i] > 0, seq[i], ack_seq[i])
            if (fin[i] or st.state_fwd or st.state_bwd) and st.is_finished(
                fwd, fin[i] > 0, seq[i], ack_seq[i], data_len[i]
            ):
                terminated = True
                term_cause = CAUSE_TCP_TERM
                i += 1
                break
            if rst[i]:
                if st.handshake:
                    st.reset_after = True
                else:
                    st.reset_before = True
                terminated = True
                term_cause = CAUSE_TCP_RESET
                i += 1
                break
            if early_us is not None and (t - first) // US_PER_S > early_us:
                # post-update snapshot of the live flow (flow_table.rs:155-177)
                # — exported without close_flow; close style is still 'none'
                # and handshake/reset flags are the running values
                snap = Session(s, i + 1, "None", t, closed=False, snapshot_of=i)
                snap.handshake_completed = st.handshake
                snapshots.append(snap)
            prev_t = t
            i += 1
        if terminated:
            sess = Session(s, i, term_cause, ts_l[i - 1], closed=False)
        else:
            nxt = ts_l[i] if i < n else -1
            cause, close_ts = _timeout_close(
                cfg, first, ts_l[i - 1], nxt, scan_times, flush_ts
            )
            sess = Session(s, i, cause, close_ts, closed=True)
        sess.handshake_completed = st.handshake
        sess.reset_before_handshake = st.reset_before
        sess.reset_after_handshake = st.reset_after
        sess.close_style = st.close_style(sess.cause)
        sessions.append(sess)
        s = i
    sessions.extend(snapshots)
    return sessions


def _attach_nontcp_style(sessions: list[Session], protocol: int) -> None:
    style = CLOSE_NOT_APPLICABLE if protocol != PROTO_TCP else CLOSE_NONE
    for sess in sessions:
        sess.close_style = style


def _maybe_add_early_exports(sessions: list[Session], ts: np.ndarray, cfg: EngineConfig) -> None:
    """Early export for timeout-segmented sessions (flow_table.rs:155-177):
    every packet past the threshold exports a post-update snapshot of the
    running flow (the flow stays live). Only used on the fast path, where
    sessions never terminate mid-stream, so every packet of a session is a
    snapshot candidate."""
    if cfg.early_export is None:
        return
    snapshots: list[Session] = []
    for sess in sessions:
        if sess.snapshot_of >= 0:
            continue
        first = int(ts[sess.start])
        for i in range(sess.start, sess.end):
            t = int(ts[i])
            if (t - first) // US_PER_S > cfg.early_export:
                snapshots.append(
                    Session(sess.start, i + 1, "None", t, closed=False, snapshot_of=i)
                )
    sessions.extend(snapshots)


# ---------------------------------------------------------------------------
# Feature computation
# ---------------------------------------------------------------------------


def stats6(x: np.ndarray) -> tuple[float, float, float, float, float, int]:
    """(total, mean, std_pop, max, min, count) with the reference's empty
    semantics (features/util.rs:49-79): min/max/mean/std -> 0.0 on empty."""
    n = x.size
    if n == 0:
        return 0.0, 0.0, 0.0, 0.0, 0.0, 0
    total = float(x.sum())
    mean = total / n
    std = float(np.sqrt(np.mean((x - mean) ** 2)))
    return total, mean, std, float(x.max()), float(x.min()), n


def _emit_stats(out: dict, name: str, x: np.ndarray) -> None:
    total, mean, std, mx, mn, count = stats6(x)
    out[f"{name}_total"] = total
    out[f"{name}_mean"] = mean
    out[f"{name}_std"] = std
    out[f"{name}_max"] = mx
    out[f"{name}_min"] = mn
    out[f"{name}_count"] = count


def _bulk_direction(ts_ms: np.ndarray, length: np.ndarray, closed: bool):
    """Single-direction view is NOT sufficient — bulk is cross-direction
    coupled; see compute_bulk()."""
    raise NotImplementedError


def compute_bulk(ts_us: np.ndarray, length: np.ndarray, fwd: np.ndarray, closed: bool):
    """CICFlowMeter-style bulk stats (bulk_stats.rs:115-167).

    ms-truncated timestamps; zero-`length` packets skipped; a direction's
    in-progress bulk is finalized when the *other* direction starts a new
    bulk from idle; only bulks with >= 4 packets count; on close() both
    in-progress bulks are finalized — but close() is not invoked for
    TCP-terminated flows (closed=False), discarding in-progress bulks.
    """
    nz = length > 0
    idx = np.flatnonzero(nz)
    out = {
        True: {"sizes": [], "packets": [], "durations": []},
        False: {"sizes": [], "packets": [], "durations": []},
    }
    state = {True: None, False: None}  # [start_ms, last_ms, count, size]

    def finalize(d):
        b = state[d]
        if b is not None and b[2] >= MIN_BULK_PACKETS:
            out[d]["packets"].append(float(b[2]))
            out[d]["sizes"].append(float(b[3]))
            out[d]["durations"].append(float(b[1] - b[0]))
        state[d] = None

    ts_ms_all = ts_us // 1000
    for i in idx:
        d = bool(fwd[i])
        t = int(ts_ms_all[i])
        ln = int(length[i])
        b = state[d]
        if b is not None:
            if t - b[1] > BULK_IDLE_MS:
                finalize(d)
                state[d] = [t, t, 1, ln]
            else:
                b[2] += 1
                b[3] += ln
                b[1] = t
        else:
            state[d] = [t, t, 1, ln]
            finalize(not d)
    if closed:
        finalize(True)
        finalize(False)
    res = {}
    for d, name in ((True, "fwd"), (False, "bwd")):
        sizes = np.asarray(out[d]["sizes"])
        packets = np.asarray(out[d]["packets"])
        durations = np.asarray(out[d]["durations"])
        res[f"{name}_sizes"] = sizes
        res[f"{name}_packets"] = packets
        res[f"{name}_durations"] = durations
        # rate quirk: ms totals / 1e6 (bulk_stats.rs:65-78); zero total
        # duration -> +inf (Rust f64 division semantics)
        if durations.size == 0:
            res[f"{name}_rate"] = 0.0
        else:
            denom = float(durations.sum()) / 1_000_000.0
            res[f"{name}_rate"] = float(sizes.sum()) / denom if denom else float("inf")
    return res


def compute_retransmissions(
    seq: np.ndarray, data_len: np.ndarray, flags: np.ndarray, mask: np.ndarray
) -> int:
    """Overlap count against merged seen ranges, one direction
    (retransmission_stats.rs:36-146). mask selects direction + TCP."""
    eligible = mask & ~((flags == ACK_FLAG) & (data_len == 0))
    ctl = ((flags & SYN_FLAG) != 0).astype(np.int64) + ((flags & FIN_FLAG) != 0).astype(np.int64)
    seg_len = data_len + ctl
    eligible &= seg_len > 0
    idx = np.flatnonzero(eligible)
    count = 0
    ranges: list[tuple[int, int]] = []
    for i in idx:
        start = int(seq[i])
        end = min(start + int(seg_len[i]), U32_MAX)
        if any(s < end and start < e for s, e in ranges):
            count += 1
        ns, ne = start, end
        j = 0
        while j < len(ranges):
            cs, ce = ranges[j]
            if ce < ns:
                j += 1
                continue
            if ne < cs:
                break
            ns = min(ns, cs)
            ne = max(ne, ce)
            ranges.pop(j)
        ranges.insert(j, (ns, ne))
    return count


def compute_dup_acks(
    ack_seq: np.ndarray, window: np.ndarray, flags: np.ndarray, data_len: np.ndarray,
    mask: np.ndarray,
) -> int:
    """Duplicate-ACK count, one direction (tcp_quality_stats.rs:44-66).

    Candidate = flags == ACK exactly and no payload; the comparator resets on
    any non-candidate TCP packet in the direction, so a duplicate requires
    two *consecutive* TCP packets (in direction) that are both candidates
    with equal (ack, window). Fully vectorizable.
    """
    idx = np.flatnonzero(mask)
    if idx.size < 2:
        return 0
    cand = (flags[idx] == ACK_FLAG) & (data_len[idx] == 0)
    same = (ack_seq[idx][1:] == ack_seq[idx][:-1]) & (window[idx][1:] == window[idx][:-1])
    return int(np.count_nonzero(cand[1:] & cand[:-1] & same))


def compute_session_features(
    g: dict[str, np.ndarray],
    sess: Session,
    cfg: EngineConfig,
) -> dict:
    """All feature modules over one session slice. g holds full-group arrays;
    the slice is [sess.start, sess.end)."""
    sl = slice(sess.start, sess.end)
    ts = g["ts_us"][sl]
    n = ts.size
    first_ts = int(ts[0])
    last_ts = int(ts[-1])
    # direction: forward = same directed orientation as the session's first
    # packet (flow_table.rs:61-73 directed-key lookup with reverse fallback)
    dir_a = g["dir_a"][sl]
    fwd = dir_a == dir_a[0]
    bwd = ~fwd
    protocol = int(g["protocol"][sess.start])

    out: dict = {}
    if dir_a[0]:
        src_ip, dst_ip = g["src_ip_a"], g["dst_ip_a"]
        src_port, dst_port = int(g["src_port_a"]), int(g["dst_port_a"])
    else:
        src_ip, dst_ip = g["dst_ip_a"], g["src_ip_a"]
        src_port, dst_port = int(g["dst_port_a"]), int(g["src_port_a"])
    # NOTE: orientation "a" is the canonical orientation; the session's
    # source endpoint is its first packet's source.
    out["flow_key"] = f"{src_ip}:{src_port}-{dst_ip}:{dst_port}-{protocol}"
    out["src_ip"], out["src_port"] = src_ip, src_port
    out["dst_ip"], out["dst_port"] = dst_ip, dst_port
    out["protocol"] = protocol
    # A15 IP metadata (flows/util.rs:64-145) — lru-cached per address
    from rustiflow_spark.flows import ipmeta

    out["ip_version"] = ipmeta.ip_version(src_ip)
    out["src_ip_scope"] = ipmeta.ip_scope(src_ip)
    out["dst_ip_scope"] = ipmeta.ip_scope(dst_ip)
    out["path_locality"] = ipmeta.path_locality(src_ip, dst_ip)
    out["first_ts_us"] = first_ts
    out["last_ts_us"] = last_ts
    out["duration_us"] = last_ts - first_ts
    out["cause"] = sess.cause
    out["close_style"] = (
        CLOSE_NOT_APPLICABLE if protocol != PROTO_TCP else sess.close_style
    )
    out["handshake_completed"] = int(sess.handshake_completed)
    out["reset_before_handshake"] = int(sess.reset_before_handshake)
    out["reset_after_handshake"] = int(sess.reset_after_handshake)

    # IAT (ms floats, iat_stats.rs:29-52)
    diffs = np.diff(ts) / 1000.0
    _emit_stats(out, "iat", diffs)
    ts_f, ts_b = ts[fwd], ts[bwd]
    _emit_stats(out, "fwd_iat", np.diff(ts_f) / 1000.0)
    _emit_stats(out, "bwd_iat", np.diff(ts_b) / 1000.0)

    # Subflow (subflow_stats.rs:23-34): gap vs previous packet of either dir
    gaps_us = np.diff(ts)
    out["subflow_count"] = int(1 + np.count_nonzero(gaps_us > SUBFLOW_TIMEOUT_US)) if n else 0

    # Active/Idle (active_idle_stats.rs): segments split at gaps > 5s strict
    idle_mask = gaps_us > ACTIVE_IDLE_TIMEOUT_US
    idle_vals = gaps_us[idle_mask] / 1000.0
    bounds = np.flatnonzero(idle_mask)  # gap i = between pkt i and i+1
    span_starts = np.concatenate(([0], bounds + 1))
    span_ends = np.concatenate((bounds, [n - 1]))
    span_dur = (ts[span_ends] - ts[span_starts]).astype(np.float64)
    if not sess.closed:
        # close() not invoked: trailing active span is NOT added
        span_dur = span_dur[:-1]
    active_vals = span_dur[span_dur > 0] / 1000.0
    if sess.closed and sess.cause == CAUSE_IDLE:
        idle_vals = np.concatenate((idle_vals, [(sess.close_ts - last_ts) / 1000.0]))
    _emit_stats(out, "active", active_vals)
    _emit_stats(out, "idle", idle_vals)

    # Payload length (payload_stats.rs)
    data_len = g["data_length"][sl].astype(np.float64)
    _emit_stats(out, "payload_len", data_len)
    _emit_stats(out, "fwd_payload_len", data_len[fwd])
    _emit_stats(out, "bwd_payload_len", data_len[bwd])
    out["fwd_non_zero_payload_packets"] = int(np.count_nonzero(data_len[fwd] > 0))
    out["bwd_non_zero_payload_packets"] = int(np.count_nonzero(data_len[bwd] > 0))

    # Header length (header_stats.rs)
    hdr = g["header_length"][sl].astype(np.float64)
    _emit_stats(out, "header_len", hdr)
    _emit_stats(out, "fwd_header_len", hdr[fwd])
    _emit_stats(out, "bwd_header_len", hdr[bwd])

    # Packet length (packet_stats.rs)
    length = g["length"][sl].astype(np.float64)
    _emit_stats(out, "fwd_packet_len", length[fwd])
    _emit_stats(out, "bwd_packet_len", length[bwd])

    # TCP flags (tcp_flag_stats.rs)
    for name in ("fin", "syn", "rst", "psh", "ack", "urg", "cwr", "ece"):
        col = g[name + "_flag"][sl]
        out[f"fwd_{name}_flag_count"] = int(col[fwd].sum())
        out[f"bwd_{name}_flag_count"] = int(col[bwd].sum())
    flags_str = "".join(
        ch
        if out[f"fwd_{nm}_flag_count"] + out[f"bwd_{nm}_flag_count"]
        else "."
        for ch, nm in (
            ("U", "urg"), ("A", "ack"), ("P", "psh"), ("R", "rst"), ("S", "syn"), ("F", "fin"),
        )
    )
    out["flags"] = flags_str

    # Window size (window_size_stats.rs) — all packets, any protocol
    win = g["window_size"][sl].astype(np.float64)
    _emit_stats(out, "window_size", win)
    _emit_stats(out, "fwd_window_size", win[fwd])
    _emit_stats(out, "bwd_window_size", win[bwd])
    out["fwd_init_window_size"] = int(win[fwd][0]) if fwd.any() else 0
    out["bwd_init_window_size"] = int(win[bwd][0]) if bwd.any() else 0

    # ICMP (icmp_stats.rs)
    icmp_mask = (g["protocol"][sl] == PROTO_ICMP) | (g["protocol"][sl] == PROTO_ICMPV6)
    itype = g["icmp_type"][sl]
    icode = g["icmp_code"][sl]
    icmp_idx = np.flatnonzero(icmp_mask)
    if icmp_idx.size:
        i0 = icmp_idx[0]
        out["icmp_type"] = int(itype[i0]) if itype[i0] >= 0 else -1
        out["icmp_code"] = int(icode[i0]) if icode[i0] >= 0 else -1
        proto_icmp = g["protocol"][sl][icmp_mask]
        t_vals = itype[icmp_mask]
        v4 = proto_icmp == PROTO_ICMP
        req = np.where(v4, t_vals == 8, t_vals == 128)
        rep = np.where(v4, t_vals == 0, t_vals == 129)
        dunr = np.where(v4, t_vals == 3, t_vals == 1)
        err_extra = np.where(
            v4,
            np.isin(t_vals, (4, 5, 11, 12)),
            np.isin(t_vals, (2, 3, 4)),
        )
        out["icmp_echo_request_count"] = int(req.sum())
        out["icmp_echo_reply_count"] = int(rep.sum())
        out["icmp_error_count"] = int((dunr | err_extra).sum())
        out["icmp_destination_unreachable_count"] = int(dunr.sum())
    else:
        out["icmp_type"] = -1
        out["icmp_code"] = -1
        out["icmp_echo_request_count"] = 0
        out["icmp_echo_reply_count"] = 0
        out["icmp_error_count"] = 0
        out["icmp_destination_unreachable_count"] = 0

    # Bulk (bulk_stats.rs) — cross-direction coupled scan
    bulk = compute_bulk(ts, g["length"][sl], fwd, sess.closed)
    out["fwd_bulk_rate"] = bulk["fwd_rate"]
    out["bwd_bulk_rate"] = bulk["bwd_rate"]
    _emit_stats(out, "fwd_bulk_packets", bulk["fwd_packets"])
    _emit_stats(out, "bwd_bulk_packets", bulk["bwd_packets"])
    _emit_stats(out, "fwd_bulk_bytes", bulk["fwd_sizes"])
    _emit_stats(out, "bwd_bulk_bytes", bulk["bwd_sizes"])
    _emit_stats(out, "fwd_bulk_duration", bulk["fwd_durations"])
    _emit_stats(out, "bwd_bulk_duration", bulk["bwd_durations"])

    # Retransmission + TCP quality (TCP only)
    if protocol == PROTO_TCP:
        flags_bm = g["flags"][sl]
        seq = g["sequence_number"][sl]
        ack_seq = g["sequence_number_ack"][sl]
        dl = g["data_length"][sl]
        win_i = g["window_size"][sl]
        out["fwd_retransmission_count"] = compute_retransmissions(seq, dl, flags_bm, fwd)
        out["bwd_retransmission_count"] = compute_retransmissions(seq, dl, flags_bm, bwd)
        out["fwd_duplicate_ack_count"] = compute_dup_acks(ack_seq, win_i, flags_bm, dl, fwd)
        out["bwd_duplicate_ack_count"] = compute_dup_acks(ack_seq, win_i, flags_bm, dl, bwd)
        out["fwd_zero_window_count"] = int(np.count_nonzero(win_i[fwd] == 0))
        out["bwd_zero_window_count"] = int(np.count_nonzero(win_i[bwd] == 0))
    else:
        out["fwd_retransmission_count"] = 0
        out["bwd_retransmission_count"] = 0
        out["fwd_duplicate_ack_count"] = 0
        out["bwd_duplicate_ack_count"] = 0
        out["fwd_zero_window_count"] = 0
        out["bwd_zero_window_count"] = 0

    # Timing (timing_stats.rs) — ms floats, 0.0 when absent
    out["first_ts_fwd_ms"] = float(ts_f[0]) / 1000.0 if ts_f.size else 0.0
    out["first_ts_bwd_ms"] = float(ts_b[0]) / 1000.0 if ts_b.size else 0.0
    out["last_ts_fwd_ms"] = float(ts_f[-1]) / 1000.0 if ts_f.size else 0.0
    out["last_ts_bwd_ms"] = float(ts_b[-1]) / 1000.0 if ts_b.size else 0.0
    out["fwd_duration_ms"] = float(ts_f[-1] - ts_f[0]) / 1000.0 if ts_f.size else 0.0
    out["bwd_duration_ms"] = float(ts_b[-1] - ts_b[0]) / 1000.0 if ts_b.size else 0.0

    return out


def process_group(
    g: dict[str, np.ndarray],
    meta: dict,
    cfg: EngineConfig,
    scan_times: np.ndarray,
    flush_ts: int,
) -> list[dict]:
    """Process one canonical-biflow group: segment + extract features.

    g: column arrays sorted by (ts_us, event_seq). meta: canonical endpoint
    strings/ports {src_ip_a, src_port_a, dst_ip_a, dst_port_a}.
    """
    protocol = int(g["protocol"][0])
    tcp_ctl = None
    if protocol == PROTO_TCP:
        tcp_ctl = {
            "fin": g["fin_flag"],
            "rst": g["rst_flag"],
            "syn": g["syn_flag"],
            "ack": g["ack_flag"],
            "seq": g["sequence_number"],
            "ack_seq": g["sequence_number_ack"],
            "data_len": g["data_length"],
        }
    sessions = segment_biflow(
        g["ts_us"], g["dir_a"], protocol, tcp_ctl, cfg, scan_times, flush_ts
    )
    g = dict(g)
    g.update(meta)
    return [compute_session_features(g, sess, cfg) for sess in sessions]
