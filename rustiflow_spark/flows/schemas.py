"""Flow-schema assembly: Basic / CIC / CIDDS / NF / RustiFlow outputs.

Each schema is a pure Catalyst projection over the sessionization kernel's
feature-superset DataFrame (schema.FLOW_SUPERSET_SCHEMA) — derived scalar
features (rates, ratios, pooled variance, unit conversions; SURVEY.md §2.5
D1-D7) are column expressions, so they run JVM-side with whole-stage
codegen and cost nothing extra at scale.

Column orders and names replicate the reference's CSV layouts:
  Basic     10 cols  — flows/basic_flow.rs:316-333
  CIC      100 cols  — flows/cic_flow.rs:109-377 (clean variant: 96)
  CIDDS     10 cols  — flows/cidds_flow.rs:79-109
  NF        71 cols  — flows/nf_flow.rs:129-290
  RustiFlow 203 cols — flows/rusti_flow.rs:139-303 (count asserted by the
                       reference's own tests, rusti_flow_test.rs:61)

Timestamps are exported as integer epoch microseconds (engine-native
columnar form) rather than formatted strings; the column COUNT and order
match the reference exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F

US = 1_000_000.0


def _safe_div(num: Column, den: Column) -> Column:
    return F.when(den != 0, num / den).otherwise(F.lit(0.0))


def _rate_per_s(value: Column, duration_us: Column) -> Column:
    # features/util.rs:159-161
    return _safe_div(value, duration_us / F.lit(US))


def _iana(port: Column) -> Column:
    return (
        F.when(port <= 1023, "well-known")
        .when(port <= 49151, "registered")
        .otherwise("dynamic")
    )


def _stats5(block: str) -> list[Column]:
    """total, mean, std, max, min — FeatureStats::dump_values order."""
    return [
        F.col(f"{block}_total"),
        F.col(f"{block}_mean"),
        F.col(f"{block}_std"),
        F.col(f"{block}_max"),
        F.col(f"{block}_min"),
    ]


# ---- pooled flow-level packet-length stats (packet_stats.rs:19-95) --------


def _flow_pkt_count() -> Column:
    return F.col("fwd_packet_len_count") + F.col("bwd_packet_len_count")


def _flow_pkt_total() -> Column:
    return F.col("fwd_packet_len_total") + F.col("bwd_packet_len_total")


def _flow_pkt_mean() -> Column:
    return _safe_div(_flow_pkt_total(), _flow_pkt_count())


def _flow_pkt_min() -> Column:
    nf, nb = F.col("fwd_packet_len_count"), F.col("bwd_packet_len_count")
    return (
        F.when((nf > 0) & (nb > 0), F.least("fwd_packet_len_min", "bwd_packet_len_min"))
        .when(nf > 0, F.col("fwd_packet_len_min"))
        .when(nb > 0, F.col("bwd_packet_len_min"))
        .otherwise(F.lit(0.0))
    )


def _flow_pkt_max() -> Column:
    nf, nb = F.col("fwd_packet_len_count"), F.col("bwd_packet_len_count")
    return (
        F.when((nf > 0) & (nb > 0), F.greatest("fwd_packet_len_max", "bwd_packet_len_max"))
        .when(nf > 0, F.col("fwd_packet_len_max"))
        .when(nb > 0, F.col("bwd_packet_len_max"))
        .otherwise(F.lit(0.0))
    )


def _flow_pkt_variance() -> Column:
    # exact two-sample pooled population variance merge (packet_stats.rs:63-91)
    n1 = F.col("fwd_packet_len_count").cast("double")
    n2 = F.col("bwd_packet_len_count").cast("double")
    n = n1 + n2
    m1, m2 = F.col("fwd_packet_len_mean"), F.col("bwd_packet_len_mean")
    v1 = F.col("fwd_packet_len_std") * F.col("fwd_packet_len_std")
    v2 = F.col("bwd_packet_len_std") * F.col("bwd_packet_len_std")
    cm = _flow_pkt_mean()
    pooled = (n1 * v1 + n2 * v2 + n1 * (m1 - cm) * (m1 - cm) + n2 * (m2 - cm) * (m2 - cm)) / n
    return F.when(n <= 1, F.lit(0.0)).otherwise(pooled)


def _flow_pkt_std() -> Column:
    return F.sqrt(_flow_pkt_variance())


def _flag_total(name: str) -> Column:
    return F.col(f"fwd_{name}_flag_count") + F.col(f"bwd_{name}_flag_count")


def basic_schema(flows: DataFrame, without_contamination: bool = False) -> DataFrame:
    """BasicFlow 10-column layout (basic_flow.rs:316-333); clean variant =
    5 columns with IANA port classes (basic_flow.rs:335-345)."""
    if without_contamination:
        return flows.select(
            _iana(F.col("src_port")).alias("src_port_iana"),
            _iana(F.col("dst_port")).alias("dst_port_iana"),
            "protocol",
            F.col("duration_us").alias("duration"),
            F.col("cause").alias("flow_expire_cause"),
        )
    return flows.select(
        F.col("flow_key").alias("flow_id"),
        F.col("src_ip").alias("source_ip"),
        F.col("src_port").alias("source_port"),
        F.col("dst_ip").alias("destination_ip"),
        F.col("dst_port").alias("destination_port"),
        "protocol",
        F.col("first_ts_us").alias("first_timestamp"),
        F.col("last_ts_us").alias("last_timestamp"),
        F.col("duration_us").alias("duration"),
        F.col("cause").alias("flow_expire_cause"),
    )


CIC_COLUMNS = [
    "Flow ID", "Src IP", "Src Port", "Dst IP", "Dst Port", "Protocol", "Timestamp",
    "Flow Duration", "TCP Handshake Completed", "TCP Reset Before Handshake",
    "TCP Reset After Handshake", "Total Fwd Packet", "Total Bwd packets",
    "Total Length of Fwd Packet", "Total Length of Bwd Packet",
    "Fwd Packet Length Max", "Fwd Packet Length Min", "Fwd Packet Length Mean",
    "Fwd Packet Length Std", "Bwd Packet Length Max", "Bwd Packet Length Min",
    "Bwd Packet Length Mean", "Bwd Packet Length Std", "Flow Bytes/s",
    "Flow Packets/s", "Flow IAT Mean", "Flow IAT Std", "Flow IAT Max",
    "Flow IAT Min", "Fwd IAT Total", "Fwd IAT Mean", "Fwd IAT Std", "Fwd IAT Max",
    "Fwd IAT Min", "Bwd IAT Total", "Bwd IAT Mean", "Bwd IAT Std", "Bwd IAT Max",
    "Bwd IAT Min", "Fwd PSH Flags", "Bwd PSH Flags", "Fwd URG Flags",
    "Bwd URG Flags", "Fwd RST Flags", "Bwd RST Flags", "Fwd Header Length",
    "Bwd Header Length", "Fwd Packets/s", "Bwd Packets/s", "Packet Length Min",
    "Packet Length Max", "Packet Length Mean", "Packet Length Std",
    "Packet Length Variance", "FIN Flag Count", "SYN Flag Count", "RST Flag Count",
    "PSH Flag Count", "ACK Flag Count", "URG Flag Count", "CWR Flag Count",
    "ECE Flag Count", "Down/Up Ratio", "Average Packet Size", "Fwd Segment Size Avg",
    "Bwd Segment Size Avg", "Fwd Bytes/Bulk Avg", "Fwd Packet/Bulk Avg",
    "Fwd Bulk Rate Avg", "Bwd Bytes/Bulk Avg", "Bwd Packet/Bulk Avg",
    "Bwd Bulk Rate Avg", "Subflow Fwd Packets", "Subflow Fwd Bytes",
    "Subflow Bwd Packets", "Subflow Bwd Bytes", "FWD Init Win Bytes",
    "Bwd Init Win Bytes", "Fwd Act Data Pkts", "Bwd Act Data Pkts",
    "Fwd Seg Size Min", "Bwd Seg Size Min", "Active Mean", "Active Std",
    "Active Max", "Active Min", "Idle Mean", "Idle Std", "Idle Max", "Idle Min",
    "ICMP Code", "ICMP Type", "ICMP Echo Request Count", "ICMP Echo Reply Count",
    "ICMP Error Count", "ICMP Destination Unreachable Count",
    "Fwd TCP Retrans. Count", "Bwd TCP Retrans. Count", "Total TCP Retrans. Count",
    "Total Connection Flow Time",
]


def _cic_value_exprs(dur: Column) -> list[Column]:
    """CIC value expressions 12..100 (everything after the basic-info block),
    in cic_flow.rs:133-270 order."""
    ms2us = F.lit(1000.0)
    return [
        F.col("fwd_payload_len_count"),
        F.col("bwd_payload_len_count"),
        F.col("fwd_payload_len_total"),
        F.col("bwd_payload_len_total"),
        F.col("fwd_payload_len_max"),
        F.col("fwd_payload_len_min"),
        F.col("fwd_payload_len_mean"),
        F.col("fwd_payload_len_std"),
        F.col("bwd_payload_len_max"),
        F.col("bwd_payload_len_min"),
        F.col("bwd_payload_len_mean"),
        F.col("bwd_payload_len_std"),
        _rate_per_s(F.col("payload_len_total"), dur),
        _rate_per_s(F.col("payload_len_count").cast("double"), dur),
        F.col("iat_mean") * ms2us,
        F.col("iat_std") * ms2us,
        F.col("iat_max") * ms2us,
        F.col("iat_min") * ms2us,
        F.col("fwd_iat_total") * ms2us,
        F.col("fwd_iat_mean") * ms2us,
        F.col("fwd_iat_std") * ms2us,
        F.col("fwd_iat_max") * ms2us,
        F.col("fwd_iat_min") * ms2us,
        F.col("bwd_iat_total") * ms2us,
        F.col("bwd_iat_mean") * ms2us,
        F.col("bwd_iat_std") * ms2us,
        F.col("bwd_iat_max") * ms2us,
        F.col("bwd_iat_min") * ms2us,
        F.col("fwd_psh_flag_count"),
        F.col("bwd_psh_flag_count"),
        F.col("fwd_urg_flag_count"),
        F.col("bwd_urg_flag_count"),
        F.col("fwd_rst_flag_count"),
        F.col("bwd_rst_flag_count"),
        F.col("fwd_header_len_total"),
        F.col("bwd_header_len_total"),
        _rate_per_s(F.col("fwd_payload_len_count").cast("double"), dur),
        _rate_per_s(F.col("bwd_payload_len_count").cast("double"), dur),
        F.col("payload_len_min"),
        F.col("payload_len_max"),
        F.col("payload_len_mean"),
        F.col("payload_len_std"),
        F.col("payload_len_std") * F.col("payload_len_std"),
        _flag_total("fin"),
        _flag_total("syn"),
        _flag_total("rst"),
        _flag_total("psh"),
        _flag_total("ack"),
        _flag_total("urg"),
        _flag_total("cwr"),
        _flag_total("ece"),
        _safe_div(
            F.col("bwd_payload_len_count").cast("double"),
            F.col("fwd_payload_len_count").cast("double"),
        ),
        F.col("payload_len_mean"),
        F.col("fwd_payload_len_mean"),
        F.col("bwd_payload_len_mean"),
        F.col("fwd_bulk_bytes_mean"),
        F.col("fwd_bulk_packets_mean"),
        F.col("fwd_bulk_rate"),
        F.col("bwd_bulk_bytes_mean"),
        F.col("bwd_bulk_packets_mean"),
        F.col("bwd_bulk_rate"),
        _safe_div(
            F.col("fwd_payload_len_count").cast("double"),
            F.col("subflow_count").cast("double"),
        ),
        _safe_div(F.col("fwd_payload_len_total"), F.col("subflow_count").cast("double")),
        _safe_div(
            F.col("bwd_payload_len_count").cast("double"),
            F.col("subflow_count").cast("double"),
        ),
        _safe_div(F.col("bwd_payload_len_total"), F.col("subflow_count").cast("double")),
        F.col("fwd_init_window_size"),
        F.col("bwd_init_window_size"),
        F.col("fwd_non_zero_payload_packets"),
        F.col("bwd_non_zero_payload_packets"),
        F.col("fwd_header_len_min"),
        F.col("bwd_header_len_min"),
        F.col("active_mean"),
        F.col("active_std"),
        F.col("active_max"),
        F.col("active_min"),
        F.col("idle_mean"),
        F.col("idle_std"),
        F.col("idle_max"),
        F.col("idle_min"),
        F.col("icmp_code"),
        F.col("icmp_type"),
        F.col("icmp_echo_request_count"),
        F.col("icmp_echo_reply_count"),
        F.col("icmp_error_count"),
        F.col("icmp_destination_unreachable_count"),
        F.col("fwd_retransmission_count"),
        F.col("bwd_retransmission_count"),
        F.col("fwd_retransmission_count") + F.col("bwd_retransmission_count"),
        dur,
    ]


def cic_schema(flows: DataFrame, without_contamination: bool = False) -> DataFrame:
    """CicFlow 100-column layout (96 clean)."""
    dur = F.col("duration_us").cast("double")
    values = _cic_value_exprs(dur)
    if without_contamination:
        head = [
            _iana(F.col("src_port")),
            _iana(F.col("dst_port")),
            F.col("protocol"),
            F.col("duration_us"),
            F.col("handshake_completed"),
            F.col("reset_before_handshake"),
            F.col("reset_after_handshake"),
        ]
        names = ["Src Port (IANA)", "Dst Port (IANA)"] + CIC_COLUMNS[5:6] + CIC_COLUMNS[7:]
    else:
        head = [
            F.col("flow_key"),
            F.col("src_ip"),
            F.col("src_port"),
            F.col("dst_ip"),
            F.col("dst_port"),
            F.col("protocol"),
            F.col("first_ts_us"),
            F.col("duration_us"),
            F.col("handshake_completed"),
            F.col("reset_before_handshake"),
            F.col("reset_after_handshake"),
        ]
        names = CIC_COLUMNS
    cols = head + values
    return flows.select(*[c.alias(n) for c, n in zip(cols, names)])


def cidds_schema(flows: DataFrame, without_contamination: bool = False) -> DataFrame:
    """CiddsFlow 10-column layout (cidds_flow.rs:79-109); clean variant =
    7 columns (cidds_flow.rs:111-135)."""
    proto_str = (
        F.when(F.col("protocol") == 6, "TCP")
        .when(F.col("protocol") == 17, "UDP")
        .when(F.col("protocol").isin(1, 58), "ICMP")
        .otherwise("OTHER")
    )
    if without_contamination:
        return flows.select(
            _iana(F.col("src_port")).alias("Src Port (IANA)"),
            _iana(F.col("dst_port")).alias("Dst Port (IANA)"),
            proto_str.alias("Proto"),
            (F.col("duration_us") / 1000).cast("long").alias("Duration"),
            _flow_pkt_total().alias("Bytes"),
            _flow_pkt_count().alias("Packets"),
            F.col("flags").alias("Flags"),
        )
    return flows.select(
        F.col("src_ip").alias("Src IP"),
        F.col("src_port").alias("Src Port"),
        F.col("dst_ip").alias("Dst IP"),
        F.col("dst_port").alias("Dst Port"),
        proto_str.alias("Proto"),
        F.col("first_ts_us").alias("Date first seen"),
        (F.col("duration_us") / 1000).cast("long").alias("Duration"),
        _flow_pkt_total().alias("Bytes"),
        _flow_pkt_count().alias("Packets"),
        F.col("flags").alias("Flags"),
    )


NF_COLUMNS = [
    "id", "expiration_id", "src_ip", "src_port", "dst_ip", "dst_port", "protocol",
    "ip_version", "bidirectional_first_seen_ms", "bidirectional_last_seen_ms",
    "bidirectional_duration_ms", "bidirectional_packets", "bidirectional_bytes",
    "src2dst_first_seen_ms", "src2dst_last_seen_ms", "src2dst_duration_ms",
    "src2dst_packets", "src2dst_bytes", "dst2src_first_seen_ms",
    "dst2src_last_seen_ms", "dst2src_duration_ms", "dst2src_packets",
    "dst2src_bytes", "bidirectional_min_ps", "bidirectional_mean_ps",
    "bidirectional_stddev_ps", "bidirectional_max_ps", "src2dst_min_ps",
    "src2dst_mean_ps", "src2dst_stddev_ps", "src2dst_max_ps", "dst2src_min_ps",
    "dst2src_mean_ps", "dst2src_stddev_ps", "dst2src_max_ps",
    "bidirectional_min_piat_ms", "bidirectional_mean_piat_ms",
    "bidirectional_stddev_piat_ms", "bidirectional_max_piat_ms",
    "src2dst_min_piat_ms", "src2dst_mean_piat_ms", "src2dst_stddev_piat_ms",
    "src2dst_max_piat_ms", "dst2src_min_piat_ms", "dst2src_mean_piat_ms",
    "dst2src_stddev_piat_ms", "dst2src_max_piat_ms",
] + [
    f"bidirectional_{n}_packets" for n in ("syn", "cwr", "ece", "urg", "ack", "psh", "rst", "fin")
] + [
    f"src2dst_{n}_packets" for n in ("syn", "cwr", "ece", "urg", "ack", "psh", "rst", "fin")
] + [
    f"dst2src_{n}_packets" for n in ("syn", "cwr", "ece", "urg", "ack", "psh", "rst", "fin")
]


NF_CLEAN_COLUMNS = [
    "src_port_iana", "dst_port_iana", "protocol", "ip_version",
    "bidirectional_duration_ms", "bidirectional_packets", "bidirectional_bytes",
    "src2dst_duration_ms", "src2dst_packets", "src2dst_bytes",
    "dst2src_duration_ms", "dst2src_packets", "dst2src_bytes",
] + NF_COLUMNS[23:]


def nf_schema(flows: DataFrame, without_contamination: bool = False) -> DataFrame:
    """NfFlow 71-column layout (nf_flow.rs:129-290); clean variant = 61
    columns (nf_flow.rs:292-431)."""
    expiration_id = (
        F.when(F.col("cause") == "Active Timeout", 1)
        .when(F.col("cause").isin("Idle Timeout", "TCP Normal Termination"), 0)
        .otherwise(-1)
    )
    if without_contamination:
        cols = [
            _iana(F.col("src_port")),
            _iana(F.col("dst_port")),
            F.col("protocol"),
            F.col("ip_version"),
            (F.col("duration_us") / 1000).cast("long"),
            _flow_pkt_count(),
            _flow_pkt_total(),
            F.col("fwd_duration_ms"),
            F.col("fwd_packet_len_count"),
            F.col("fwd_packet_len_total"),
            F.col("bwd_duration_ms"),
            F.col("bwd_packet_len_count"),
            F.col("bwd_packet_len_total"),
        ]
        names = NF_CLEAN_COLUMNS
    else:
        cols = [
            F.col("flow_key"),
            expiration_id,
            F.col("src_ip"),
            F.col("src_port"),
            F.col("dst_ip"),
            F.col("dst_port"),
            F.col("protocol"),
            F.col("ip_version"),
            (F.col("first_ts_us") / 1000).cast("long"),
            (F.col("last_ts_us") / 1000).cast("long"),
            (F.col("duration_us") / 1000).cast("long"),
            _flow_pkt_count(),
            _flow_pkt_total(),
            F.col("first_ts_fwd_ms"),
            F.col("last_ts_fwd_ms"),
            F.col("fwd_duration_ms"),
            F.col("fwd_packet_len_count"),
            F.col("fwd_packet_len_total"),
            F.col("first_ts_bwd_ms"),
            F.col("last_ts_bwd_ms"),
            F.col("bwd_duration_ms"),
            F.col("bwd_packet_len_count"),
            F.col("bwd_packet_len_total"),
        ]
        names = NF_COLUMNS
    cols += [
        _flow_pkt_min(),
        _flow_pkt_mean(),
        _flow_pkt_std(),
        _flow_pkt_max(),
        F.col("fwd_packet_len_min"),
        F.col("fwd_packet_len_mean"),
        F.col("fwd_packet_len_std"),
        F.col("fwd_packet_len_max"),
        F.col("bwd_packet_len_min"),
        F.col("bwd_packet_len_mean"),
        F.col("bwd_packet_len_std"),
        F.col("bwd_packet_len_max"),
        F.col("iat_min"),
        F.col("iat_mean"),
        F.col("iat_std"),
        F.col("iat_max"),
        F.col("fwd_iat_min"),
        F.col("fwd_iat_mean"),
        F.col("fwd_iat_std"),
        F.col("fwd_iat_max"),
        F.col("bwd_iat_min"),
        F.col("bwd_iat_mean"),
        F.col("bwd_iat_std"),
        F.col("bwd_iat_max"),
    ]
    for n in ("syn", "cwr", "ece", "urg", "ack", "psh", "rst", "fin"):
        cols.append(_flag_total(n))
    for d in ("fwd", "bwd"):
        for n in ("syn", "cwr", "ece", "urg", "ack", "psh", "rst", "fin"):
            cols.append(F.col(f"{d}_{n}_flag_count"))
    assert len(cols) == len(names), (len(cols), len(names))
    return flows.select(*[c.alias(n) for c, n in zip(cols, names)])


RUSTIFLOW_COLUMNS = (
    [
        "flow_id", "source_ip", "source_port", "destination_ip", "destination_port",
        "protocol", "ip_version", "source_ip_scope", "destination_ip_scope",
        "path_locality", "timestamp_first", "timestamp_last", "flow_duration_us",
        "flow_expire_cause", "tcp_handshake_completed", "tcp_reset_before_handshake",
        "tcp_reset_after_handshake", "tcp_close_style",
        # TimingStats
        "first_timestamp_fwd", "first_timestamp_bwd", "last_timestamp_fwd",
        "last_timestamp_bwd", "fwd_duration_ms", "bwd_duration_ms",
    ]
    + [f"iat_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"fwd_iat_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"bwd_iat_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [
        "packet_count", "packet_len_total", "packet_len_mean", "packet_len_max",
        "packet_len_min", "packet_len_std", "fwd_packet_count", "bwd_packet_count",
    ]
    + [f"fwd_packet_len_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"bwd_packet_len_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"header_len_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"fwd_header_len_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"bwd_header_len_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"payload_len_{s}" for s in ("total", "mean", "std", "max", "min")]
    + ["payload_len_variance"]
    + [f"fwd_payload_len_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"bwd_payload_len_{s}" for s in ("total", "mean", "std", "max", "min")]
    + ["fwd_non_zero_payload_packets", "bwd_non_zero_payload_packets"]
    + ["fwd_bulk_rate_s", "bwd_bulk_rate_s", "fwd_bulk_count", "bwd_bulk_count"]
    + [f"fwd_bulk_packets_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"bwd_bulk_packets_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"fwd_bulk_bytes_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"bwd_bulk_bytes_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"fwd_bulk_duration_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"bwd_bulk_duration_{s}" for s in ("total", "mean", "std", "max", "min")]
    + ["subflow_count"]
    + [f"active_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"idle_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [
        "icmp_type", "icmp_code", "icmp_echo_request_count", "icmp_echo_reply_count",
        "icmp_error_count", "icmp_destination_unreachable_count",
        "flow_retransmission_count", "fwd_retransmission_count",
        "bwd_retransmission_count", "flow_duplicate_ack_count",
        "fwd_duplicate_ack_count", "bwd_duplicate_ack_count",
        "flow_zero_window_count", "fwd_zero_window_count", "bwd_zero_window_count",
        "fwd_init_window_size", "bwd_init_window_size",
    ]
    + [f"window_size_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"fwd_window_size_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [f"bwd_window_size_{s}" for s in ("total", "mean", "std", "max", "min")]
    + [
        f"{d}_{n}_flag_count"
        for d in ("fwd", "bwd")
        for n in ("fin", "syn", "rst", "psh", "ack", "urg", "cwr", "ece")
    ]
    + [
        f"total_{n}_flag_count"
        for n in ("fin", "syn", "rst", "psh", "ack", "urg", "cwr", "ece")
    ]
    + ["flags"]
    + [
        "flow_bytes_s", "flow_packets_s", "fwd_bytes_s", "fwd_packets_s",
        "bwd_bytes_s", "bwd_packets_s", "fwd_subflow_packets_mean",
        "fwd_subflow_bytes_mean", "bwd_subflow_packets_mean",
        "bwd_subflow_bytes_mean", "up_down_ratio",
    ]
)


RUSTIFLOW_CLEAN_COLUMNS = (
    [
        "source_port_iana", "destination_port_iana", "protocol", "ip_version",
        "source_ip_scope", "destination_ip_scope", "path_locality",
        "flow_duration_us", "flow_expire_cause", "tcp_handshake_completed",
        "tcp_reset_before_handshake", "tcp_reset_after_handshake",
        "tcp_close_style", "fwd_duration_ms", "bwd_duration_ms",
    ]
    + RUSTIFLOW_COLUMNS[24:]
)


def rustiflow_schema(flows: DataFrame, without_contamination: bool = False) -> DataFrame:
    """RustiFlow 203-column layout (rusti_flow.rs:139-303); clean variant =
    194 columns (rusti_flow.rs:300-460)."""
    dur = F.col("duration_us").cast("double")
    if without_contamination:
        cols: list[Column] = [
            _iana(F.col("src_port")),
            _iana(F.col("dst_port")),
            F.col("protocol"),
            F.col("ip_version"),
            F.col("src_ip_scope"),
            F.col("dst_ip_scope"),
            F.col("path_locality"),
            F.col("duration_us"),
            F.col("cause"),
            F.col("handshake_completed"),
            F.col("reset_before_handshake"),
            F.col("reset_after_handshake"),
            F.col("close_style"),
            F.col("fwd_duration_ms"),
            F.col("bwd_duration_ms"),
        ]
        names = RUSTIFLOW_CLEAN_COLUMNS
    else:
        cols = [
            F.col("flow_key"),
            F.col("src_ip"),
            F.col("src_port"),
            F.col("dst_ip"),
            F.col("dst_port"),
            F.col("protocol"),
            F.col("ip_version"),
            F.col("src_ip_scope"),
            F.col("dst_ip_scope"),
            F.col("path_locality"),
            F.col("first_ts_us"),
            F.col("last_ts_us"),
            F.col("duration_us"),
            F.col("cause"),
            F.col("handshake_completed"),
            F.col("reset_before_handshake"),
            F.col("reset_after_handshake"),
            F.col("close_style"),
            F.col("first_ts_fwd_ms"),
            F.col("first_ts_bwd_ms"),
            F.col("last_ts_fwd_ms"),
            F.col("last_ts_bwd_ms"),
            F.col("fwd_duration_ms"),
            F.col("bwd_duration_ms"),
        ]
        names = RUSTIFLOW_COLUMNS
    cols += _stats5("iat") + _stats5("fwd_iat") + _stats5("bwd_iat")
    cols += [
        _flow_pkt_count(),
        _flow_pkt_total(),
        _flow_pkt_mean(),
        _flow_pkt_max(),
        _flow_pkt_min(),
        _flow_pkt_std(),
        F.col("fwd_packet_len_count"),
        F.col("bwd_packet_len_count"),
    ]
    cols += _stats5("fwd_packet_len") + _stats5("bwd_packet_len")
    cols += _stats5("header_len") + _stats5("fwd_header_len") + _stats5("bwd_header_len")
    cols += _stats5("payload_len")
    cols += [F.col("payload_len_std") * F.col("payload_len_std")]
    cols += _stats5("fwd_payload_len") + _stats5("bwd_payload_len")
    cols += [F.col("fwd_non_zero_payload_packets"), F.col("bwd_non_zero_payload_packets")]
    cols += [
        F.col("fwd_bulk_rate"),
        F.col("bwd_bulk_rate"),
        F.col("fwd_bulk_packets_count"),
        F.col("bwd_bulk_packets_count"),
    ]
    cols += _stats5("fwd_bulk_packets") + _stats5("bwd_bulk_packets")
    cols += _stats5("fwd_bulk_bytes") + _stats5("bwd_bulk_bytes")
    cols += _stats5("fwd_bulk_duration") + _stats5("bwd_bulk_duration")
    cols += [F.col("subflow_count")]
    cols += _stats5("active") + _stats5("idle")
    cols += [
        F.col("icmp_type"),
        F.col("icmp_code"),
        F.col("icmp_echo_request_count"),
        F.col("icmp_echo_reply_count"),
        F.col("icmp_error_count"),
        F.col("icmp_destination_unreachable_count"),
        F.col("fwd_retransmission_count") + F.col("bwd_retransmission_count"),
        F.col("fwd_retransmission_count"),
        F.col("bwd_retransmission_count"),
        F.col("fwd_duplicate_ack_count") + F.col("bwd_duplicate_ack_count"),
        F.col("fwd_duplicate_ack_count"),
        F.col("bwd_duplicate_ack_count"),
        F.col("fwd_zero_window_count") + F.col("bwd_zero_window_count"),
        F.col("fwd_zero_window_count"),
        F.col("bwd_zero_window_count"),
        F.col("fwd_init_window_size"),
        F.col("bwd_init_window_size"),
    ]
    cols += _stats5("window_size") + _stats5("fwd_window_size") + _stats5("bwd_window_size")
    for d in ("fwd", "bwd"):
        for n in ("fin", "syn", "rst", "psh", "ack", "urg", "cwr", "ece"):
            cols.append(F.col(f"{d}_{n}_flag_count"))
    for n in ("fin", "syn", "rst", "psh", "ack", "urg", "cwr", "ece"):
        cols.append(_flag_total(n))
    cols.append(F.col("flags"))
    cols += [
        _rate_per_s(F.col("payload_len_total"), dur),
        _rate_per_s(F.col("payload_len_count").cast("double"), dur),
        _rate_per_s(F.col("fwd_payload_len_total"), dur),
        _rate_per_s(F.col("fwd_payload_len_count").cast("double"), dur),
        _rate_per_s(F.col("bwd_payload_len_total"), dur),
        _rate_per_s(F.col("bwd_payload_len_count").cast("double"), dur),
        _safe_div(
            F.col("fwd_payload_len_count").cast("double"),
            F.col("subflow_count").cast("double"),
        ),
        _safe_div(F.col("fwd_payload_len_total"), F.col("subflow_count").cast("double")),
        _safe_div(
            F.col("bwd_payload_len_count").cast("double"),
            F.col("subflow_count").cast("double"),
        ),
        _safe_div(F.col("bwd_payload_len_total"), F.col("subflow_count").cast("double")),
        _safe_div(
            F.col("bwd_payload_len_count").cast("double"),
            F.col("fwd_payload_len_count").cast("double"),
        ),
    ]
    assert len(cols) == len(names), (len(cols), len(names))
    return flows.select(*[c.alias(n) for c, n in zip(cols, names)])


SCHEMAS = {
    "basic": basic_schema,
    "cic": cic_schema,
    "cidds": cidds_schema,
    "nf": nf_schema,
    "rustiflow": rustiflow_schema,
}
