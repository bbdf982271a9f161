"""Canonical Spark schemas for the engine.

The packet-event schema is the row analog of the reference's fixed
``PacketFeatures`` struct (rustiflow/src/packet_features.rs:60-84); the
token-sequence schema is the north-rule production input
(BASELINE.json:input_hint).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- packet events (PacketFeatures analog) ---------------------------------

PACKET_EVENT_FIELDS = [
    ("src_ip", T.StringType()),
    ("dst_ip", T.StringType()),
    ("src_port", T.IntegerType()),
    ("dst_port", T.IntegerType()),
    ("protocol", T.IntegerType()),
    ("ts_us", T.LongType()),
    ("fin_flag", T.IntegerType()),
    ("syn_flag", T.IntegerType()),
    ("rst_flag", T.IntegerType()),
    ("psh_flag", T.IntegerType()),
    ("ack_flag", T.IntegerType()),
    ("urg_flag", T.IntegerType()),
    ("cwr_flag", T.IntegerType()),
    ("ece_flag", T.IntegerType()),
    ("flags", T.IntegerType()),
    ("data_length", T.IntegerType()),
    ("header_length", T.IntegerType()),
    ("length", T.IntegerType()),
    ("window_size", T.IntegerType()),
    ("sequence_number", T.LongType()),
    ("sequence_number_ack", T.LongType()),
    ("icmp_type", T.IntegerType()),
    ("icmp_code", T.IntegerType()),
    ("event_seq", T.LongType()),  # stable arrival-order tiebreaker
]

PACKET_EVENT_SCHEMA = T.StructType(
    [T.StructField(name, dtype, True) for name, dtype in PACKET_EVENT_FIELDS]
)

# --- token sequences (north-rule input_hint shape) -------------------------

TOKEN_SEQUENCE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
        # deterministic synthesized event context (FIXTURES.md §2)
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("direction", T.IntegerType(), False),
        T.StructField("terminator", T.IntegerType(), False),
        T.StructField("event_seq", T.LongType(), False),
    ]
)


# --- flow feature superset output ------------------------------------------

_STAT_BLOCKS = [
    "iat",
    "fwd_iat",
    "bwd_iat",
    "active",
    "idle",
    "payload_len",
    "fwd_payload_len",
    "bwd_payload_len",
    "header_len",
    "fwd_header_len",
    "bwd_header_len",
    "fwd_packet_len",
    "bwd_packet_len",
    "window_size",
    "fwd_window_size",
    "bwd_window_size",
    "fwd_bulk_packets",
    "bwd_bulk_packets",
    "fwd_bulk_bytes",
    "bwd_bulk_bytes",
    "fwd_bulk_duration",
    "bwd_bulk_duration",
]

_FLAG_NAMES = [
    d + f
    for d in ("fwd_", "bwd_")
    for f in ("fin", "syn", "rst", "psh", "ack", "urg", "cwr", "ece")
]


def stat_columns(block: str) -> list[str]:
    return [f"{block}_{suffix}" for suffix in ("total", "mean", "std", "max", "min", "count")]


def flow_superset_schema() -> T.StructType:
    """Schema of the sessionization kernel's output: one row per exported
    flow (session), carrying every module's raw accumulators. Schema-specific
    outputs (CIC-100, NF-71, ...) are column selections/derivations on top.
    """
    fields: list[T.StructField] = [
        T.StructField("flow_key", T.StringType()),
        T.StructField("src_ip", T.StringType()),
        T.StructField("src_port", T.IntegerType()),
        T.StructField("dst_ip", T.StringType()),
        T.StructField("dst_port", T.IntegerType()),
        T.StructField("protocol", T.IntegerType()),
        T.StructField("ip_version", T.IntegerType()),
        T.StructField("src_ip_scope", T.StringType()),
        T.StructField("dst_ip_scope", T.StringType()),
        T.StructField("path_locality", T.StringType()),
        T.StructField("first_ts_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("cause", T.StringType()),
        T.StructField("close_style", T.StringType()),
        T.StructField("handshake_completed", T.IntegerType()),
        T.StructField("reset_before_handshake", T.IntegerType()),
        T.StructField("reset_after_handshake", T.IntegerType()),
        T.StructField("subflow_count", T.IntegerType()),
        T.StructField("fwd_init_window_size", T.IntegerType()),
        T.StructField("bwd_init_window_size", T.IntegerType()),
        T.StructField("icmp_type", T.IntegerType()),
        T.StructField("icmp_code", T.IntegerType()),
        T.StructField("icmp_echo_request_count", T.IntegerType()),
        T.StructField("icmp_echo_reply_count", T.IntegerType()),
        T.StructField("icmp_error_count", T.IntegerType()),
        T.StructField("icmp_destination_unreachable_count", T.IntegerType()),
        T.StructField("fwd_retransmission_count", T.IntegerType()),
        T.StructField("bwd_retransmission_count", T.IntegerType()),
        T.StructField("fwd_duplicate_ack_count", T.IntegerType()),
        T.StructField("bwd_duplicate_ack_count", T.IntegerType()),
        T.StructField("fwd_zero_window_count", T.IntegerType()),
        T.StructField("bwd_zero_window_count", T.IntegerType()),
        T.StructField("fwd_non_zero_payload_packets", T.IntegerType()),
        T.StructField("bwd_non_zero_payload_packets", T.IntegerType()),
        T.StructField("fwd_bulk_rate", T.DoubleType()),
        T.StructField("bwd_bulk_rate", T.DoubleType()),
        T.StructField("flags", T.StringType()),
        T.StructField("first_ts_fwd_ms", T.DoubleType()),
        T.StructField("first_ts_bwd_ms", T.DoubleType()),
        T.StructField("last_ts_fwd_ms", T.DoubleType()),
        T.StructField("last_ts_bwd_ms", T.DoubleType()),
        T.StructField("fwd_duration_ms", T.DoubleType()),
        T.StructField("bwd_duration_ms", T.DoubleType()),
    ]
    for block in _STAT_BLOCKS:
        for col in stat_columns(block):
            dtype = T.LongType() if col.endswith("_count") else T.DoubleType()
            fields.append(T.StructField(col, dtype))
    for name in _FLAG_NAMES:
        fields.append(T.StructField(name + "_flag_count", T.IntegerType()))
    return T.StructType(fields)


FLOW_SUPERSET_SCHEMA = flow_superset_schema()
FLOW_SUPERSET_COLUMNS = [f.name for f in FLOW_SUPERSET_SCHEMA.fields]
_FLOW_SUPERSET_SET = frozenset(FLOW_SUPERSET_COLUMNS)


def pruned_superset_schema(columns) -> T.StructType:
    """Superset schema restricted to ``columns`` (superset field order kept).

    Raises on unknown names so a typo in a requested-column set fails loudly
    instead of silently emitting a NaN column."""
    want = set(columns)
    unknown = want - _FLOW_SUPERSET_SET
    if unknown:
        raise ValueError(f"not superset columns: {sorted(unknown)}")
    return T.StructType(
        [f for f in FLOW_SUPERSET_SCHEMA.fields if f.name in want]
    )


def projection_superset_columns(spark, build) -> set[str]:
    """Superset columns referenced by a downstream projection.

    ``build`` maps the flow-superset DataFrame to the user's output (a
    schema function or any select/filter chain). The projection is analyzed
    against an empty superset relation and every plan node's attribute
    references are unioned — the exact analog of Catalyst column pruning,
    resolved *before* the Arrow kernel runs so the Python stage only
    computes and transfers what the query reads (the reference's
    "serialization dominates" lesson, engineering-notes.md:671-699).

    Falls back to the full superset on any analysis failure (pruning is an
    optimization; never a correctness gate)."""
    try:
        dummy = spark.createDataFrame([], FLOW_SUPERSET_SCHEMA)
        plan = build(dummy)._jdf.queryExecution().analyzed()
        names: set[str] = set()
        stack = [plan]
        while stack:
            node = stack.pop()
            it = node.references().iterator()
            while it.hasNext():
                names.add(it.next().name())
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
        refs = names & _FLOW_SUPERSET_SET
        return refs if refs else set(FLOW_SUPERSET_COLUMNS)
    except Exception:
        return set(FLOW_SUPERSET_COLUMNS)
