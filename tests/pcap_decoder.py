"""Shim: the decoder moved into the engine package (sources/pcap.py)."""

from rustiflow_spark.sources.pcap import (  # noqa: F401
    _parse_ethernet_like,
    _parse_ipv4,
    _parse_ipv6,
    _parse_transport,
    decode_pcap,
    decode_pcap_bytes,
    read_pcap,
)
