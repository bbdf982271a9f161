"""Streaming exact deduplication — the dedup family's unbounded-stream
member (batch family: operators/dedup.py).

Two state regimes, picked by whether a watermark is supplied:

- Global exact (``watermark_delay=None``): ``dropDuplicates`` on the
  content hash. Every distinct content emits exactly once, on first
  arrival, across all micro-batches. State is one tiny row (the 128-bit
  hash) per distinct content, FOREVER — exact, but state grows with
  distinct volume. The correctness baseline, fine up to ~10^9 distincts.

- Horizon-bounded (``ts_us_col`` + ``watermark_delay``):
  ``dropDuplicatesWithinWatermark`` — state holds only hashes seen within
  the watermark horizon, so it is O(arrival rate × delay) regardless of
  stream length. Duplicates separated by MORE than the delay re-emit
  (at-least-once dedup): the 100-TB path, composed with a batch
  exact_dedup compaction downstream when end-to-end exactness matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    stream: DataFrame,
    content_cols: list[str],
    ts_us_col: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """First-arrival stream of distinct contents: input columns plus a
    ``content_hash`` column (md5 over content_cols, \\x1f-joined — the
    same hash batch exact_dedup groups on, so streaming output can be
    compacted by the batch operator)."""
    h = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in content_cols]))
    out = stream.withColumn("content_hash", h)
    if watermark_delay is None:
        return out.dropDuplicates(["content_hash"])
    if ts_us_col is None:
        raise ValueError("watermark_delay requires ts_us_col")
    return (
        out.withColumn("__ts", F.timestamp_micros(F.col(ts_us_col)))
        .withWatermark("__ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .drop("__ts")
    )
