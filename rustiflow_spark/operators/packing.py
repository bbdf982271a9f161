"""Training-sequence packing and token chunking.

The north-rule input is a table of pre-tokenized training sequences
(BASELINE.json input_hint: doc_id, tokens array<int32>, n_tok, source).
Between "corpus" and "training batch" sits sequence packing: concatenate
documents in a deterministic order and cut the stream every `max_len`
tokens (the GPT-style concat-and-chunk layout), so every training sequence
is exactly full and document boundaries are recorded for attention
masking / provenance.

Spark-first formulation — no per-row Python, no stateful scan:

  pack_chunks:  the greedy "concatenate then cut" assignment has a closed
  form. With cum = running token total per stream and start = cum - n_tok,
  a document occupies global token span [start, cum), which intersects
  exactly the chunks floor(start/L) .. floor((cum-1)/L). One window cumsum
  + one explode(sequence(...)) produces every (document x chunk) segment
  with its offsets — pure Catalyst, whole-stage codegen, and the arithmetic
  is integer-exact so a SQL oracle replays it bit-for-bit.

  chunk_tokens: fixed-window (optionally overlapping) chunking of a single
  document's token array: explode the window starts (sequence with stride)
  and slice the array — again pure Catalyst.

Scale: the cumsum window partitions by the stream column (e.g. source), so
one stream = one task for the ordering pass. At 10^12 tokens you run one
stream per (source, day)-grain — the natural layout of a corpus — keeping
each window partition bounded; everything downstream of the cumsum is
embarrassingly parallel. (The reference has no packing analog; this is a
north-rule training-data component, like the sketches.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pack_chunks(
    df: DataFrame,
    stream_cols: list[str],
    order_cols: list[str],
    n_tok_col: str = "n_tok",
    max_len: int = 2048,
) -> DataFrame:
    """Assign each document to the training chunks it occupies.

    Concatenate documents per stream (`stream_cols`) in `order_cols` order
    and cut every `max_len` tokens. Returns the input columns plus:

      chunk_id        global chunk ordinal within the stream (0-based)
      tok_start       document-relative offset where this segment begins
      chunk_offset    position of the segment inside the chunk
      seg_len         tokens of this document inside this chunk
      n_chunks        how many chunks this document spans

    A document longer than max_len spans several rows (one per chunk); a
    document with n_tok == 0 contributes no tokens and emits no row.
    Deterministic given the ordering; `order_cols` must be unique per
    stream for exact reproducibility.
    """
    if max_len <= 0:
        raise ValueError(f"pack_chunks: max_len must be positive, got {max_len}")
    from pyspark.sql.window import Window

    w = Window.partitionBy(*stream_cols).orderBy(*order_cols)
    n = F.col(n_tok_col).cast("long")
    out = (
        df.withColumn("__cum", F.sum(n).over(w))
        .withColumn("__start", F.col("__cum") - n)
        .where(n > 0)
        .withColumn("__first", F.floor(F.col("__start") / max_len))
        .withColumn("__last", F.floor((F.col("__cum") - 1) / max_len))
        .withColumn("n_chunks", (F.col("__last") - F.col("__first") + 1).cast("int"))
        .withColumn("chunk_id", F.explode(F.sequence("__first", "__last")))
    )
    seg_lo = F.greatest(F.col("__start"), F.col("chunk_id") * max_len)
    seg_hi = F.least(F.col("__cum"), (F.col("chunk_id") + 1) * max_len)
    return (
        out.withColumn("tok_start", seg_lo - F.col("__start"))
        .withColumn("chunk_offset", seg_lo - F.col("chunk_id") * max_len)
        .withColumn("seg_len", seg_hi - seg_lo)
        .drop("__cum", "__start", "__first", "__last")
    )


def chunk_tokens(
    df: DataFrame,
    tokens_col: str = "tokens",
    chunk_len: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split each row's token array into fixed windows of `chunk_len` with
    `overlap` tokens shared between consecutive windows (stride =
    chunk_len - overlap). Adds:

      chunk_index   0-based window ordinal within the document
      chunk         array<...> slice (last window may be shorter)
      chunk_n_tok   its length

    Empty arrays emit no row. Pure Catalyst: explode(sequence(0, n-1,
    stride)) + slice, so the fan-out never touches Python.
    """
    if not 0 <= overlap < chunk_len:
        raise ValueError(
            f"chunk_tokens: need 0 <= overlap < chunk_len, got {overlap}/{chunk_len}"
        )
    stride = chunk_len - overlap
    n = F.size(F.col(tokens_col))
    out = (
        df.where(n > 0)
        .withColumn(
            "__s",
            F.explode(F.sequence(F.lit(0), n - 1, F.lit(stride))),
        )
        .withColumn("chunk_index", (F.col("__s") / stride).cast("int"))
        .withColumn("chunk", F.slice(F.col(tokens_col), F.col("__s") + 1, chunk_len))
    )
    return out.withColumn("chunk_n_tok", F.size("chunk")).drop("__s")
