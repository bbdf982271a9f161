"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages. The decode step itself is STUBBED in this
environment (no image/audio libraries in the container): ``decode_fn`` can
be a real decoder in production, and ``deterministic_fake_decoder``
provides a seeded stand-in so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shapes — is fully real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def real_decoder(payload: bytes, kind: str, meta) -> np.ndarray:
    """Production decode hook — requires PIL/librosa/av, absent here."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; inject a decode_fn or use deterministic_fake_decoder"
    )


_FAKE_M = 2147483647  # 2^31 - 1 (prime)
_FAKE_B = 131  # byte-polynomial base
_FAKE_L = 2654435761  # length mix (Knuth)
_FAKE_C = 12345  # LCG increment
_FAKE_Q = 1024  # value quantum: v = k/1024, exact in float32


def fake_decoder_seed(payload: bytes) -> int:
    """Payload-derived seed: polynomial hash of the first 8 bytes
    (zero-padded) plus a length mix, mod 2^31-1. Every operation is plain
    BIGINT arithmetic so a SQL oracle (DuckDB) can replay it byte-for-byte
    — ascii(substr(...)) per position + strlen (payloads are the UTF-8
    text bytes, ASCII in the fixtures)."""
    h = 0
    for byte in payload[:8].ljust(8, b"\0"):
        h = h * _FAKE_B + byte
    return (h + len(payload) * _FAKE_L) % _FAKE_M


def deterministic_fake_decoder(payload: bytes, kind: str, meta) -> np.ndarray:
    """Seeded stand-in decoder: derives a deterministic float tensor from
    the payload bytes so pipelines are testable end-to-end.

    The tensor values are an LCG over the payload seed quantized to
    multiples of 1/1024 — deliberately SQL-expressible (exact in both
    float32 and DuckDB DOUBLE arithmetic) so the downstream feature
    pooling can be verified against a DuckDB oracle, unlike an
    sha256-seeded RandomState which no SQL engine can replay."""
    seed = fake_decoder_seed(bytes(payload))

    def geti(key, default):
        # struct fields arrive as float (NaN-able) through Arrow; coerce
        if meta is None:
            return default
        v = meta.get(key) if isinstance(meta, dict) else meta[key]
        try:
            return default if v is None or v != v else int(v)
        except TypeError:
            return default

    if kind == "image":
        h, w, c = geti("height", 8), geti("width", 8), geti("channels", 3)
        shape = (min(h, 32), min(w, 32), c)
    elif kind == "audio":
        shape = (1024,)
    else:
        shape = (4, 8, 8, 3)  # video: frames×h×w×c
    n = int(np.prod(shape))
    i = np.arange(1, n + 1, dtype=np.int64)  # seed*i < 2^43: int64-exact
    k = (seed * i + _FAKE_C) % _FAKE_M % _FAKE_Q
    return (k / float(_FAKE_Q)).astype(np.float32).reshape(shape)


def extract_media_features(
    df: DataFrame,
    decode_fn=deterministic_fake_decoder,
    feature_dim: int = 16,
    batch_hint: int = 256,
) -> DataFrame:
    """media table -> fixed-width feature vectors via mapInPandas.

    Feature = channel-mean + coarse spatial pooling of the decoded tensor,
    padded/truncated to feature_dim. Failures yield decode_ok=False with a
    zero vector (pipelines filter on the flag)."""

    def batch(iterator):
        for pdf in iterator:
            n = len(pdf)
            feats = np.zeros((n, feature_dim), dtype=np.float32)
            ok = np.zeros(n, dtype=bool)
            for i in range(n):
                try:
                    tensor = decode_fn(
                        pdf["payload"].iloc[i], pdf["kind"].iloc[i], pdf["meta"].iloc[i]
                    )
                    # pool in float64: round32(round64(sum/q)) is then
                    # bit-identical to a SQL oracle's CAST(avg(..) AS FLOAT)
                    flat = tensor.reshape(-1).astype(np.float64)
                    pooled = np.array(
                        [
                            flat[j :: feature_dim][: max(flat.size // feature_dim, 1)].mean()
                            for j in range(feature_dim)
                        ],
                        dtype=np.float32,
                    )
                    feats[i] = np.nan_to_num(pooled)
                    ok[i] = True
                except NotImplementedError:
                    ok[i] = False
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(dtype=np.int64),
                    "kind": pdf["kind"],
                    "feature": list(feats),
                    "decode_ok": ok,
                }
            )

    return df.mapInPandas(batch, schema=FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame, every_n: int = 2
) -> DataFrame:
    """Frame-sampling plumbing: explodes video rows into (media_id,
    frame_idx) rows for per-frame downstream processing — pure Catalyst
    (sequence + explode), the real pattern for sharding video decode."""
    frames = F.explode(
        F.sequence(F.lit(0), F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)), F.lit(every_n))
    )
    return df.filter(F.col("kind") == "video").select(
        "media_id", frames.alias("frame_idx"), "meta"
    )


def generate_media_table(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media rows (opaque bytes + metadata)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(rng.randint(64, 512))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {
                    "width": int(rng.randint(8, 64)) if kind != "audio" else None,
                    "height": int(rng.randint(8, 64)) if kind != "audio" else None,
                    "channels": 3 if kind != "audio" else 1,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": int(rng.randint(4, 32)) if kind == "video" else None,
                    "format": "raw",
                },
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
