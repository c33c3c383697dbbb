"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct —
the same opaque-bytes duality as the reference's float_vector payloads
(byte-replayed without interpretation,
/root/reference/core/writer/milvus_handler.go:280-302).

The Spark-side plumbing (schema, Arrow batching via mapInPandas, batch
shape, partition passthrough) is real and tested; the actual codec calls
are STUBBED — image/audio libraries don't ship in this container. Each
stub is deterministic so tests are stable: swap `_decode_stub` for a real
decoder (PIL/ffmpeg) in production; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("thumb_w", T.IntegerType(), True),
        T.StructField("thumb_h", T.IntegerType(), True),
        # content fingerprint: md5 over the payload's UPPERCASE hex (the
        # same string F.hex(payload) yields), first 15 hex chars as int64.
        # Integer-only → SQL-oracle-checkable proof the binary column
        # survived the Arrow round-trip byte-exact.
        T.StructField("payload_fp", T.LongType(), True),
    ]
)


def _payload_fp(b: bytes | None) -> int | None:
    if b is None:
        return None
    import binascii

    hx = binascii.hexlify(bytes(b)).upper()
    return int(hashlib.md5(hx).hexdigest()[:15], 16)


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                64 + i % 512 if kind != "audio" else None,
                48 + i % 256 if kind != "audio" else None,
                1000 + i * 10 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, kind: str, dim: int) -> list[float]:
    """Deterministic stand-in for decode + feature extraction.

    PRODUCTION: replace with PIL/torchvision/ffmpeg decode. The container
    ships no codec libs (see module docstring), so this derives a stable
    pseudo-feature from the payload bytes.
    """
    if payload is None:
        raise NotImplementedError("real decode requires codec libs; payload missing")
    h = hashlib.sha256(payload + kind.encode()).digest()
    return [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8, batch_hint: int = 256) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched, zero row-UDFs).

    Partitioning passes through: upstream repartitioning (e.g. by a
    storage bucket) is preserved; each Arrow batch is processed
    vectorized. Resize/frame-sample would slot into the same iterator.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int32"),
                    "feature": [
                        _decode_stub(bytes(b) if b is not None else None, k, dim)
                        for b, k in zip(pdf["payload"], pdf["kind"])
                    ],
                    # resize stub: halve dimensions where present
                    "thumb_w": (pdf["width"] // 2).astype("Int32"),
                    "thumb_h": (pdf["height"] // 2).astype("Int32"),
                    "payload_fp": pdf["payload"].map(_payload_fp).astype("Int64"),
                }
            )
            yield out

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    Frame timestamps are computed JVM-side (sequence + explode); the
    per-frame decode is the stubbed Pandas step above in production.
    """
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
