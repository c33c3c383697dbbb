"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct —
the same opaque-bytes duality as the reference's float_vector payloads
(byte-replayed without interpretation,
/root/reference/core/writer/milvus_handler.go:280-302).

The Spark-side plumbing (schema, Arrow batching via mapInPandas, batch
shape, partition passthrough) is real and tested. Decode status by format:

- **WAV (RIFF) and PPM (P6): REAL decode** — pure-Python header parsers
  (`parse_wav_header` / `parse_ppm_header`) run inside the Arrow batches
  of ``decode_media``; sample rate, channels, frame counts and pixel
  dimensions are extracted from actual bytes and oracle-checked.
- Compressed formats (PNG/JPEG/MP4): STUBBED — codec libraries don't ship
  in this container. `_decode_stub` is deterministic so tests are stable;
  swap it for PIL/ffmpeg in production, nothing else changes.
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


# ---------------------------------------------------------------------------
# REAL decoders: WAV (RIFF) and PPM (P6) — uncompressed formats a header
# parse fully describes, so no codec library is needed. These run inside
# decode_media's Arrow batches.
# ---------------------------------------------------------------------------


def synthesize_wav(
    n_frames: int, sample_rate: int, channels: int = 1, bits: int = 16,
    seed: bytes = b"wav",
) -> bytes:
    """A VALID little-endian RIFF/WAVE file with deterministic PCM data."""
    import struct

    block = channels * (bits // 8)
    data = (hashlib.sha256(seed).digest() * (n_frames * block // 32 + 1))[
        : n_frames * block
    ]
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_header(payload: bytes) -> dict:
    """Chunk-walking RIFF/WAVE parser: (sample_rate, channels, bits,
    n_frames, duration_ms) from real bytes. Raises ValueError on
    malformed input."""
    import struct

    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if cid == b"fmt " and pos + 8 + 16 <= len(b):
            fmt = struct.unpack("<HHIIHH", b[pos + 8 : pos + 24])
        elif cid == b"data":
            data_len = min(clen, len(b) - pos - 8)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    _, channels, sample_rate, _, block_align, bits = fmt
    if block_align == 0:
        raise ValueError("zero block align")
    n_frames = data_len // block_align
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sample_rate if sample_rate else 0,
    }


def synthesize_ppm(width: int, height: int, seed: bytes = b"ppm") -> bytes:
    """A VALID binary PPM (P6) with deterministic pixel bytes."""
    n = width * height * 3
    pixels = (hashlib.sha256(seed).digest() * (n // 32 + 1))[:n]
    return f"P6\n{width} {height}\n255\n".encode() + pixels


def parse_ppm_header(payload: bytes) -> dict:
    """P6 header parser (whitespace + '#' comments per the netpbm spec):
    (width, height, maxval). Raises ValueError on malformed input."""
    b = bytes(payload)
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    vals, pos = [], 2
    while len(vals) < 3 and pos < len(b):
        c = b[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(b) and b[pos : pos + 1].isdigit():
                pos += 1
            vals.append(int(b[start:pos]))
            continue
        elif not c.isspace():
            raise ValueError(f"unexpected byte in PPM header: {c!r}")
        pos += 1
    if len(vals) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = vals
    if len(b) - pos - 1 < w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return {"width": w, "height": h, "maxval": maxval}


def synthesize_decodable_media(spark, n: int = 48) -> DataFrame:
    """Deterministic table of REAL WAV/PPM payloads (even ids = audio,
    odd = image); every decoded field is a pure function of media_id, so
    a SQL oracle can check the decode end-to-end."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            payload = synthesize_wav(
                n_frames=100 + i,
                sample_rate=8000 + (i % 8) * 1000,
                channels=1 + ((i // 2) % 2),
                seed=f"wav{i}".encode(),
            )
            rows.append((i, "audio", bytearray(payload)))
        else:
            payload = synthesize_ppm(
                8 + i % 16, 6 + i % 12, seed=f"ppm{i}".encode()
            )
            rows.append((i, "image", bytearray(payload)))
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("kind", T.StringType(), False),
                T.StructField("payload", T.BinaryType(), True),
            ]
        ),
    )


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bits", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("maxval", T.IntegerType(), True),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode over Arrow batches: WAV headers for audio rows, PPM
    headers for image rows (mapInPandas; partitioning passes through —
    the same plumbing extract_features uses, minus any stub)."""

    _FIELDS = [f.name for f in DECODE_SCHEMA.fields[2:]]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                d = (
                    parse_wav_header(payload)
                    if kind == "audio"
                    else parse_ppm_header(payload)
                )
                recs.append(
                    {"media_id": mid, "kind": kind}
                    | {k: d.get(k) for k in _FIELDS}
                )
            out = pd.DataFrame(recs)
            for k in _FIELDS:
                out[k] = out[k].astype("Int32")
            yield out

    return media.mapInPandas(_decode, DECODE_SCHEMA)


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
