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
- **Resize and frame-sample: REAL for the uncompressed formats** —
  `resize_images` (nearest-neighbor over actual P6 pixel bytes, numpy
  fancy-indexing, emits a valid P6 thumbnail + a value-checkable pixel
  sum) and `sample_pcm_frames` (every-k-th-frame PCM extraction over
  actual WAV bytes, |amplitude| energy + peak). Arithmetic-content
  synthesizers (`synthesize_arith_media`) make every output a closed
  form of (media_id, position) so full SQL oracles verify the byte work.
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
    seed: bytes = b"wav", data: bytes | None = None,
) -> bytes:
    """A VALID little-endian RIFF/WAVE file with deterministic PCM data
    (sha-derived from ``seed``, or caller-supplied ``data``)."""
    import struct

    block = channels * (bits // 8)
    if data is None:
        data = (hashlib.sha256(seed).digest() * (n_frames * block // 32 + 1))[
            : n_frames * block
        ]
    elif len(data) != n_frames * block:
        raise ValueError("data length does not match n_frames * block_align")
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_chunks(b: bytes) -> tuple[tuple, int, int]:
    """Chunk walk: (fmt tuple, data offset, data length). Raises
    ValueError on malformed input."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data_off, data_len = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if cid == b"fmt " and pos + 8 + 16 <= len(b):
            fmt = struct.unpack("<HHIIHH", b[pos + 8 : pos + 24])
        elif cid == b"data":
            data_off = pos + 8
            data_len = min(clen, len(b) - pos - 8)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    return fmt, data_off, data_len


def parse_wav_header(payload: bytes) -> dict:
    """Chunk-walking RIFF/WAVE parser: (sample_rate, channels, bits,
    n_frames, duration_ms) from real bytes. Raises ValueError on
    malformed input."""
    fmt, _, data_len = _wav_chunks(bytes(payload))
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


def synthesize_ppm(
    width: int, height: int, seed: bytes = b"ppm",
    pixels: bytes | None = None,
) -> bytes:
    """A VALID binary PPM (P6) with deterministic pixel bytes
    (sha-derived from ``seed``, or caller-supplied ``pixels``)."""
    n = width * height * 3
    if pixels is None:
        pixels = (hashlib.sha256(seed).digest() * (n // 32 + 1))[:n]
    elif len(pixels) != n:
        raise ValueError("pixels length does not match width * height * 3")
    return f"P6\n{width} {height}\n255\n".encode() + pixels


def _ppm_parse(b: bytes) -> tuple[int, int, int, int]:
    """P6 parse: (width, height, maxval, pixel-data offset). Raises
    ValueError on malformed input."""
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
    return w, h, maxval, pos + 1  # one whitespace byte after maxval


def parse_ppm_header(payload: bytes) -> dict:
    """P6 header parser (whitespace + '#' comments per the netpbm spec):
    (width, height, maxval). Raises ValueError on malformed input."""
    w, h, maxval, _ = _ppm_parse(bytes(payload))
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


# ---------------------------------------------------------------------------
# REAL transforms over decoded bytes: nearest-neighbor image resize and PCM
# frame sampling. Arithmetic-content synthesizers make every output number a
# closed-form function of (media_id, position), so a plain SQL oracle can
# verify the full bytes-in → numbers-out path (parse, reshape, index, sum)
# without shipping codec libraries.
# ---------------------------------------------------------------------------


def synthesize_arith_media(spark, n: int = 48) -> DataFrame:
    """Deterministic media whose CONTENT is arithmetic, not hashed: even
    ids are mono 16-bit WAV with sample[j] = (id*31 + j*17) % 65536 −
    32768; odd ids are P6 images with flat pixel byte[j] = (id*7 + j*13)
    % 256. Shapes follow synthesize_decodable_media (n_frames = 100+id;
    width = 8+id%16, height = 6+id%12)."""
    import numpy as np

    rows = []
    for i in range(n):
        if i % 2 == 0:
            nf = 100 + i
            samples = (
                ((i * 31 + np.arange(nf, dtype=np.int64) * 17) % 65536)
                - 32768
            ).astype("<i2")
            payload = synthesize_wav(
                n_frames=nf, sample_rate=8000 + (i % 8) * 1000,
                channels=1, data=samples.tobytes(),
            )
            rows.append((i, "audio", bytearray(payload)))
        else:
            w, h = 8 + i % 16, 6 + i % 12
            px = (
                (i * 7 + np.arange(w * h * 3, dtype=np.int64) * 13) % 256
            ).astype(np.uint8)
            payload = synthesize_ppm(w, h, pixels=px.tobytes())
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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_w", T.IntegerType(), False),
        T.StructField("src_h", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        # int64 sum over the RESIZED pixel bytes — the value-level proof
        # the resample indexed the right source pixels
        T.StructField("pixel_sum", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),  # valid P6 thumb
    ]
)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL nearest-neighbor resize over actual P6 pixel bytes
    (mapInPandas; vectorized numpy fancy-indexing per image — no Python
    loop over pixels). Source pixel for output (x', y') is
    (floor(x'·W/out_w), floor(y'·H/out_h)) — the standard NN map. Output
    rows carry a fresh VALID P6 payload plus an int64 pixel sum so an
    arithmetic-content oracle can value-check the resample.

    Compressed inputs (PNG/JPEG) would decode in the same iterator via
    PIL in production (see module docstring); the container ships no
    codec libs, so only P6 flows here."""
    import numpy as np

    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize_images: output dims must be positive")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, _, off = _ppm_parse(b)
                arr = np.frombuffer(
                    b, dtype=np.uint8, count=w * h * 3, offset=off
                ).reshape(h, w, 3)
                ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
                xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
                thumb = arr[ys][:, xs]
                recs.append(
                    {
                        "media_id": mid,
                        "src_w": w,
                        "src_h": h,
                        "out_w": out_w,
                        "out_h": out_h,
                        "pixel_sum": int(thumb.sum(dtype=np.int64)),
                        "payload": synthesize_ppm(
                            out_w, out_h, pixels=thumb.tobytes()
                        ),
                    }
                )
            out = pd.DataFrame(recs)
            for k in ("src_w", "src_h", "out_w", "out_h"):
                out[k] = out[k].astype("int32")
            out["pixel_sum"] = out["pixel_sum"].astype("int64")
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(
        _resize, RESIZE_SCHEMA
    )


PCM_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_sampled", T.IntegerType(), False),
        # int64 sum of |amplitude| over sampled frames (all channels)
        T.StructField("energy", T.LongType(), False),
        T.StructField("peak", T.IntegerType(), False),
    ]
)


def sample_pcm_frames(media: DataFrame, every_n: int = 7) -> DataFrame:
    """REAL PCM frame sampling over actual WAV bytes: decode 16-bit
    frames, keep every ``every_n``-th (frames 0, n, 2n, …), report count
    + |amplitude| energy + peak (mapInPandas, numpy strided slice — the
    audio sibling of resize_images; video frame extraction composes the
    same slice with a per-frame decode)."""
    import numpy as np

    if every_n <= 0:
        raise ValueError("sample_pcm_frames: every_n must be positive")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                fmt, off, dlen = _wav_chunks(b)
                _, channels, _, _, block_align, bits = fmt
                if bits != 16:
                    raise ValueError("sample_pcm_frames supports 16-bit PCM")
                n_frames = dlen // block_align
                frames = np.frombuffer(
                    b, dtype="<i2", count=n_frames * channels, offset=off
                ).reshape(n_frames, channels)
                picked = np.abs(frames[::every_n].astype(np.int64))
                recs.append(
                    {
                        "media_id": mid,
                        "n_sampled": picked.shape[0],
                        "energy": int(picked.sum(dtype=np.int64)),
                        "peak": int(picked.max()) if picked.size else 0,
                    }
                )
            out = pd.DataFrame(recs)
            out["n_sampled"] = out["n_sampled"].astype("int32")
            out["energy"] = out["energy"].astype("int64")
            out["peak"] = out["peak"].astype("int32")
            yield out

    return media.filter(F.col("kind") == "audio").mapInPandas(
        _sample, PCM_SAMPLE_SCHEMA
    )
