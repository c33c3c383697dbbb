from pyspark.sql import functions as F

from milvus_cdc_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    synthesize_media,
)


def test_feature_extraction_shapes(spark):
    media = synthesize_media(spark, 30)
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] == 128
    # deterministic: same payload → same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_frame_sample_counts(spark):
    media = synthesize_media(spark, 30)
    frames = frame_sample(media, every_ms=500)
    got = frames.groupBy("media_id").count().collect()
    meta = {r["media_id"]: r["duration_ms"] for r in media.filter(F.col("kind") == "video").collect()}
    assert {r["media_id"] for r in got} == set(meta)
    for r in got:
        assert r["count"] == meta[r["media_id"]] // 500 + 1


# ---- real WAV/PPM decode (round 3: the stub is gone for these formats) ----

def test_wav_parser_round_trip():
    from milvus_cdc_spark.operators.multimodal import (
        parse_wav_header, synthesize_wav,
    )

    b = synthesize_wav(n_frames=1234, sample_rate=16000, channels=2)
    d = parse_wav_header(b)
    assert d == {
        "sample_rate": 16000, "channels": 2, "bits": 16,
        "n_frames": 1234, "duration_ms": 1234 * 1000 // 16000,
    }
    # malformed inputs fail loudly, not silently
    import pytest

    with pytest.raises(ValueError, match="RIFF"):
        parse_wav_header(b"\x00" * 32)
    with pytest.raises(ValueError, match="fmt/data"):
        parse_wav_header(b"RIFF\x04\x00\x00\x00WAVE")


def test_ppm_parser_round_trip():
    from milvus_cdc_spark.operators.multimodal import (
        parse_ppm_header, synthesize_ppm,
    )

    d = parse_ppm_header(synthesize_ppm(17, 9))
    assert d == {"width": 17, "height": 9, "maxval": 255}
    # comments in the header are legal netpbm
    d = parse_ppm_header(b"P6\n# a comment\n4 2\n255\n" + b"\x00" * 24)
    assert d == {"width": 4, "height": 2, "maxval": 255}
    import pytest

    with pytest.raises(ValueError, match="P6"):
        parse_ppm_header(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated PPM pixel"):
        parse_ppm_header(b"P6\n4 2\n255\n\x00\x00")


def test_decode_media_distributed(spark):
    """The parsers run inside mapInPandas over REAL bytes; decoded fields
    survive the Arrow boundary with correct per-kind nulls."""
    from milvus_cdc_spark.operators.multimodal import (
        decode_media, synthesize_decodable_media,
    )

    out = decode_media(synthesize_decodable_media(spark, 24).repartition(4))
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 24
    r0 = rows[0]  # audio
    assert (r0["sample_rate"], r0["channels"], r0["n_frames"]) == (8000, 1, 100)
    assert r0["width"] is None
    r1 = rows[1]  # image
    assert (r1["width"], r1["height"], r1["maxval"]) == (9, 7, 255)
    assert r1["sample_rate"] is None


# ---- real resize / PCM frame-sample (round 4: bytes in, numbers out) ----

def test_resize_images_real_bytes(spark):
    """NN resize over actual P6 bytes: the thumb re-parses as a valid P6
    of the target dims, and every thumb pixel equals the NN-mapped source
    pixel computed independently here."""
    import numpy as np

    from milvus_cdc_spark.operators.multimodal import (
        _ppm_parse, resize_images, synthesize_arith_media,
    )

    media = synthesize_arith_media(spark, 16).repartition(4)
    out = {r["media_id"]: r for r in resize_images(media, 5, 4).collect()}
    src = {r["media_id"]: bytes(r["payload"])
           for r in media.filter("kind = 'image'").collect()}
    assert set(out) == set(src) and len(out) == 8
    for mid, r in out.items():
        w, h, _, off = _ppm_parse(src[mid])
        assert (r["src_w"], r["src_h"], r["out_w"], r["out_h"]) == (w, h, 5, 4)
        tw, th, _, toff = _ppm_parse(bytes(r["payload"]))
        assert (tw, th) == (5, 4)
        arr = np.frombuffer(src[mid], np.uint8, w * h * 3, off).reshape(h, w, 3)
        want = arr[(np.arange(4) * h) // 4][:, (np.arange(5) * w) // 5]
        got = np.frombuffer(bytes(r["payload"]), np.uint8, 60, toff).reshape(4, 5, 3)
        assert (got == want).all()
        assert r["pixel_sum"] == int(want.sum(dtype=np.int64))


def test_resize_identity_and_upscale():
    """Resizing to the source dims is the identity; upscale repeats
    source pixels (NN semantics) — checked without Spark via the same
    numpy core the Arrow batches run."""
    import numpy as np

    from milvus_cdc_spark.operators.multimodal import _ppm_parse, synthesize_ppm

    b = synthesize_ppm(6, 4, seed=b"x")
    w, h, _, off = _ppm_parse(b)
    arr = np.frombuffer(b, np.uint8, w * h * 3, off).reshape(h, w, 3)
    same = arr[(np.arange(4) * 4) // 4][:, (np.arange(6) * 6) // 6]
    assert (same == arr).all()
    up = arr[(np.arange(8) * 4) // 8][:, (np.arange(12) * 6) // 12]
    assert up.shape == (8, 12, 3)
    assert (up[::2, ::2] == arr).all()  # every source pixel survives


def test_sample_pcm_frames_real_bytes(spark):
    """Every-kth-frame PCM extraction over actual WAV bytes matches an
    independent numpy fold; stereo frames keep both channels."""
    import numpy as np

    from milvus_cdc_spark.operators.multimodal import (
        sample_pcm_frames, synthesize_arith_media, synthesize_wav,
    )

    media = synthesize_arith_media(spark, 16).repartition(4)
    out = {r["media_id"]: r for r in sample_pcm_frames(media, every_n=7).collect()}
    assert len(out) == 8
    for i in range(0, 16, 2):
        nf = 100 + i
        s = ((i * 31 + np.arange(nf, dtype=np.int64) * 17) % 65536) - 32768
        picked = np.abs(s[::7])
        r = out[i]
        assert r["n_sampled"] == len(picked)
        assert r["energy"] == int(picked.sum())
        assert r["peak"] == int(picked.max())
    # stereo: energy sums BOTH channels of each sampled frame
    sam = np.arange(20, dtype=np.int64).reshape(10, 2)  # 10 frames, 2 ch
    wav = synthesize_wav(10, 8000, channels=2,
                         data=sam.astype("<i2").tobytes())
    df = spark.createDataFrame(
        [(99, "audio", bytearray(wav))], "media_id long, kind string, payload binary"
    )
    r = sample_pcm_frames(df, every_n=4).collect()[0]
    want = np.abs(sam[::4])
    assert (r["n_sampled"], r["energy"], r["peak"]) == (
        3, int(want.sum()), int(want.max())
    )


def test_resize_and_sample_validate_args(spark):
    import pytest

    from milvus_cdc_spark.operators.multimodal import (
        resize_images, sample_pcm_frames, synthesize_arith_media,
    )

    media = synthesize_arith_media(spark, 4)
    with pytest.raises(ValueError, match="positive"):
        resize_images(media, 0, 4)
    with pytest.raises(ValueError, match="positive"):
        sample_pcm_frames(media, every_n=0)
