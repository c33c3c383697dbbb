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
