"""Multimodal-column plumbing tests: schema contracts, Arrow-batched feature
extraction (stub decode), frame-sampling fan-out."""

import hashlib

import pytest
from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import multimodal

TEXTS = [(i, f"document body number {i} " * (i + 1)) for i in range(9)]


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    return multimodal.synthesize_media(docs)


def test_media_schema_and_kinds(media):
    assert [f.name for f in media.schema.fields] == [f.name for f in multimodal.MEDIA_SCHEMA.fields]
    kinds = {r.media_id: r.kind for r in media.select("media_id", "kind").collect()}
    assert kinds[0] == "image" and kinds[1] == "audio" and kinds[2] == "video"
    n = {r.media_id: r.n_bytes for r in media.collect()}
    assert n[3] == len(TEXTS[3][1].encode())


def test_extract_features_sha_and_schema(media):
    feats = multimodal.extract_features(media)
    assert feats.schema == multimodal.FEATURE_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    for i, txt in TEXTS:
        assert rows[i].sha256 == hashlib.sha256(txt.encode()).hexdigest()
        if rows[i].kind == "image":
            assert 64 <= rows[i].width <= 255 and 64 <= rows[i].height <= 255
        else:
            assert rows[i].width is None
        assert len(rows[i].feature) == 8 and all(0 <= v <= 1 for v in rows[i].feature)


def test_sample_frames_only_video(media):
    frames = multimodal.sample_frames(media, every_n_bytes=64, max_frames=4)
    kinds = {r.media_id for r in frames.select("media_id").distinct().collect()}
    assert kinds == {2, 5, 8}  # doc_id % 3 == 2 → video
    per = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    assert all(1 <= v <= 4 for v in per.values())
    offs = [r.frame_offset for r in frames.filter("media_id = 8").orderBy("frame_idx").collect()]
    assert offs == [i * 64 for i in range(len(offs))]
