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


def test_decoder_seam_accepts_custom_decoder(media):
    """extract_features' decoder parameter is the single-function integration
    seam: a custom decoder changes width/height/feature while everything
    around it (schema, sha256, batching) is unchanged."""

    def fixed(payload, kind):
        return (7, 9, [0.5] * 8) if kind == "image" else (None, None, [0.25] * 8)

    feats = multimodal.extract_features(media, decoder=fixed)
    assert feats.schema == multimodal.FEATURE_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    assert rows[0].width == 7 and rows[0].height == 9 and rows[0].feature == [0.5] * 8
    assert rows[1].width is None and rows[1].feature == [0.25] * 8
    for i, txt in TEXTS:
        assert rows[i].sha256 == hashlib.sha256(txt.encode()).hexdigest()


def test_decode_pil_falls_back_without_pil():
    """Without Pillow, decode_pil degrades to the deterministic stub for
    images too (undecodable payload path) — a mixed table never fails."""
    payload = b"not really an image"
    if not multimodal.pil_available():
        assert multimodal.decode_pil(payload, "image") == multimodal.decode_stub(payload, "image")
    assert multimodal.decode_pil(payload, "audio") == multimodal.decode_stub(payload, "audio")


def _make_wav(freq_hz=440.0, rate=8000, seconds=1.0, amp=0.5, sampwidth=2, channels=1):
    """Synthesize a PCM WAV in memory: a sine at ``amp`` of full scale."""
    import io
    import wave

    import numpy as np

    n = int(rate * seconds)
    t = np.arange(n) / rate
    x = amp * np.sin(2 * np.pi * freq_hz * t)
    full = 2 ** (8 * sampwidth - 1)
    if sampwidth == 1:
        data = (x * (full - 1) + 128).astype(np.uint8)
    elif sampwidth == 2:
        data = (x * (full - 1)).astype(np.int16)
    else:
        data = (x * (full - 1)).astype(np.int32)
    if channels > 1:
        data = np.repeat(data[:, None], channels, axis=1).reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(rate)
        wf.writeframes(data.tobytes())
    return buf.getvalue()


@pytest.mark.parametrize("sampwidth,channels", [(2, 1), (2, 2), (1, 1), (4, 1)])
def test_decode_wav_real_payload(sampwidth, channels):
    """A real PCM WAV decodes to per-segment RMS loudness ≈ amp/sqrt(2) in
    every segment — no optional dependency (stdlib wave + numpy)."""
    wav = _make_wav(amp=0.5, sampwidth=sampwidth, channels=channels)
    w, h, feat = multimodal.decode_wav(wav, "audio")
    assert w is None and h is None and len(feat) == 8
    expect = 0.5 / (2**0.5)
    for v in feat:
        assert abs(v - expect) < 0.02  # 8-bit quantization is the loosest


def test_decode_wav_fallbacks():
    """Non-audio kinds, non-WAV payloads, and silence behave sanely."""
    wav = _make_wav()
    assert multimodal.decode_wav(wav, "image") == multimodal.decode_stub(wav, "image")
    junk = b"definitely not RIFF"
    assert multimodal.decode_wav(junk, "audio") == multimodal.decode_stub(junk, "audio")
    silent = _make_wav(amp=0.0)
    _, _, feat = multimodal.decode_wav(silent, "audio")
    assert all(abs(v) < 1e-6 for v in feat)


def test_decode_wav_through_extract_features(spark):
    """The WAV decoder rides the same Arrow-batched mapInPandas plumbing as
    the stub: schema, sha256 and batching unchanged, features real."""
    loud = _make_wav(amp=0.9)
    quiet = _make_wav(amp=0.1)
    df = spark.createDataFrame(
        [
            (1, "audio", bytearray(loud), "audio/wav", len(loud)),
            (2, "audio", bytearray(quiet), "audio/wav", len(quiet)),
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    feats = multimodal.extract_features(df, decoder=multimodal.decode_wav)
    assert feats.schema == multimodal.FEATURE_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    assert rows[1].sha256 == hashlib.sha256(loud).hexdigest()
    assert rows[1].feature[0] > 5 * rows[2].feature[0]  # loud ≫ quiet


@pytest.mark.skipif(not multimodal.pil_available(), reason="Pillow not installed in this container")
def test_decode_pil_real_png(spark):
    """Environment-gated: with Pillow present, a real PNG decodes to its true
    dimensions and a normalized 8-bin histogram, through the same
    extract_features plumbing as the stub."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (20, 10), color=(255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()

    w, h, feat = multimodal.decode_pil(png, "image")
    assert (w, h) == (20, 10)
    assert len(feat) == 8 and abs(sum(feat) - 1.0) < 1e-6

    df = spark.createDataFrame(
        [(1, "image", bytearray(png), "image/png", len(png))],
        schema=multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.extract_features(df, decoder=multimodal.decode_pil).first()
    assert row.width == 20 and row.height == 10
