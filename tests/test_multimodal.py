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


class TestPngCodec:
    """decode_png is round-trip tested against the bundled encode_png —
    all color types, all five scanline filters, corrupt-payload fallback."""

    def _rand(self, shape, seed):
        import numpy as np

        return np.random.RandomState(seed).randint(0, 256, size=shape).astype("uint8")

    def test_roundtrip_gray_rgb_rgba(self):
        import numpy as np

        from custom_columnar_format_spark.operators.multimodal import decode_png, encode_png

        for shape, seed in [((13, 9), 1), ((8, 16, 3), 2), ((5, 7, 4), 3)]:
            a = self._rand(shape, seed)
            w, h, feat = decode_png(encode_png(a), "image")
            assert (w, h) == (shape[1], shape[0])
            if a.ndim == 2:
                gray = a.astype(np.float64)
            else:
                gray = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
            hist, _ = np.histogram(gray, bins=8, range=(0, 256))
            want = [float(v) / (hist.sum() or 1.0) for v in hist]
            assert feat == pytest.approx(want)
            assert abs(sum(feat) - 1.0) < 1e-9

    def test_all_filter_types_decode(self):
        """Hand-build one PNG per filter type (same 2-row RGB image encoded
        under filters 0..4) and assert every variant decodes to the same
        pixels as the filter-0 baseline."""
        import struct
        import zlib

        import numpy as np

        from custom_columnar_format_spark.operators.multimodal import _PNG_SIG, decode_png

        px = self._rand((2, 4, 3), 7)
        stride = 4 * 3

        def chunk(tag, data):
            return struct.pack(">I", len(data)) + tag + data + struct.pack(
                ">I", zlib.crc32(tag + data) & 0xFFFFFFFF
            )

        def build(ft):
            rows = []
            prev = np.zeros(stride, dtype=np.int32)
            for r in range(2):
                line = px[r].reshape(-1).astype(np.int32)
                if ft == 0:
                    enc = line
                elif ft == 1:
                    enc = line.copy()
                    enc[3:] = (line[3:] - line[:-3]) % 256
                elif ft == 2:
                    enc = (line - prev) % 256
                elif ft == 3:
                    enc = line.copy()
                    for x in range(stride):
                        left = line[x - 3] if x >= 3 else 0
                        enc[x] = (line[x] - (left + prev[x]) // 2) % 256
                else:  # Paeth
                    enc = line.copy()
                    for x in range(stride):
                        a = line[x - 3] if x >= 3 else 0
                        b = prev[x]
                        c = (px[r - 1].reshape(-1).astype(np.int32)[x - 3]
                             if (x >= 3 and r > 0) else 0)
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                        enc[x] = (line[x] - pred) % 256
                rows.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
                prev = line
            ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0)
            return (_PNG_SIG + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(b"".join(rows))) + chunk(b"IEND", b""))

        base = decode_png(build(0), "image")
        for ft in (1, 2, 3, 4):
            assert decode_png(build(ft), "image") == base

    def test_fallback_paths(self):
        from custom_columnar_format_spark.operators.multimodal import (
            decode_png,
            decode_stub,
            encode_png,
        )

        a = self._rand((4, 4), 9)
        png = encode_png(a)
        # non-image kind, non-PNG payload, truncated PNG: all fall to the stub
        assert decode_png(png, "audio") == decode_stub(png, "audio")
        assert decode_png(b"not a png", "image") == decode_stub(b"not a png", "image")
        assert decode_png(png[:20], "image") == decode_stub(png[:20], "image")

    def test_extract_features_with_png_decoder(self, spark):
        """End-to-end: a media table whose image payloads are real PNGs runs
        the Arrow mapInPandas pipeline with decode_png and yields true
        dimensions (stub yields fake ones)."""
        from custom_columnar_format_spark.operators import multimodal

        a = self._rand((6, 11, 3), 4)
        png = multimodal.encode_png(a)
        rows = [(1, "image", bytearray(png), "image/png", len(png)),
                (2, "audio", bytearray(b"zz"), "application/x-fake-audio", 2)]
        media = spark.createDataFrame(
            rows, "media_id: long, kind: string, payload: binary, mime: string, n_bytes: long"
        )
        out = {r["media_id"]: r for r in
               multimodal.extract_features(media, decoder=multimodal.decode_png).collect()}
        assert (out[1]["width"], out[1]["height"]) == (11, 6)
        assert abs(sum(out[1]["feature"]) - 1.0) < 1e-6  # float32 feature column
        stub = multimodal.decode_stub(b"zz", "audio")
        assert out[2]["feature"] == pytest.approx(stub[2])


def _gradient_frames(w=12, h=8, n=3):
    import numpy as np

    frames = []
    for t in range(n):
        f = np.zeros((h, w, 3), dtype=np.uint8)
        for x in range(w):
            f[:, x, :] = min(255, int(255 * x / max(w - 1, 1)) + t)
        frames.append(f)
    return frames


def test_decode_avi_roundtrip_keyframe():
    """decode_avi round-trips the bundled encode_avi: true dimensions, and
    the feature vector equals the keyframe's 8-bin luma histogram computed
    directly from the source array."""
    import numpy as np

    frames = _gradient_frames()
    payload = multimodal.encode_avi(frames)
    w, h, feat = multimodal.decode_avi(payload, "video")
    assert (w, h) == (12, 8)
    f0 = frames[0].astype(np.float64)
    luma = 0.299 * f0[:, :, 0] + 0.587 * f0[:, :, 1] + 0.114 * f0[:, :, 2]
    hist, _ = np.histogram(luma, bins=8, range=(0.0, 256.0))
    expect = [float(c) / float(hist.sum()) for c in hist]
    assert feat == pytest.approx(expect)
    assert abs(sum(feat) - 1.0) < 1e-9


def test_decode_avi_odd_width_padding():
    """Row stride pads to 4 bytes when w*3 % 4 != 0 — the classic DIB trap."""
    import numpy as np

    frames = [np.full((5, 7, 3), 200, dtype=np.uint8)]
    w, h, feat = multimodal.decode_avi(multimodal.encode_avi(frames), "video")
    assert (w, h) == (7, 5)
    # uniform gray 200 -> all mass in bin 6 (192..224)
    assert feat[6] == pytest.approx(1.0)


def test_decode_avi_fallbacks():
    avi = multimodal.encode_avi(_gradient_frames())
    # wrong kind routes to the stub
    assert multimodal.decode_avi(avi, "image") == multimodal.decode_stub(avi, "image")
    # malformed container falls back instead of raising
    junk = b"RIFFxxxxAVI " + b"\x00" * 16
    assert multimodal.decode_avi(junk, "video") == multimodal.decode_stub(junk, "video")
    trunc = avi[: len(avi) // 2]
    out = multimodal.decode_avi(trunc, "video")
    assert out == multimodal.decode_stub(trunc, "video") or len(out[2]) == 8


def test_decode_avi_through_extract_features(spark):
    """End-to-end through the Arrow mapInPandas seam: real AVI payloads in a
    mixed media table decode to real dims/features, others stub-fall-back."""
    avi = multimodal.encode_avi(_gradient_frames())
    rows = [
        (0, "video", bytearray(avi), "video/avi", len(avi)),
        (1, "image", bytearray(b"not media"), "application/x-fake-image", 9),
    ]
    df = spark.createDataFrame(rows, ["media_id", "kind", "payload", "mime", "n_bytes"])
    feats = {r.media_id: r for r in multimodal.extract_features(df, decoder=multimodal.decode_avi).collect()}
    assert (feats[0].width, feats[0].height) == (12, 8)
    assert feats[1].width is not None  # stub path for the non-video row


def test_decode_ffmpeg_falls_back_without_ffmpeg():
    """Junk payloads and missing binaries must degrade to the stub — never
    raise (the fleet-wide never-fail-mid-batch policy)."""
    payload = b"not media at all"
    for kind in ("video", "audio", "image"):
        got = multimodal.decode_ffmpeg(payload, kind)
        assert got == multimodal.decode_stub(payload, kind)


@pytest.mark.skipif(
    not multimodal.ffmpeg_available(), reason="ffmpeg not installed in this container"
)
def test_decode_ffmpeg_real_compressed_video(tmp_path):
    """Encode a tiny synthetic clip with ffmpeg itself, then decode the
    compressed payload through the seam: real dimensions and a normalized
    8-bin histogram (not the sha256 stub features)."""
    import subprocess

    clip = tmp_path / "clip.mp4"
    subprocess.run(
        [
            "ffmpeg", "-v", "error", "-f", "lavfi",
            "-i", "testsrc=size=64x48:rate=4:duration=1",
            "-pix_fmt", "yuv420p", str(clip),
        ],
        check=True,
        capture_output=True,
    )
    payload = clip.read_bytes()
    w, h, feat = multimodal.decode_ffmpeg(payload, "video")
    assert (w, h) == (64, 48)
    assert len(feat) == 8 and abs(sum(feat) - 1.0) < 1e-6
    assert (w, h, feat) != multimodal.decode_stub(payload, "video")


@pytest.mark.skipif(
    not multimodal.ffmpeg_available(), reason="ffmpeg not installed in this container"
)
def test_decode_ffmpeg_real_compressed_audio(tmp_path):
    import subprocess

    clip = tmp_path / "tone.mp3"
    subprocess.run(
        [
            "ffmpeg", "-v", "error", "-f", "lavfi",
            "-i", "sine=frequency=440:duration=1",
            str(clip),
        ],
        check=True,
        capture_output=True,
    )
    payload = clip.read_bytes()
    w, h, feat = multimodal.decode_ffmpeg(payload, "audio")
    assert w is None and h is None
    assert len(feat) == 8
    # full-scale-ish sine: RMS ≈ 0.7 of peak; mp3 encoding keeps it well
    # above silence and below clipping in every segment
    assert all(0.05 < f < 1.0 for f in feat)


def test_ffprobe_dims_parse_golden():
    """The subprocess-output PARSE layer runs in any container (VERDICT r6
    #8): golden ffprobe csv=p=0 outputs, including the malformed shapes a
    failed probe emits."""
    p = multimodal._parse_ffprobe_dims
    assert p(b"320,240\n") == (320, 240)
    assert p(b"1920,1080") == (1920, 1080)
    assert p(b"") is None                 # probe failed, empty stdout
    assert p(b"N/A,N/A\n") is None        # stream without dims
    assert p(b"0,240\n") is None          # degenerate width
    assert p(b"320\n") is None            # missing height field
    assert p(b"\xff\xfe\x00garbage") is None  # binary junk


def test_ffmpeg_video_feature_parse_golden():
    """rawvideo-gray → 8-bin histogram layer on synthetic frames: a flat
    mid-gray frame lands in exactly one bin; short reads return None."""
    import numpy as np

    w, h = 16, 8
    frame = np.full(w * h, 130, dtype=np.uint8).tobytes()  # bin 4 (128-159)
    feat = multimodal._video_features_from_gray(frame, w, h)
    assert feat is not None and len(feat) == 8
    assert feat[4] == 1.0 and sum(feat) == 1.0
    # trailing bytes past one frame are ignored (ffmpeg may emit more)
    assert multimodal._video_features_from_gray(frame + b"\x00" * 7, w, h) == feat
    assert multimodal._video_features_from_gray(frame[:-1], w, h) is None


def test_ffmpeg_audio_feature_parse_golden():
    """s16le → 8-segment RMS layer: a known square wave gives RMS = amp/32768
    in every segment; empty and odd-length streams handled."""
    import numpy as np

    amp = 16384
    samples = np.tile(np.array([amp, -amp], dtype=np.int16), 400)
    feat = multimodal._audio_features_from_s16le(samples.tobytes())
    assert feat is not None and len(feat) == 8
    assert all(abs(f - 0.5) < 1e-9 for f in feat)
    assert multimodal._audio_features_from_s16le(b"") is None
    # odd trailing byte (truncated pipe) must not crash the frombuffer
    feat_odd = multimodal._audio_features_from_s16le(samples.tobytes() + b"\x7f")
    assert feat_odd is not None and all(abs(f - 0.5) < 1e-9 for f in feat_odd)


def test_fit_dims_integer_half_up_and_floors():
    # long side pinned to target, short side half-up in exact integer math
    assert multimodal.fit_dims(128, 64, 64) == (64, 32)
    assert multimodal.fit_dims(64, 128, 64) == (32, 64)
    assert multimodal.fit_dims(100, 100, 64) == (64, 64)
    # 64 * 99/100 = 63.36 → 63 ; 64 * 50/99 = 32.32 → 32
    assert multimodal.fit_dims(100, 99, 64) == (64, 63)
    # half-up, not banker's: 64 * 75/96 = 50.0 exactly; 64 * 33/96 = 22.0
    assert multimodal.fit_dims(96, 75, 64) == (64, 50)
    # extreme aspect never collapses below 1px
    assert multimodal.fit_dims(10000, 1, 64) == (64, 1)
    assert multimodal.fit_dims(1, 10000, 64) == (1, 64)


def test_resize_images_only_images_and_digest(media):
    out = multimodal.resize_images(media, target=64)
    assert out.schema == multimodal.RESIZE_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == {0, 3, 6}  # doc_id % 3 == 0 → image
    for i, txt in TEXTS:
        if i not in rows:
            continue
        r = rows[i]
        d = hashlib.sha256(txt.encode()).digest()
        assert (r.width, r.height) == (64 + d[0] % 192, 64 + d[1] % 192)
        assert (r.out_w, r.out_h) == multimodal.fit_dims(r.width, r.height, 64)
        assert max(r.out_w, r.out_h) == 64 and min(r.out_w, r.out_h) >= 1
        want = hashlib.sha256(
            txt.encode() + f"|{r.out_w}x{r.out_h}".encode()
        ).hexdigest()
        assert r.thumb_sha256 == want
