"""Multimodal-column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` pipelines.

The Spark-side architecture is fully real — schemas, partition-preserving
batch UDFs, metadata extraction, frame-sampling fan-out. Decoding goes
through a single-function seam with three implementations: the default
deterministic ``decode_stub`` (oracle-replayable, works everywhere), a real
Pillow image decoder (``decode_pil``, gated on PIL being importable), and a
real WAV audio decoder (``decode_wav``, stdlib ``wave`` + numpy — no
optional dependency). Video keyframe decode remains stubbed (ffmpeg not in
this container); everything around the seam (batch shapes, schema
contracts, memory behavior) is what matters at scale and is tested.

Scale notes: payloads stay in executor memory only for the lifetime of one
Arrow batch; ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
bytes; feature extraction emits fixed-width columns so downstream shuffles
never move the raw bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table from the documents corpus: payload =
    UTF-8 bytes of the text (stands in for encoded media). Exercises the
    binary-column path end to end with reproducible content."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_stub(payload: bytes, kind: str):
    """STUB for the real media decoder (PIL / torchaudio / ffmpeg — not
    installed here). Returns deterministic fake (width, height, feature[8])
    derived from a sha256 of the payload so tests are reproducible. Replace
    this single function to integrate real decoders."""
    digest = hashlib.sha256(payload).digest()
    if kind == "image":
        w = 64 + digest[0] % 192  # fake 64..255 px
        h = 64 + digest[1] % 192
    else:
        w, h = None, None
    feat = [v / 255.0 for v in digest[:8]]
    return w, h, feat


def pil_available() -> bool:
    """True when Pillow is importable (gates the real image decoder the same
    way protobuf gates transformWithStateInPandas — absent in this container,
    picked up automatically where it exists)."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def decode_pil(payload: bytes, kind: str):
    """Real image decoder backed by Pillow, drop-in for ``decode_stub`` (same
    (width, height, feature[8]) contract). Images decode to true dimensions
    plus an 8-bin normalized grayscale histogram as the feature vector;
    non-image kinds (and undecodable payloads) fall back to the deterministic
    stub so a mixed media table never fails mid-batch. Import is lazy and
    per-executor — Pillow must be on the worker Python, not the driver."""
    if kind != "image":
        return decode_stub(payload, kind)
    import io

    try:
        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            w, h = im.size
            gray = im.convert("L")
            hist = gray.histogram()  # 256 bins
        total = float(sum(hist)) or 1.0
        feat = [sum(hist[i * 32 : (i + 1) * 32]) / total for i in range(8)]
        return w, h, feat
    except Exception:
        return decode_stub(payload, kind)


def decode_wav(payload: bytes, kind: str):
    """Real AUDIO decoder for WAV payloads — stdlib ``wave`` + numpy, so it
    needs no optional dependency (unlike the Pillow image path). Drop-in for
    ``decode_stub`` with the same (width, height, feature[8]) contract:

    - width/height stay NULL (image-only fields);
    - feature[8] = per-segment RMS loudness: samples are split into 8 equal
      time segments and each segment's root-mean-square amplitude is
      normalized to [0, 1] by the sample format's full-scale value — the
      classic cheap audio fingerprint (silence ≈ 0, clipping ≈ 0.7 for a
      full-scale sine).

    Non-audio kinds, non-WAV payloads, and exotic sample widths (24-bit)
    fall back to the deterministic stub so a mixed media table never fails
    mid-batch — the same policy as ``decode_pil``."""
    if kind != "audio":
        return decode_stub(payload, kind)
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            sampwidth = wf.getsampwidth()
            n_frames = wf.getnframes()
            n_channels = wf.getnchannels()
            raw = wf.readframes(n_frames)
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sampwidth)
        if dtype is None or n_frames == 0:
            return decode_stub(payload, kind)
        samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        if sampwidth == 1:  # 8-bit WAV is unsigned, midpoint 128
            samples -= 128.0
        full_scale = float(2 ** (8 * sampwidth - 1))
        # mix channels down before segmenting (loudness, not stereo field)
        if n_channels > 1:
            samples = samples[: (len(samples) // n_channels) * n_channels]
            samples = samples.reshape(-1, n_channels).mean(axis=1)
        seg = np.array_split(samples, 8)
        feat = [
            float(np.sqrt(np.mean(s * s)) / full_scale) if len(s) else 0.0 for s in seg
        ]
        return None, None, feat
    except Exception:
        return decode_stub(payload, kind)


def extract_features(media: DataFrame, batch_hint: int = 256, decoder=decode_stub) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the pattern for any decode/resize/embed stage. The UDF
    sees pandas batches (zero-copy Arrow transfer for the binary column) and
    emits fixed-width features; raw payloads are dropped before any shuffle.

    ``decoder`` is the single-function seam: the default ``decode_stub``
    keeps output deterministic (the oracle replays it); pass ``decode_pil``
    on clusters with Pillow for real image decoding."""
    from ..shipping import ensure_worker_imports

    ensure_worker_imports(media.sparkSession)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload, n_bytes in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["n_bytes"]
            ):
                w, h, feat = decoder(bytes(payload), kind)
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "n_bytes": n_bytes,
                        "sha256": hashlib.sha256(bytes(payload)).hexdigest(),
                        "width": w,
                        "height": h,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """Frame-sampling fan-out for video payloads: emit up to ``max_frames``
    (media_id, frame_idx, frame_offset) rows per video — the Spark-side shape
    of keyframe extraction (offsets stand in for decoded frames; the real
    decoder plugs into ``decode_stub``). Pure column ops, no UDF."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.least(
                F.floor(F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(max_frames - 1)
            ),
        ),
        lambda i: F.struct(i.alias("frame_idx"), (i * every_n_bytes).cast("long").alias("frame_offset")),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("fr"))
        .select("media_id", F.col("fr.frame_idx").alias("frame_idx"), F.col("fr.frame_offset").alias("frame_offset"))
    )
