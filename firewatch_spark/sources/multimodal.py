"""Multimodal (image/audio/video) column plumbing — opaque binary
payloads with typed metadata, processed via mapInPandas.

Design for 100 TB of media:
* payloads are ``binary`` columns that NEVER enter a shuffle — all
  media ops are per-row mapInPandas stages, so the bytes stay in the
  scan→transform pipeline on the executor that read them;
* metadata (kind/width/height/duration) is a separate struct column so
  downstream relational logic prunes the payload away (column pruning
  drops the heavy bytes from any branch that doesn't need pixels);
* Arrow batch size bounds executor memory: payload_bytes ×
  maxRecordsPerBatch is the working-set per batch.

The actual codecs (cv2/PIL/ffmpeg) are NOT in this container, so the
decode kernels are deterministic fakes behind the same signatures the
real ones would have (clearly marked); the Spark-side plumbing —
schemas, batching, passthrough, partitioning — is real and tested.
Reference behaviors mirrored: JPEG decode (P2, stream.py:136-137),
resize (S3, producer/video_producer.py:108-109), frame sampling
(S2, :106), heatmap overlay shape contract (P10, overlay.py:10-44).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoder if ever present; the container has no cv2
    import cv2  # type: ignore  # noqa: F401

    HAVE_CV2 = True
except ImportError:
    HAVE_CV2 = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
    ]
)


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """DETERMINISTIC FAKE for cv2.imdecode (P2): derives stable pseudo
    dimensions from the payload hash.  Replace with cv2 when present."""
    h = hashlib.sha256(payload).digest()
    return 320 + (h[0] % 4) * 160, 240 + (h[1] % 4) * 120


def decode_media(df: DataFrame) -> DataFrame:
    """P2-analog decode stage: binary payload → typed features, one
    Arrow batch at a time; payload dropped on output (pruned early)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a real decoder would initialize codec state here, once per
        # worker, then decode each Arrow batch vectorized
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                # Arrow->pandas surfaces null ints as NaN floats
                payload = None if row.payload is None else bytes(row.payload)
                if payload is None:
                    out.append((row.media_id, row.kind, None, None, None, None))
                    continue
                if HAVE_CV2 and row.kind == "image":
                    raise NotImplementedError(
                        "real cv2 decode path not exercised in this container"
                    )
                w, h = _fake_decode_dims(payload)
                out.append(
                    (
                        row.media_id,
                        row.kind,
                        w if pd.isna(row.meta_width) else int(row.meta_width),
                        h if pd.isna(row.meta_height) else int(row.meta_height),
                        len(payload),
                        hashlib.sha256(payload).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "width", "height", "n_bytes", "content_sha",
                ],
            )

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


def resize_plan(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """S3-analog resize stage: passthrough plumbing that records the
    target dims (a real kernel replaces the body; shapes/batching are
    what this proves).  Stays per-row: no shuffle."""

    out_schema = StructType(
        list(MEDIA_SCHEMA.fields)
        + [StructField("target_width", IntegerType()), StructField("target_height", IntegerType())]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            # real path: cv2.resize(img, (target_w, target_h)) per row
            pdf["target_width"] = target_w
            pdf["target_height"] = target_h
            yield pdf

    return df.mapInPandas(_resize, schema=out_schema)


def jpeg_encode(df: DataFrame, quality: int = 85) -> DataFrame:
    """S4-analog JPEG encode (reference producer/video_producer.py:112-113,
    `cv2.imencode('.jpg', frame, [IMWRITE_JPEG_QUALITY, 85])`).

    DETERMINISTIC FAKE kernel: the "encoded" payload is a sha256-seeded
    byte string whose length scales with `width*height/quality` — stable
    and size-realistic, so downstream size-based logic (Kafka batching,
    Arrow batch memory math) is exercised for real.  A real deployment
    swaps the body for cv2.imencode; the mapInPandas batching, the
    binary output column, and the no-shuffle placement are the point."""

    out_schema = StructType(
        list(MEDIA_SCHEMA.fields) + [StructField("jpeg", BinaryType())]
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            jpegs = []
            for row in pdf.itertuples(index=False):
                if row.payload is None:
                    jpegs.append(None)
                    continue
                if HAVE_CV2:
                    raise NotImplementedError(
                        "real cv2.imencode path not exercised in this container"
                    )
                w = 640 if pd.isna(row.meta_width) else int(row.meta_width)
                h = 480 if pd.isna(row.meta_height) else int(row.meta_height)
                size = max(64, w * h // max(quality, 1))
                seed = hashlib.sha256(bytes(row.payload)).digest()
                jpegs.append((seed * (size // len(seed) + 1))[:size])
            pdf["jpeg"] = jpegs
            yield pdf

    return df.mapInPandas(_encode, schema=out_schema)


def sample_every_nth(df: DataFrame, seq_col: str, n: int) -> DataFrame:
    """S2 frame sampling: keep rows where seq % n == 0
    (producer/video_producer.py:106) — a pure filter, pushed to scan."""
    from pyspark.sql import functions as F

    return df.filter(F.col(seq_col) % n == 0)


AUDIO_CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_idx", LongType()),
        StructField("start_sample", LongType()),
        StructField("n_samples", LongType()),
        StructField("byte_off", LongType()),
        StructField("byte_len", LongType()),
        StructField("sum_sq", LongType()),
        StructField("rms", DoubleType()),
    ]
)


def audio_chunks(
    df: DataFrame, chunk_samples: int = 64, sample_width: int = 2
) -> DataFrame:
    """Audio frame-sampling/feature stage — the audio member of the
    multimodal family (image decode and video cadence are covered
    elsewhere): an opaque PCM byte payload + metadata explodes into
    fixed-length chunk rows with exact sample/byte offsets and a
    per-chunk energy feature.

    The "decode" here is REAL for raw little-endian int16 PCM (pairs of
    payload bytes → signed samples; ``sum_sq`` is the exact int64
    energy, ``rms = sqrt(sum_sq / n)`` two correctly-rounded IEEE ops —
    bit-portable).  A compressed codec (mp3/flac via ffmpeg/soundfile,
    absent in this container) would replace only the frombuffer line;
    the chunk arithmetic, Arrow batching, payload pruning and schema
    are the production plumbing and are what this stage proves.

    Input columns: (media_id long, payload binary).  Output one row per
    chunk; a payload shorter than one sample yields no rows.  Payload
    never enters a shuffle — chunk rows carry offsets, not bytes
    (the same pruning discipline as decode_media)."""
    import numpy as np

    def _chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = None if row.payload is None else bytes(row.payload)
                if not payload:
                    continue
                n_total = len(payload) // sample_width
                if n_total == 0:
                    continue
                samples = np.frombuffer(
                    payload[: n_total * sample_width], dtype="<i2"
                ).astype(np.int64)
                for ci in range(0, (n_total + chunk_samples - 1) // chunk_samples):
                    start = ci * chunk_samples
                    n = min(chunk_samples, n_total - start)
                    seg = samples[start : start + n]
                    ssq = int((seg * seg).sum())
                    out.append(
                        (
                            row.media_id,
                            ci,
                            start,
                            n,
                            start * sample_width,
                            n * sample_width,
                            ssq,
                            float(np.sqrt(ssq / n)),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "chunk_idx", "start_sample", "n_samples",
                    "byte_off", "byte_len", "sum_sq", "rms",
                ],
            )

    return df.mapInPandas(_chunks, schema=AUDIO_CHUNK_SCHEMA)
