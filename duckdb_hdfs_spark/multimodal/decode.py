"""Multimodal column plumbing (SURVEY.md §2.8).

Real pipelines carry image/audio/video as opaque ``binary`` columns
with typed metadata, decoding only inside Arrow-batched Python
workers (``mapInPandas``) so bytes never round-trip through the JVM
row format.  The container has no codec libraries, so the decode
kernel is stubbed: ``decode_image`` raises NotImplementedError and
``fake_decode`` produces a deterministic feature vector from the
bytes — the Spark-side plumbing (schema, batching, partitioning) is
real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema after decode: id + metadata + fixed-size feature vector
DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

N_FEATURES = 8


def decode_image(payload: bytes) -> list[float]:
    """Real decode path — requires an image codec (PIL/cv2), which
    this container does not ship."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; use fake_decode"
    )


def fake_decode(payload: bytes, n: int = N_FEATURES) -> list[float]:
    """Deterministic stand-in: md5-seeded pseudo-features in [0, 1)."""
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(n)]


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Simulate a media table: utf-8 bytes of text as the payload plus
    typed metadata — the exact column layout a real image/audio table
    would have (payload binary, media_type, byte_len)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.length(payload).alias("byte_len"),
    )


def decode_batches(media: DataFrame) -> DataFrame:
    """Arrow-batched decode via ``mapInPandas``: each batch decodes
    payloads in vectorized pandas, emitting metadata + features.
    Scale: per-partition streaming (no collect); batch size bounded
    by spark.sql.execution.arrow.maxRecordsPerBatch; shuffle-free."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": payloads.map(len),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "features": payloads.map(lambda b: fake_decode(bytes(b))),
                }
            )

    return media.mapInPandas(decode, DECODED_SCHEMA)


#: schema after resize: same row count, payload replaced + dims
RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("resized", BinaryType()),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: tile the md5
    digest to exactly width*height bytes (a real kernel would return
    the re-encoded image; PIL/cv2 are unavailable here)."""
    digest = hashlib.md5(payload).digest()
    n = width * height
    return (digest * (n // len(digest) + 1))[:n]


def resize_batches(media: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """1:1 transform batch shape: each payload re-encoded at
    (width, height).  Shuffle-free; output bytes bounded by w*h so
    downstream stages size partitions independently of the input
    image sizes."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "resized": pdf["payload"].map(
                        lambda b: fake_resize(bytes(b), width, height)
                    ),
                }
            )

    return media.mapInPandas(resize, RESIZED_SCHEMA)


#: schema after frame sampling: one-to-many (frame rows per item)
FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def frame_sample_batches(media: DataFrame, max_frames: int = 4) -> DataFrame:
    """1:N batch shape (video frame sampling): each payload yields
    ``min(ceil(byte_len/256), max_frames)`` frame rows.  A real
    kernel would seek+decode keyframes; the fake derives each frame
    digest from (payload, frame_idx) via a text suffix — null-byte
    free, so an engine whose md5 only takes VARCHAR (DuckDB) can
    re-derive it for the oracle check.  Output cardinality is bounded
    by max_frames x items — the Spark-side contract a real sampler
    must also keep."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = min(max(len(raw) + 255, 256) // 256, max_frames)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(raw + f"-frame-{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return media.mapInPandas(sample, FRAMES_SCHEMA)
