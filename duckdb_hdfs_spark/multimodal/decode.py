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
