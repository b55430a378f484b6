"""Multimodal plumbing tests (SURVEY.md §2.8): the Arrow-batched
mapInPandas pipelines over binary payload columns — decode (1:1 +
features), resize (1:1, fixed output size), frame sampling (1:N) —
with the deterministic fake kernels, plus the NotImplementedError
guard on the real codec path."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from duckdb_hdfs_spark.multimodal.decode import (
    N_FEATURES,
    decode_batches,
    decode_image,
    fake_decode,
    frame_sample_batches,
    resize_batches,
    with_binary_payload,
)
from duckdb_hdfs_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return with_binary_payload(load_table(spark, sf_dir, "documents")).cache()


def test_decode_image_is_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_decode_schema_and_determinism(spark, media):
    decoded = decode_batches(media)
    assert [f.name for f in decoded.schema.fields] == [
        "doc_id", "media_type", "byte_len", "content_md5", "features",
    ]
    rows = {r.doc_id: r for r in decoded.limit(50).collect()}
    src = {r.doc_id: bytes(r.payload) for r in media.limit(50).collect()}
    for doc_id, r in rows.items():
        payload = src[doc_id]
        assert r.content_md5 == hashlib.md5(payload).hexdigest()
        assert r.byte_len == len(payload)
        assert len(r.features) == N_FEATURES
        assert r.features == pytest.approx(fake_decode(payload))


def test_decode_count_preserved(spark, media):
    assert decode_batches(media).count() == media.count()


def test_resize_fixes_output_size(spark, media):
    resized = resize_batches(media, width=8, height=4)
    sizes = resized.select(F.length("resized").alias("n")).distinct().collect()
    assert [r.n for r in sizes] == [32]
    assert resized.count() == media.count()


def test_frame_sample_bounds_and_determinism(spark, media):
    frames = frame_sample_batches(media, max_frames=4)
    per_doc = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")
    )
    bad = per_doc.filter((F.col("n") < 1) | (F.col("n") > 4) | (F.col("mx") != F.col("n") - 1))
    assert bad.count() == 0
    one = frames.filter(F.col("frame_idx") == 0).limit(5).collect()
    src = {r.doc_id: bytes(r.payload) for r in media.collect()}
    for r in one:
        want = hashlib.md5(src[r.doc_id] + b"-frame-0").hexdigest()
        assert r.frame_md5 == want
