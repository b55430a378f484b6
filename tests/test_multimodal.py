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
    encode_bmp,
    encode_ppm,
    fake_decode,
    frame_sample_batches,
    resize_batches,
    with_binary_payload,
)
from duckdb_hdfs_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return with_binary_payload(load_table(spark, sf_dir, "documents")).cache()


def test_decode_image_gates_codec_formats():
    """Compressed formats stay behind NotImplementedError — their
    codecs are not in this container."""
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF")


@pytest.mark.parametrize("codec", [encode_bmp, encode_ppm])
def test_image_roundtrip_exact(codec):
    """encode → decode recovers every pixel, top-down — exercises
    BMP's bottom-up row flip, BGR order, and the 18→20-byte padded
    stride at width 6."""
    def px(x, y):
        return ((x * 7 + y) % 256, (y * 31) % 256, (x + y * 11) % 256)

    w, h, rows = decode_image(codec(6, 4, px))
    assert (w, h) == (6, 4)
    for y in range(4):
        for x in range(6):
            assert rows[y][x] == px(x, y), (x, y)


def test_wav_roundtrip_exact():
    from duckdb_hdfs_spark.multimodal.decode import decode_audio, encode_wav

    wave = [0, 1, -1, 32767, -32768, 100, -100]
    rate, samples = decode_audio(encode_wav(8000, wave))
    assert rate == 8000 and samples == wave
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04...mp3 frames")


def test_bmp_rejects_unsupported_depth():
    import struct

    payload = bytearray(encode_bmp(2, 2, lambda x, y: (0, 0, 0)))
    struct.pack_into("<H", payload, 28, 8)  # claim 8-bit
    with pytest.raises(NotImplementedError):
        decode_image(bytes(payload))


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
