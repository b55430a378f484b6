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


# --------------------------------------------------------------------------
# GIF + LZW (round 6)
# --------------------------------------------------------------------------
def test_lzw_roundtrip_property():
    """encode → decode is identity across code-size/length combos that
    cross every width boundary and (at 30k symbols) the 12-bit table
    reset; plus the pathological repetitive streams that drive the
    KwKwK case."""
    import random

    from duckdb_hdfs_spark.multimodal.decode import _lzw_decode, _lzw_encode

    rng = random.Random(42)
    for mcs in (2, 3, 4, 8):
        for n in (1, 2, 7, 255, 256, 257, 1000, 30000):
            xs = [rng.randrange(1 << mcs) for _ in range(n)]
            assert _lzw_decode(_lzw_encode(xs, mcs), mcs) == xs, (mcs, n)
    for xs in ([0] * 10000, [0, 1] * 8000, [0, 0, 1, 0, 0, 1, 1] * 3000):
        assert _lzw_decode(_lzw_encode(xs, 2), 2) == xs


def test_gif_external_ground_truth_fixture():
    """Decode the canonical 1×1 tracking-pixel GIF — an EXTERNAL
    real-world artifact, so the parser is checked against the actual
    GIF89a format, not merely against our own encoder.  It exercises
    extension chunk-walking (graphic control block) and the
    omitted-EOI tolerance every real decoder has."""
    import base64

    from duckdb_hdfs_spark.multimodal.decode import decode_gif

    px = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    assert decode_gif(px) == (1, 1, [[(0, 0, 0)]])


def test_gif_roundtrip_exact():
    """encode_gif → decode_image recovers every pixel through the
    shared dispatch (image/gif handled beside BMP/PPM), including a
    17-color palette that pads the color table to 32 entries and
    bumps the LZW minimum code size to 5."""
    from duckdb_hdfs_spark.multimodal.decode import decode_image, encode_gif

    pal4 = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220)]
    w, h, rows = decode_image(
        encode_gif(7, 5, pal4, lambda x, y: (x + 2 * y) % 4)
    )
    assert (w, h) == (7, 5)
    for y in range(5):
        for x in range(7):
            assert rows[y][x] == pal4[(x + 2 * y) % 4], (x, y)

    pal17 = [(i * 3, i * 5 % 256, i * 7 % 256) for i in range(17)]
    w, h, rows = decode_image(
        encode_gif(9, 4, pal17, lambda x, y: (x * 4 + y) % 17)
    )
    assert (w, h) == (9, 4)
    for y in range(4):
        for x in range(9):
            assert rows[y][x] == pal17[(x * 4 + y) % 17], (x, y)


def test_gif_rejects_interlaced():
    import struct

    from duckdb_hdfs_spark.multimodal.decode import decode_gif, encode_gif

    payload = bytearray(
        encode_gif(4, 4, [(0, 0, 0), (255, 255, 255)], lambda x, y: (x + y) % 2)
    )
    # image descriptor starts after header(6) + LSD(7) + 2-color GCT(6)
    assert payload[19] == 0x2C
    payload[28] |= 0x40  # set the interlace flag
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(payload))


def test_gif_fuzz_roundtrip_property():
    """Hypothesis fuzz over the whole GIF surface: random dimensions,
    palette sizes (2..64 — exercising LZW min code sizes 2..6 and
    color-table padding), and pixel index streams must round-trip
    encode_gif → decode_gif pixel-exactly."""
    from hypothesis import given, settings, strategies as st

    from duckdb_hdfs_spark.multimodal.decode import decode_gif, encode_gif

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 9),
        n_colors=st.integers(2, 64),
        seed=st.integers(0, 2**31),
    )
    def check(w, h, n_colors, seed):
        import random

        rng = random.Random(seed)
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(n_colors)
        ]
        pix = [[rng.randrange(n_colors) for _ in range(w)] for _ in range(h)]
        gw, gh, rows = decode_gif(
            encode_gif(w, h, pal, lambda x, y: pix[y][x])
        )
        assert (gw, gh) == (w, h)
        assert rows == [[pal[pix[y][x]] for x in range(w)] for y in range(h)]

    check()


def test_gif_truncation_fails_loudly():
    """A GIF whose pixel data is cut short must raise, not return a
    partial image — the decoder's completeness check backs the
    omitted-EOI tolerance."""
    from duckdb_hdfs_spark.multimodal.decode import decode_gif, encode_gif

    payload = bytearray(
        encode_gif(
            8, 8, [(0, 0, 0), (255, 255, 255)], lambda x, y: (x ^ y) & 1
        )
    )
    # chop the tail of the single data sub-block (keep header intact):
    # shrink the declared sub-block length and drop the bytes
    # image descriptor at 19 (hdr 6 + LSD 7 + 2-color GCT 6), mcs at 29
    assert payload[19] == 0x2C and payload[30] > 4
    cut = payload[30] // 2
    payload[30] = cut
    del payload[31 + cut : -2]  # keep terminator + trailer
    payload.insert(31 + cut, 0)  # sub-block terminator
    with pytest.raises(ValueError):
        decode_gif(bytes(payload))


def test_gif_malformed_payloads_raise_value_error():
    """Byte-level truncation at EVERY prefix length must surface as
    the decoder's clean ValueError/NotImplementedError contract —
    never a raw IndexError or struct.error (ADVICE r6: the sub-block
    and extension walks indexed without bounds checks)."""
    from duckdb_hdfs_spark.multimodal.decode import decode_gif, encode_gif

    full = encode_gif(
        4, 3, [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)],
        lambda x, y: (x + y) % 4,
    )
    # an extension block exercises the extension walk too
    with_ext = full[:13 + 12] + b"\x21\xfe\x03abc\x00" + full[13 + 12:]
    for payload in (full, with_ext):
        assert decode_gif(payload)[0] == 4
        for cut in range(len(payload) - 1):
            # every strict prefix is missing at least the trailer, so
            # a silent success is missing validation (ADVICE r7: the
            # bare try/except only caught WRONG exception types, not
            # absent ones); any other exception type (IndexError,
            # struct.error) also fails the raises check
            with pytest.raises((ValueError, NotImplementedError)):
                decode_gif(payload[:cut])


def test_gif_zero_area_encode_rejected():
    """encode_gif must reject width/height 0 with ValueError instead
    of crashing _lzw_encode on an empty index list (ADVICE r6)."""
    from duckdb_hdfs_spark.multimodal.decode import encode_gif

    for w, h in ((0, 5), (5, 0), (0, 0)):
        with pytest.raises(ValueError):
            encode_gif(w, h, [(0, 0, 0), (1, 1, 1)], lambda x, y: 0)


def test_gif_out_of_palette_index_rejected():
    """A pixel index past the palette must raise ValueError, not
    IndexError at the palette lookup."""
    from duckdb_hdfs_spark.multimodal.decode import decode_gif, encode_gif

    # 4-color image whose declared global color table is then shrunk
    # to 2 entries — the intact LZW stream still emits indices 2 and 3
    payload = bytearray(
        encode_gif(
            4, 3, [(0, 0, 0), (1, 1, 1), (2, 2, 2), (3, 3, 3)],
            lambda x, y: (x + y) % 4,
        )
    )
    # logical screen descriptor packed byte at offset 10: 0x80 | (bits-1)
    assert payload[10] & 0x80
    payload[10] = 0x80 | 0  # declare a 2-entry GCT (was 4)
    # drop 2 palette entries (6 bytes) so offsets still line up
    del payload[13 + 6 : 13 + 12]
    with pytest.raises(ValueError):
        decode_gif(bytes(payload))


def test_gif_invalid_mcs_rejected():
    """A corrupted LZW minimum-code-size byte must raise ValueError,
    not eagerly build a 2^mcs table (hang/OOM; round-7 review)."""
    from duckdb_hdfs_spark.multimodal.decode import decode_gif, encode_gif

    payload = bytearray(
        encode_gif(3, 3, [(0, 0, 0), (1, 1, 1)], lambda x, y: (x + y) % 2)
    )
    # mcs byte sits right after the image descriptor: hdr 6 + LSD 7 +
    # 2-entry GCT 6 + descriptor 10
    assert payload[19] == 0x2C
    mcs_at = 29
    for bad in (0, 1, 12, 0x80, 0xFF):
        p = bytearray(payload)
        p[mcs_at] = bad
        with pytest.raises(ValueError):
            decode_gif(bytes(p))


def test_gif_oversized_palette_rejected():
    """encode_gif must reject >256-color palettes instead of masking
    the size field into a corrupt header (round-7 review)."""
    from duckdb_hdfs_spark.multimodal.decode import encode_gif

    palette = [(i % 256, 0, 0) for i in range(257)]
    with pytest.raises(ValueError):
        encode_gif(4, 4, palette, lambda x, y: 0)
