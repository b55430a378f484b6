"""Multimodal registry entries (SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_hdfs_spark.multimodal.decode import (
    channel_stats_batches,
    decode_batches,
    frame_sample_batches,
    real_decode_batches,
    resize_batches,
    synth_image_batches,
    with_binary_payload,
)
from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _t


# --------------------------------------------------------------------------
@query(
    "mm_binary_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS byte_len,
       md5(text) AS content_md5,
       substr(hex(encode(text)), 1, 8) AS magic_prefix
FROM documents
""",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata, JVM-side only (no
    Python): byte length, content digest, magic-prefix hex."""
    docs = _t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("byte_len"),
        F.md5(payload).alias("content_md5"),
        F.substring(F.hex(payload), 1, 8).alias("magic_prefix"),
    )


# --------------------------------------------------------------------------
@query(
    "mm_decode_features",
    # the fake decoder is md5-deterministic (multimodal/decode.py:
    # fake_decode = digest bytes / 255.0, stored as float32), so the
    # oracle re-derives feature 0 from the hex digest and matches the
    # float32 rounding with a CAST AS REAL before averaging.
    oracle="""
SELECT media_type, count(*) AS n_items,
       round(avg(byte_len), 2) AS avg_bytes,
       round(avg(CAST(CAST(('0x' || substr(content_md5, 1, 2)) AS INTEGER)
                      / 255.0 AS REAL)), 6) AS mean_f0
FROM (
    SELECT 'text/plain' AS media_type,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS content_md5
    FROM documents
)
GROUP BY media_type
""",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode pipeline over the binary payloads (fake
    decoder — see multimodal/decode.py), aggregated to per-media-type
    feature means so the output is small and schema-stable."""
    media = with_binary_payload(_t(spark, sf_dir, "documents"))
    decoded = decode_batches(media)
    return decoded.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg("byte_len"), 2).alias("avg_bytes"),
        F.round(F.avg(F.element_at("features", 1)), 6).alias("mean_f0"),
    )


# --------------------------------------------------------------------------
@query(
    "mm_decode_real",
    # the synthesized images are analytic: a 6×4 gradient with
    # R = r0+x, G = g0+y, B = b0 where (r0, g0, b0) come from
    # md5(doc_id) bytes (r0/g0 mod 200, so no wrap).  mean over x of
    # r0+x = r0 + 2.5; the TOP-left green is g0 (a parser that skips
    # BMP's bottom-up flip returns g0+3 and fails the hash); B is
    # constant.  The oracle needs no image code — just the md5 bytes.
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/bmp'
            ELSE 'image/x-portable-pixmap' END AS media_type,
       CAST(6 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
       CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 200)
            + 2.5 AS DOUBLE) AS mean_r,
       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2))::BIGINT % 200
           AS top_left_g,
       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 2))::BIGINT AS mean_b
FROM documents
""",
)
def mm_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end (round 5 — the executable path
    beside the honest codec stubs): synthesize an actual 24-bit BMP
    (even doc_id — 20-byte padded strides, bottom-up rows) or binary
    PPM (odd doc_id) per document, then parse the BYTES back with the
    pure-Python decoders (multimodal/decode.py:decode_image) and emit
    a per-item feature panel.  Every value crosses the real encode →
    real parse boundary; the oracle re-derives the expected features
    from the md5-seeded gradient parameters analytically.

    Scale shape: two chained Arrow-batched mapInPandas stages (the
    decode boundary a real pipeline has), zero shuffles — per-row
    map work end to end."""
    media = synth_image_batches(_t(spark, sf_dir, "documents"))
    return real_decode_batches(media)


# --------------------------------------------------------------------------
@query(
    "mm_resize",
    # fake_resize tiles the md5 digest to exactly width*height bytes,
    # so the output length is the constant 16*16 for every row.
    oracle="""
SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
       CASE WHEN text IS NULL THEN NULL
            ELSE CAST(256 AS INTEGER) END AS resized_bytes
FROM documents
""",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas 1:1 resize plumbing (fake kernel): output payload
    size fixed at width*height regardless of input size."""
    media = with_binary_payload(_t(spark, sf_dir, "documents"))
    resized = resize_batches(media, width=16, height=16)
    return resized.select(
        "doc_id", "width", "height", F.length("resized").alias("resized_bytes")
    )


# --------------------------------------------------------------------------
@query(
    "mm_frame_sample",
    # the fake sampler hashes payload || '-frame-{i}'; frames per
    # item = clamp(ceil(bytes/256), 1, 4) — both re-derivable.
    oracle="""
WITH media AS (
    SELECT doc_id, text,
           greatest((octet_length(encode(text)) + 255) // 256, 1) AS n_raw
    FROM documents WHERE text IS NOT NULL
),
frames AS (
    SELECT m.doc_id, gs.i,
           md5(m.text || '-frame-' || CAST(gs.i AS VARCHAR)) AS frame_md5
    FROM media m
    JOIN (SELECT unnest(generate_series(0, 3)) AS i) gs
      ON gs.i < least(m.n_raw, 4)
)
SELECT doc_id, count(*) AS n_frames, min(frame_md5) AS first_frame_md5
FROM frames GROUP BY doc_id
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas 1:N frame-sampling plumbing (fake kernel):
    per-item frame counts, bounded by max_frames."""
    media = with_binary_payload(_t(spark, sf_dir, "documents"))
    frames = frame_sample_batches(media, max_frames=4)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("frame_md5").alias("first_frame_md5"),
    )


# --------------------------------------------------------------------------
@query(
    "mm_decode_wav",
    # the synthesized waves are analytic: a ±A square wave with
    # A = 100 + 100·(first md5 byte) and n = 64 + (second byte mod
    # 64) samples at 8 kHz — so peak == first_sample == mean|s| == A
    # and every field derives from md5(doc_id) in plain SQL.
    oracle="""
SELECT doc_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       64 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2))::BIGINT % 64
           AS n_samples,
       100 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT * 100
           AS peak_amp,
       100 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT * 100
           AS first_sample,
       CAST(100 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT
            * 100 AS DOUBLE) AS mean_abs
FROM documents
""",
)
def mm_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (round 5): synthesize an actual
    RIFF/WAVE file per document (mono 16-bit PCM square wave, with a
    junk LIST chunk so the parser must chunk-walk), then parse the
    BYTES back (multimodal/decode.py:decode_audio) and emit a
    per-item panel — rate, length, peak, first sample (a
    little-endian bug flips its sign), mean |amplitude|.  The audio
    sibling of mm_decode_real; compressed codecs stay behind
    NotImplementedError.

    Scale shape: two chained Arrow-batched mapInPandas stages, zero
    shuffles."""
    from duckdb_hdfs_spark.multimodal.decode import (
        synth_wav_batches,
        wav_decode_batches,
    )

    media = synth_wav_batches(_t(spark, sf_dir, "documents"))
    return wav_decode_batches(media)


# --------------------------------------------------------------------------
@query(
    "mm_audio_frame_energy",
    # analytic oracle: the synthesized wave is a ±A square wave
    # alternating EVERY sample, so each full 16-sample frame holds
    # 8×(+A) and 8×(−A): peak = A, RMS = A exactly (sqrt of the exact
    # A² mean), signed mean = 0.  Frames = n_samples // 16.
    oracle="""
WITH params AS (
    SELECT doc_id,
           100 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT
               * 100 AS amp,
           64 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2))::BIGINT
               % 64 AS n
    FROM documents
)
SELECT doc_id, CAST(gs.i AS BIGINT) AS frame_idx,
       CAST(16 AS BIGINT) AS frame_len,
       amp AS peak,
       CAST(amp AS DOUBLE) AS rms,
       CAST(0 AS DOUBLE) AS mean_s
FROM params
CROSS JOIN LATERAL (SELECT unnest(generate_series(0, n // 16 - 1)) AS i) gs
""",
)
def mm_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed audio feature extraction (round 5): decode the REAL
    RIFF/WAVE payloads, window the sample stream into 16-sample
    frames, and emit per-frame peak / RMS / signed mean — the
    standard first stage of every audio featurizer (VAD, loudness
    normalization, spectrogram prep all start from framed energy).
    The oracle re-derives every frame analytically from the md5-seeded
    wave parameters, so the full decode→frame→feature path is
    hash-checked, not rows-only.

    Scale shape: three chained Arrow-batched mapInPandas stages
    (synth → decode+frame), zero shuffles, bounded 1:N fan-out
    (n_samples/16 frames per item)."""
    from duckdb_hdfs_spark.multimodal.decode import (
        synth_wav_batches,
        wav_frame_energy_batches,
    )

    media = synth_wav_batches(_t(spark, sf_dir, "documents"))
    return wav_frame_energy_batches(media)


# --------------------------------------------------------------------------
@query(
    "mm_image_patch_grid",
    # analytic oracle: gradient R = r0+x, G = g0+y, B = b0 over the
    # 6×4 image → a 2×2 patch at (px, py) has mean R = r0 + 2px + 0.5,
    # mean G = g0 + 2py + 0.5, mean B = b0 (exact halves in double).
    oracle="""
WITH params AS (
    SELECT doc_id,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 200
               AS r0,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2))::BIGINT % 200
               AS g0,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 2))::BIGINT AS b0
    FROM documents
)
SELECT doc_id, CAST(gx.i AS BIGINT) AS patch_x, CAST(gy.i AS BIGINT) AS patch_y,
       CAST(r0 + 2 * gx.i + 0.5 AS DOUBLE) AS mean_r,
       CAST(g0 + 2 * gy.i + 0.5 AS DOUBLE) AS mean_g,
       CAST(b0 AS DOUBLE) AS mean_b
FROM params
CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS i) gx
CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS i) gy
""",
)
def mm_image_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch-grid tokenization of REAL decoded images (round 5): the
    ViT preprocessing step — decode each BMP/PPM payload, split the
    pixel grid into 2×2 patches, emit per-patch channel means.  The
    oracle re-derives every patch mean analytically from the
    md5-seeded gradient (a parser that forgets BMP's bottom-up row
    order or the row stride padding produces wrong means and fails
    the hash).

    Scale shape: two chained Arrow-batched mapInPandas stages
    (synth → decode+patch), zero shuffles, bounded 6-patch fan-out
    per item."""
    from duckdb_hdfs_spark.multimodal.decode import (
        image_patch_batches,
        synth_image_batches,
    )

    media = synth_image_batches(_t(spark, sf_dir, "documents"))
    return image_patch_batches(media)


# --------------------------------------------------------------------------
@query(
    "mm_decode_gif",
    # analytic oracle: the synthesized 7×5 GIF uses palette color
    # k = (r0+k, g0+2k, b0+3k) and index(x, y) = (x+y+s) % 4 with
    # (r0, g0, b0, s) from md5(doc_id), so every feature re-derives
    # from a 35-cell generate_series grid: top-left red = r0+s, total
    # green = Σ(g0 + 2·idx), and the position-weighted red checksum
    # Σ((r0+idx)·(x+1)·(y+2)) — all integer-exact.
    oracle="""
WITH params AS (
    SELECT doc_id,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 200
               AS r0,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2))::BIGINT % 200
               AS g0,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 7, 2))::BIGINT % 4
               AS s
    FROM documents
),
grid AS (
    SELECT gx.x, gy.y
    FROM (SELECT unnest(generate_series(0, 6)) AS x) gx
    CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS y) gy
)
SELECT p.doc_id,
       CAST(7 AS BIGINT) AS width, CAST(5 AS BIGINT) AS height,
       CAST(min(p.r0 + p.s) AS BIGINT) AS top_left_r,
       CAST(sum(p.g0 + 2 * ((g.x + g.y + p.s) % 4)) AS BIGINT) AS sum_g,
       CAST(sum((p.r0 + (g.x + g.y + p.s) % 4) * (g.x + 1) * (g.y + 2))
            AS BIGINT) AS wsum_r
FROM params p CROSS JOIN grid g
GROUP BY p.doc_id
""",
)
def mm_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode end-to-end (round 6): synthesize an actual
    GIF89a file per document — 4-color global palette, 7×5 pixel
    grid, genuinely LZW-compressed image data — then parse the BYTES
    back through the shared decode_image dispatch (pure-Python GIF
    parser + full variable-width LZW decompressor,
    multimodal/decode.py:decode_gif) and emit an integer-exact
    feature panel.  The third member of the real-decoder family
    (BMP/PPM → mm_decode_real, WAV → mm_decode_wav) and the only one
    whose on-disk bytes are COMPRESSED — the LZW round-trip is
    hash-checked against the analytic oracle, so a code-width,
    bit-packing, or palette bug fails loudly.  The encoder/decoder
    pair is additionally pinned by an external ground-truth fixture
    (the canonical 1×1 tracking-pixel GIF) in tests.

    Scale shape: two chained Arrow-batched mapInPandas stages, zero
    shuffles — per-row map work end to end."""
    from duckdb_hdfs_spark.multimodal.decode import (
        gif_decode_batches,
        synth_gif_batches,
    )

    media = synth_gif_batches(_t(spark, sf_dir, "documents"))
    return gif_decode_batches(media)


# --------------------------------------------------------------------------
@query(
    "mm_media_router",
    # analytic oracle over the md5-seeded synth params: images carry
    # top-left green = g0 (even doc_id → BMP, odd → PPM), audio
    # carries peak = amp; every document contributes one image AND
    # one wav, so the per-type feature sums derive in plain SQL.
    oracle="""
WITH params AS (
    SELECT doc_id,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2))::BIGINT % 200
               AS g0,
           100 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT
               * 100 AS amp
    FROM documents
)
SELECT media_type, count(*) AS n_items,
       CAST(sum(feature) AS BIGINT) AS feature_sum
FROM (
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/bmp'
                ELSE 'image/x-portable-pixmap' END AS media_type,
           g0 AS feature
    FROM params
    UNION ALL
    SELECT 'audio/wav' AS media_type, amp AS feature FROM params
)
GROUP BY media_type
""",
)
def mm_media_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIXED-MODALITY decode routing (round 5): image (BMP/PPM) and
    audio (WAV) payloads flow through ONE dispatch stage that picks
    the parser per row by media_type — the heterogeneous-lake ingest
    shape (one job per arrival batch, not one job per format), with
    unknown types failing loudly.  Per-type counts and feature sums
    are re-derived analytically by the oracle, so routing AND both
    decoders are hash-checked in one query.

    Scale shape: synth + routed decode are chained Arrow-batched
    mapInPandas stages, then one 3-group partial-aggregated rollup;
    zero shuffles before it."""
    from duckdb_hdfs_spark.multimodal.decode import (
        route_decode_batches,
        synth_image_batches,
        synth_wav_batches,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_image_batches(docs).unionByName(synth_wav_batches(docs))
    routed = route_decode_batches(media)
    return routed.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("feature").cast("bigint").alias("feature_sum"),
    )


# --------------------------------------------------------------------------
@query(
    "mm_image_channel_stats",
    # the synthetic gradient makes every per-image statistic analytic:
    # R = r0+x (x∈0..5): mean r0+2.5, std sqrt(35/12), min r0, max r0+5;
    # G = g0+y (y∈0..3): mean g0+1.5, std sqrt(5/4); B = b0 constant.
    # 70/24 and 35.0/12 are the same correctly-rounded IEEE quotient,
    # so the Python pixel fold and the SQL literal agree bit-exactly.
    oracle="""
SELECT media_type, count(*) AS n_items,
       round(CAST(sum(CAST(r0 + 2.5 AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS avg_mean_r,
       round(sqrt(35.0 / 12), 6) AS std_r,
       min(r0) AS min_r, max(r0 + 5) AS max_r,
       round(CAST(sum(CAST(g0 + 1.5 AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS avg_mean_g,
       round(sqrt(5.0 / 4), 6) AS std_g,
       round(CAST(sum(CAST(b0 AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS avg_mean_b,
       CAST(0.0 AS DOUBLE) AS std_b
FROM (
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/bmp'
                ELSE 'image/x-portable-pixmap' END AS media_type,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 200
               AS r0,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2))::BIGINT % 200
               AS g0,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 2))::BIGINT AS b0
    FROM documents
)
GROUP BY media_type
""",
)
def mm_image_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset channel-normalization statistics over REAL decoded
    pixels — the per-channel mean/std/min/max pre-pass vision training
    publishes with every dataset card (the numbers that become the
    model's input-normalization constants).  Per-image stats come off
    the real BMP/PPM parse (multimodal/decode.channel_stats_batches);
    the corpus rollup averages them per media type in DECIMAL.  The
    oracle re-derives everything analytically from the md5-seeded
    gradient parameters — a decoder that misreads strides, row order,
    or channel order fails the hash.

    Scale shape: one Arrow-batched mapInPandas decode stage (zero
    shuffles, per-row map work), then one partial-aggregated group-by
    on the 2-value media-type key."""
    docs = _t(spark, sf_dir, "documents")
    stats = channel_stats_batches(synth_image_batches(docs))

    def davg(col: str):
        return F.round(
            F.sum(F.col(col).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        )

    return stats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        davg("mean_r").alias("avg_mean_r"),
        F.first("std_r").alias("std_r"),
        F.min("min_r").alias("min_r"),
        F.max("max_r").alias("max_r"),
        davg("mean_g").alias("avg_mean_g"),
        F.first("std_g").alias("std_g"),
        davg("mean_b").alias("avg_mean_b"),
        F.first("std_b").alias("std_b"),
    )


# --------------------------------------------------------------------------
@query(
    "mm_audio_tone_probe",
    # analytic oracle: the synth wave is s_i = A·(−1)^i with
    # A = 100 + 100·b0 and n = 64 + (b1 % 64) from md5(doc_id), so
    # the integer DFT bins close over counts of i mod 4 below n:
    # DC = A·(n%2); Nyquist = n·A; quarter bins = A·(cnt₀−cnt₂) and
    # A·(cnt₁−cnt₃) with cntᵣ = floor((n+3−r)/4).
    oracle="""
WITH p AS (
    SELECT doc_id,
           100 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT
               * 100 AS amp,
           64 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2))::BIGINT
               % 64 AS n
    FROM documents
)
SELECT doc_id,
       n AS n_samples,
       amp * (n % 2) AS dc_sum,
       n * amp AS nyquist_sum,
       amp * ((n + 3) // 4 - (n + 1) // 4) AS quarter_real,
       amp * ((n + 2) // 4 - n // 4) AS quarter_imag
FROM p
""",
)
def mm_audio_tone_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral tone probe over the REAL audio decode path: the DC,
    Nyquist, and quarter-rate DFT bins computed as exact INTEGER
    folds over the parsed sample stream (at those bins every twiddle
    factor is 0/±1 — the Goertzel special cases).  The
    silence/tone/hum detector a dataset card runs over an audio
    corpus: DC ≈ 0 rules out offset clipping, a dominant Nyquist bin
    flags synthetic/aliased content, the quarter bins catch
    half-rate periodicity.  Every value crosses the real RIFF
    encode → chunk-walk parse boundary; the oracle closes over the
    md5-seeded synth params analytically (an endianness or
    chunk-offset bug shifts every bin and fails the hash).

    Scale shape: two chained Arrow-batched mapInPandas stages, zero
    shuffles — per-row map work end to end (the mm_decode_wav
    shape with a DSP fold instead of a stats fold)."""
    from duckdb_hdfs_spark.multimodal.decode import (
        synth_wav_batches,
        wav_tone_probe_batches,
    )

    media = synth_wav_batches(_t(spark, sf_dir, "documents"))
    return wav_tone_probe_batches(media)
