"""Multimodal column plumbing (SURVEY.md §2.8).

Real pipelines carry image/audio/video as opaque ``binary`` columns
with typed metadata, decoding only inside Arrow-batched Python
workers (``mapInPandas``) so bytes never round-trip through the JVM
row format.  Two decode tiers:

- ``decode_image`` REALLY decodes the three formats that need no
  codec library — 24-bit uncompressed BMP, binary PPM (P6) (round 5),
  and GIF87a/89a with a full variable-width LZW decompressor
  (round 6) — parsed in pure Python; other compressed formats
  (PNG/JPEG/…) raise NotImplementedError because their DEFLATE/DCT
  codecs are not in this container.
- ``fake_decode`` / ``fake_resize`` / the frame sampler remain the
  deterministic stand-ins for codec-dependent kernels, keeping the
  Spark-side plumbing (schema, batching, partitioning) testable for
  formats the environment cannot decode.
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
    DoubleType,
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


def encode_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Minimal 24-bit uncompressed BMP writer (pure Python):
    BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows padded
    to 4-byte strides.  ``pixel_fn(x, y) -> (r, g, b)`` with (0, 0)
    the TOP-left pixel (the writer performs the bottom-up flip)."""
    import struct

    stride = (width * 3 + 3) & ~3
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (stride - len(row))
        rows += row
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    return bytes(header + rows)


def encode_ppm(width: int, height: int, pixel_fn) -> bytes:
    """Minimal binary PPM (P6) writer: ASCII header + raw top-down
    RGB rows, no padding."""
    body = bytearray()
    for y in range(height):
        for x in range(width):
            body += bytes(pixel_fn(x, y))
    return f"P6\n{width} {height}\n255\n".encode() + bytes(body)


def decode_image(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Real decode path — pure-Python parsers for the three formats
    that need no codec library: 24-bit uncompressed BMP, binary PPM
    (P6), and GIF (LZW — see ``decode_gif``).  Returns ``(width,
    height, rows)`` with ``rows[y][x] == (r, g, b)`` in top-down
    order.  Other compressed formats (PNG/JPEG/...) still raise
    NotImplementedError — their codecs are not in this container."""
    import struct

    if payload[:2] == b"BM":
        off, = struct.unpack_from("<I", payload, 10)
        hsz, width, height, _planes, bpp, comp = struct.unpack_from(
            "<IiiHHI", payload, 14
        )
        if bpp != 24 or comp != 0:
            raise NotImplementedError(
                f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
                f"compression={comp})"
            )
        bottom_up = height > 0
        height = abs(height)
        stride = (width * 3 + 3) & ~3
        rows = []
        for i in range(height):
            base = off + i * stride
            row = [
                (
                    payload[base + 3 * x + 2],  # R (disk order is BGR)
                    payload[base + 3 * x + 1],
                    payload[base + 3 * x],
                )
                for x in range(width)
            ]
            rows.append(row)
        if bottom_up:
            rows.reverse()
        return width, height, rows
    if payload[:2] == b"P6":
        # header: magic, width, height, maxval — ASCII tokens
        # separated by whitespace, '#' comments allowed
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while payload[pos : pos + 1] not in (b"\n", b""):
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace after maxval
        width, height, maxval = fields
        if maxval != 255:
            raise NotImplementedError("only 8-bit PPM supported")
        rows = []
        for y in range(height):
            base = pos + y * width * 3
            rows.append(
                [
                    tuple(payload[base + 3 * x : base + 3 * x + 3])
                    for x in range(width)
                ]
            )
        return width, height, rows
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    raise NotImplementedError(
        "unsupported image format (no codec libraries in this "
        "environment); supported: 24-bit BMP, binary PPM, GIF"
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
            # NULL payloads (failed fetches in a real media table)
            # yield NULL metadata instead of crashing the worker
            # (NULL-injection audit r9); pandas .map skips NaN/None
            # inputs when na_action='ignore'
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": payloads.map(len, na_action="ignore"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest(),
                        na_action="ignore",
                    ),
                    "features": payloads.map(
                        lambda b: fake_decode(bytes(b)), na_action="ignore"
                    ),
                }
            )

    return media.mapInPandas(decode, DECODED_SCHEMA)


#: synthesized real-image media schema (mm_decode_real)
SYNTH_MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

#: decoded real-image panel schema
REAL_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("top_left_g", LongType()),
        StructField("mean_b", LongType()),
    ]
)

SYNTH_W, SYNTH_H = 6, 4


def _synth_params(doc_id: int) -> tuple[int, int, int]:
    """Gradient parameters from md5(doc_id) — engine-portable: the
    oracle re-derives them as ('0x' || substr(md5(id), ..))::BIGINT.
    r0/g0 are capped at 199 so the +x/+y gradients never wrap."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[0:2], 16) % 200, int(h[2:4], 16) % 200, int(h[4:6], 16)


def synth_image_batches(docs: DataFrame) -> DataFrame:
    """Synthesize REAL image files per document — a 6×4 gradient
    (R = r0+x, G = g0+y, B = b0 from md5(doc_id)) encoded as an
    actual 24-bit BMP (even doc_id) or binary PPM (odd doc_id).
    Width 6 forces an 18→20-byte padded BMP stride, and the y
    gradient makes the bottom-up row flip observable — the encoder
    and parser cannot pass the oracle by luck."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                r0, g0, b0 = _synth_params(doc_id)

                def px(x, y):
                    return (r0 + x, g0 + y, b0)

                if doc_id % 2 == 0:
                    types.append("image/bmp")
                    payloads.append(encode_bmp(SYNTH_W, SYNTH_H, px))
                else:
                    types.append("image/x-portable-pixmap")
                    payloads.append(encode_ppm(SYNTH_W, SYNTH_H, px))
                ids.append(doc_id)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": types, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(synth, SYNTH_MEDIA_SCHEMA)


def real_decode_batches(media: DataFrame) -> DataFrame:
    """Decode REAL image bytes (decode_image: BMP/PPM parsers) into a
    per-item feature panel: dimensions, channel statistics, and the
    top-left green value (row-order sensitive — catches a parser that
    forgets BMP's bottom-up storage)."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "media_type", "width", "height",
                "mean_r", "top_left_g", "mean_b",
            )}
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                w, h, rows = decode_image(bytes(payload))
                n = w * h
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(
                    sum(p[0] for row in rows for p in row) / n
                )
                out["top_left_g"].append(rows[0][0][1])
                out["mean_b"].append(
                    sum(p[2] for row in rows for p in row) // n
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(dec, REAL_DECODED_SCHEMA)


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
                    # NULL payload → NULL output (failed fetch),
                    # never a worker crash (NULL-injection audit r9)
                    "resized": pdf["payload"].map(
                        lambda b: fake_resize(bytes(b), width, height),
                        na_action="ignore",
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
                if payload is None:
                    # a failed-fetch video yields zero frames
                    # (NULL-injection audit r9)
                    continue
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


# --------------------------------------------------------------------------
def encode_wav(sample_rate: int, samples: list) -> bytes:
    """Minimal RIFF/WAVE writer: mono 16-bit PCM, with a junk LIST
    chunk between fmt and data so parsers must actually chunk-walk."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    lst = b"INFOjunk"
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(lst)) + lst
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_audio(payload: bytes) -> tuple[int, list]:
    """Real audio decode path — pure-Python RIFF/WAVE parser for
    mono 16-bit PCM (chunk-walks past non-data chunks).  Returns
    ``(sample_rate, samples)``.  Compressed codecs (MP3/AAC/...)
    raise NotImplementedError — not in this container."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "unsupported audio container; supported: RIFF/WAVE 16-bit PCM"
        )
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"only mono 16-bit PCM supported (fmt={audio_fmt}, "
                    f"ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            samples = [
                struct.unpack_from("<h", body, 2 * i)[0]
                for i in range(len(body) // 2)
            ]
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise NotImplementedError("missing fmt/data chunk")
    return rate, samples


#: decoded real-audio panel schema
WAV_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("peak_amp", LongType()),
        StructField("first_sample", LongType()),
        StructField("mean_abs", DoubleType()),
    ]
)

WAV_RATE = 8000


def _wav_params(doc_id: int) -> tuple[int, int]:
    """(amplitude, n_samples) from md5(doc_id) — oracle-portable."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return 100 + int(h[0:2], 16) * 100, 64 + int(h[2:4], 16) % 64


def synth_wav_batches(docs: DataFrame) -> DataFrame:
    """Synthesize REAL RIFF/WAVE files per document: a ±A square wave
    (A and length from md5(doc_id)), written through encode_wav —
    including the junk LIST chunk, so the parser must chunk-walk."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                amp, n = _wav_params(doc_id)
                wave = [amp if i % 2 == 0 else -amp for i in range(n)]
                ids.append(doc_id)
                types.append("audio/wav")
                payloads.append(encode_wav(WAV_RATE, wave))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": types, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(synth, SYNTH_MEDIA_SCHEMA)


def wav_decode_batches(media: DataFrame) -> DataFrame:
    """Decode REAL WAV bytes (decode_audio) into a per-item panel:
    rate, length, peak, first sample (sign-sensitive — catches an
    endianness bug), and mean |amplitude| (exact integer math)."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "n_samples",
                "peak_amp", "first_sample", "mean_abs",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = decode_audio(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(samples))
                out["peak_amp"].append(max(samples))
                out["first_sample"].append(samples[0])
                out["mean_abs"].append(
                    sum(abs(s) for s in samples) / len(samples)
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(dec, WAV_DECODED_SCHEMA)


#: framed audio-energy panel schema
WAV_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_len", LongType()),
        StructField("peak", LongType()),
        StructField("rms", DoubleType()),
        StructField("mean_s", DoubleType()),
    ]
)

AUDIO_FRAME = 16


def wav_frame_energy_batches(media: DataFrame) -> DataFrame:
    """Frame the decoded sample stream into fixed AUDIO_FRAME-sample
    windows (full frames only — the tail remainder is dropped, as
    every streaming feature extractor does) and emit per-frame
    energy features: peak, RMS, signed mean.  1:N fan-out bounded by
    n_samples/AUDIO_FRAME.  RMS math stays exact for the synthetic
    square waves (sum of 16 squares ≤ 16·(25,600)² is integer-exact
    in double; sqrt of the exact mean is IEEE-correctly rounded), so
    the analytic oracle hash-matches."""
    import math

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "frame_idx", "frame_len", "peak", "rms", "mean_s",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, samples = decode_audio(bytes(payload))
                for fi in range(len(samples) // AUDIO_FRAME):
                    fr = samples[fi * AUDIO_FRAME : (fi + 1) * AUDIO_FRAME]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(fi)
                    out["frame_len"].append(len(fr))
                    out["peak"].append(max(fr))
                    out["rms"].append(
                        math.sqrt(sum(s * s for s in fr) / len(fr))
                    )
                    out["mean_s"].append(sum(fr) / len(fr))
            yield pd.DataFrame(out)

    return media.mapInPandas(frames, WAV_FRAME_SCHEMA)


#: image patch-grid panel schema
PATCH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("patch_x", LongType()),
        StructField("patch_y", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)

PATCH = 2


def image_patch_batches(media: DataFrame) -> DataFrame:
    """Split each decoded image into a grid of PATCH×PATCH pixel
    patches (the ViT tokenization step) and emit per-patch channel
    means.  Bounded 1:N fan-out ((W/PATCH)·(H/PATCH) patches per
    item); means of small integer sums are exact in double, so the
    analytic gradient oracle hash-matches."""

    def patches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "patch_x", "patch_y", "mean_r", "mean_g", "mean_b",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = decode_image(bytes(payload))
                for py in range(h // PATCH):
                    for px in range(w // PATCH):
                        pix = [
                            rows[py * PATCH + dy][px * PATCH + dx]
                            for dy in range(PATCH)
                            for dx in range(PATCH)
                        ]
                        n = len(pix)
                        out["doc_id"].append(int(doc_id))
                        out["patch_x"].append(px)
                        out["patch_y"].append(py)
                        out["mean_r"].append(sum(p[0] for p in pix) / n)
                        out["mean_g"].append(sum(p[1] for p in pix) / n)
                        out["mean_b"].append(sum(p[2] for p in pix) / n)
            yield pd.DataFrame(out)

    return media.mapInPandas(patches, PATCH_SCHEMA)


# --------------------------------------------------------------------------
# GIF (round 6): the third REAL image format.  GIF's only compression
# is LZW with variable-width codes — implementable in pure Python,
# unlike PNG/JPEG whose DEFLATE/DCT stacks stay behind
# NotImplementedError in this container.

GIF_MAX_WIDTH = 12  # spec cap: LZW codes never exceed 12 bits


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    """GIF-variant LZW compressor: variable code width starting at
    ``mcs + 1``, LSB-first bit packing, CLEAR/EOI control codes, and
    a 12-bit table cap with CLEAR-reset.  Width-change timing follows
    the standard ppmtogif/giflib convention (bump when the next free
    slot passes the current width's max code, checked after each
    emission and before the table add) so any conformant decoder
    reads the stream back."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    bitbuf = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    width = mcs + 1
    maxcode = (1 << width) - 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    put(clear, width)
    w = indices[0]
    for k in indices[1:]:
        if (w, k) in table:
            w = table[(w, k)]
            continue
        put(w, width)
        if next_code > maxcode and width < GIF_MAX_WIDTH:
            width += 1
            maxcode = (1 << width) - 1
        if next_code < (1 << GIF_MAX_WIDTH):
            table[(w, k)] = next_code
            next_code += 1
        else:  # table full: reset, exactly as a conformant decoder expects
            put(clear, width)
            table.clear()
            width = mcs + 1
            maxcode = (1 << width) - 1
            next_code = eoi + 1
        w = k
    put(w, width)
    # mirror the decoder, which adds one more entry after the final
    # data code and may bump its read width before consuming EOI
    if next_code > maxcode and width < GIF_MAX_WIDTH:
        width += 1
    put(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int) -> list[int]:
    """GIF-variant LZW decompressor: variable-width codes (LSB-first),
    CLEAR/EOI handling, the KwKwK self-referential case, and the
    12-bit table cap (entries stop growing until the encoder sends
    CLEAR)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: dict[int, tuple[int, ...]] = {i: (i,) for i in range(1 << mcs)}
    next_code = eoi + 1
    prev: tuple[int, ...] | None = None
    out: list[int] = []
    bitbuf = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                # real-world GIFs routinely omit the EOI code (the
                # canonical 1×1 tracking pixel does); tolerate the
                # bare stream end — callers check pixel-count
                # completeness, which still catches true truncation
                return out
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = {i: (i,) for i in range(1 << mcs)}
            next_code = eoi + 1
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # KwKwK: only-just-defined code
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out.extend(entry)
        if prev is not None and next_code < (1 << GIF_MAX_WIDTH):
            table[next_code] = prev + entry[:1]
            next_code += 1
        if next_code > (1 << width) - 1 and width < GIF_MAX_WIDTH:
            width += 1
        prev = entry


def encode_gif(width: int, height: int, palette, index_fn) -> bytes:
    """Minimal GIF89a writer: logical screen descriptor + global color
    table (padded to a power of two) + one image descriptor with
    LZW-compressed pixel indices in ≤255-byte sub-blocks + trailer.
    ``palette`` is a list of (r, g, b); ``index_fn(x, y)`` gives the
    palette index of the TOP-left-origin pixel (GIF stores rows
    top-down, row-major)."""
    import struct

    if width <= 0 or height <= 0:
        raise ValueError(f"zero-area GIF image: {width}x{height}")
    if not 1 <= len(palette) <= 256:
        # the GCT size field is 3 bits (2..256 entries); silently
        # masking a larger palette would emit a corrupt header
        raise ValueError(f"GIF palette must have 1-256 colors: {len(palette)}")
    n = max(2, 1 << (len(palette) - 1).bit_length())  # pow2, >= 2
    gct_bits = n.bit_length() - 1  # n == 2 ** gct_bits
    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", width, height, 0x80 | ((gct_bits - 1) & 7), 0, 0
    )
    for i in range(n):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    mcs = max(2, gct_bits)  # spec: minimum LZW code size is 2
    out.append(mcs)
    indices = [index_fn(x, y) for y in range(height) for x in range(width)]
    data = _lzw_encode(indices, mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # zero-length block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, list]:
    """Real GIF decode path — pure-Python GIF87a/89a parser with the
    full variable-width LZW decompressor above.  Chunk-walks
    extensions (graphic control, comments, application blocks), reads
    the global or local color table, and returns ``(width, height,
    rows)`` in the same top-down (r, g, b) contract as the BMP/PPM
    parsers.  Interlaced images and frames past the first raise
    NotImplementedError (animation is out of scope, same policy as
    the other decoders)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")

    def need(end: int) -> None:
        # every indexed read funnels through here so a truncated or
        # malformed payload raises the decoder's clean ValueError
        # contract instead of a raw IndexError/struct.error (ADVICE r6)
        if end > len(payload):
            raise ValueError("truncated GIF")

    need(13)
    _sw, _sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        need(pos + 3 * n)
        gct = [tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + data sub-blocks
            pos += 1
            need(pos + 1)
            while payload[pos]:
                pos += 1 + payload[pos]
                need(pos + 1)
            pos += 1
            continue
        if block != 0x2C:
            raise NotImplementedError(f"unsupported GIF block 0x{block:02x}")
        need(pos + 9)
        _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        palette = gct
        if ipacked & 0x80:  # local color table overrides
            n = 2 << (ipacked & 7)
            need(pos + 3 * n)
            palette = [
                tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)
            ]
            pos += 3 * n
        if palette is None:
            raise NotImplementedError("GIF image without a color table")
        need(pos + 1)
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            # conformant GIFs use 2..8 (codes cap at 12 bits, so mcs+1
            # <= 12); an unvalidated byte here would make _lzw_decode
            # eagerly build a 2^mcs-entry table — a hang/OOM, not the
            # clean ValueError contract (round-7 review finding)
            raise ValueError(f"invalid GIF LZW minimum code size: {mcs}")
        data = bytearray()
        need(pos + 1)
        while payload[pos]:
            ln = payload[pos]
            need(pos + 1 + ln)
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
            need(pos + 1)
        idx = _lzw_decode(bytes(data), mcs)
        if len(idx) < w * h:
            raise ValueError(f"GIF pixel data truncated: {len(idx)} < {w * h}")
        if w * h and max(idx[: w * h]) >= len(palette):
            raise ValueError("GIF pixel index out of palette range")
        rows = [[palette[idx[y * w + x]] for x in range(w)] for y in range(h)]
        return w, h, rows
    raise NotImplementedError("GIF contains no image data")


GIF_W, GIF_H, GIF_COLORS = 7, 5, 4

#: decoded GIF panel schema — all integer-exact features
GIF_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("top_left_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("wsum_r", LongType()),
    ]
)


def _gif_params(doc_id: int) -> tuple[int, int, int, int]:
    """(r0, g0, b0, s) from md5(doc_id) — oracle-portable; channel
    bases capped below 200 so palette entries never wrap past 255."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return (
        int(h[0:2], 16) % 200,
        int(h[2:4], 16) % 200,
        int(h[4:6], 16) % 200,
        int(h[6:8], 16) % 4,
    )


def synth_gif_batches(docs: DataFrame) -> DataFrame:
    """Synthesize a REAL GIF89a file per document: a 4-color palette
    (color k = (r0+k, g0+2k, b0+3k)) over a 7×5 pixel grid with
    index(x, y) = (x + y + s) % 4.  Width 7 is coprime to the palette
    cycle, so each row has a DIFFERENT residue distribution (a
    transposed or flipped decode changes the position-weighted
    checksum), and the diagonal repeats drive real LZW dictionary
    hits — the compressor is exercised, not passed through."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                r0, g0, b0, s = _gif_params(doc_id)
                palette = [
                    (r0 + k, g0 + 2 * k, b0 + 3 * k) for k in range(GIF_COLORS)
                ]
                payloads.append(
                    encode_gif(
                        GIF_W,
                        GIF_H,
                        palette,
                        lambda x, y: (x + y + s) % GIF_COLORS,
                    )
                )
                ids.append(doc_id)
                types.append("image/gif")
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": types, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(synth, SYNTH_MEDIA_SCHEMA)


def gif_decode_batches(media: DataFrame) -> DataFrame:
    """Decode REAL GIF bytes through the shared ``decode_image``
    dispatch (proving the router-facing entry point handles
    image/gif) and emit integer-exact features: dimensions, top-left
    red (palette + phase check), total green (palette arithmetic
    check), and the position-weighted red checksum
    ``sum(r * (x+1) * (y+2))`` — a flipped, transposed, or
    stride-shifted decode fails the hash."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "width", "height", "top_left_r", "sum_g", "wsum_r",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = decode_image(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["top_left_r"].append(rows[0][0][0])
                out["sum_g"].append(sum(p[1] for row in rows for p in row))
                out["wsum_r"].append(
                    sum(
                        p[0] * (x + 1) * (y + 2)
                        for y, row in enumerate(rows)
                        for x, p in enumerate(row)
                    )
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(dec, GIF_DECODED_SCHEMA)


#: routed media feature schema
ROUTED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("feature", LongType()),
    ]
)


def route_decode_batches(media: DataFrame) -> DataFrame:
    """Heterogeneous decode DISPATCH: one Arrow-batched stage routes
    each payload to its modality's parser by ``media_type`` (images →
    decode_image, audio → decode_audio) and emits a modality-specific
    integer feature (images: top-left green channel; audio: peak
    amplitude) — the mixed-media ingest shape a real lake has, where
    one job handles whatever arrived rather than one job per format.
    Unknown types would raise NotImplementedError loudly (same policy
    as the individual decoders)."""

    def route(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "media_type": [], "feature": []}
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt.startswith("image/"):
                    _w, _h, rows = decode_image(bytes(payload))
                    feature = rows[0][0][1]  # top-left green
                elif mt.startswith("audio/"):
                    _rate, samples = decode_audio(bytes(payload))
                    feature = max(samples)
                else:  # pragma: no cover - policy guard
                    raise NotImplementedError(f"unroutable media type {mt}")
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
                out["feature"].append(int(feature))
            yield pd.DataFrame(out)

    return media.mapInPandas(route, ROUTED_SCHEMA)


CHANNEL_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("mean_r", DoubleType()),
        StructField("std_r", DoubleType()),
        StructField("min_r", LongType()),
        StructField("max_r", LongType()),
        StructField("mean_g", DoubleType()),
        StructField("std_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("std_b", DoubleType()),
    ]
)


def channel_stats_batches(media: DataFrame) -> DataFrame:
    """Per-image per-channel statistics over REAL decoded pixels — the
    normalization pre-pass every vision training pipeline computes
    (dataset channel means/stds feed the model's input transform).
    Population std per image; means/stds are single divisions over
    exact integer pixel sums, so they are bit-reproducible."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "media_type", "mean_r", "std_r", "min_r",
                "max_r", "mean_g", "std_g", "mean_b", "std_b",
            )}
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                w, h, rows = decode_image(bytes(payload))
                n = w * h
                chans = []
                for c in range(3):
                    vals = [p[c] for row in rows for p in row]
                    s = sum(vals)  # exact int
                    mean = s / n
                    # deviations are exact dyadic rationals for the
                    # synthetic gradients; ssd sums exactly in double
                    ssd = sum((v - mean) ** 2 for v in vals)
                    chans.append(
                        (round(mean, 6), round(math.sqrt(ssd / n), 6),
                         min(vals), max(vals))
                    )
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
                out["mean_r"].append(chans[0][0])
                out["std_r"].append(chans[0][1])
                out["min_r"].append(chans[0][2])
                out["max_r"].append(chans[0][3])
                out["mean_g"].append(chans[1][0])
                out["std_g"].append(chans[1][1])
                out["mean_b"].append(chans[2][0])
                out["std_b"].append(chans[2][1])
            yield pd.DataFrame(out)

    return media.mapInPandas(stats, CHANNEL_STATS_SCHEMA)


#: spectral tone-probe panel schema (exact-integer DFT bins)
TONE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("dc_sum", LongType()),
        StructField("nyquist_sum", LongType()),
        StructField("quarter_real", LongType()),
        StructField("quarter_imag", LongType()),
    ]
)


def wav_tone_probe_batches(media: DataFrame) -> DataFrame:
    """Exact-integer spectral probe over decoded samples: the DC,
    Nyquist, and quarter-rate DFT bins of Σ s_i·e^(-2πi·k·t/N).  At
    these three bins every twiddle factor is in {0, ±1}, so the bins
    are INTEGER sums over the decoded stream — no float DSP — and an
    analytic oracle can hash-match them.  The folds are generic
    (they assume nothing about the waveform); only the ORACLE knows
    the synth closed forms."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_samples", "dc_sum", "nyquist_sum",
                "quarter_real", "quarter_imag",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, s = decode_audio(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(len(s))
                out["dc_sum"].append(sum(s))
                out["nyquist_sum"].append(
                    sum(v if i % 2 == 0 else -v for i, v in enumerate(s))
                )
                # k = N/4 twiddles cycle (1, -i, -1, +i): real part
                # from i%4 in {0, 2}, imag part from i%4 in {1, 3}
                out["quarter_real"].append(
                    sum(s[i] for i in range(0, len(s), 4))
                    - sum(s[i] for i in range(2, len(s), 4))
                )
                out["quarter_imag"].append(
                    sum(s[i] for i in range(3, len(s), 4))
                    - sum(s[i] for i in range(1, len(s), 4))
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(probe, TONE_SCHEMA)
