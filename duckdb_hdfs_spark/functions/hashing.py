"""Engine-portable hashing column expressions.

Everything here is built on md5 because Spark and DuckDB produce the
identical lowercase-hex digest — engine-native ``hash()`` /
``xxhash64`` differ between engines and would break oracle parity.
All expressions are ``pyspark.sql.functions`` compositions (JVM-side,
codegen-friendly); no Python UDFs.

The 60-bit integer hash keeps values positive in a signed int64 in
both engines (15 hex chars = 60 bits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: number of minhash permutations and LSH banding layout
NUM_PERM = 12
BAND_ROWS = 3
NUM_BANDS = NUM_PERM // BAND_ROWS  # 4


def md5_int60(col: Column) -> Column:
    """60-bit positive bigint from md5 (oracle:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_int60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens (oracle:
    ``string_split_regex(lower(x), '\\s+')``)."""
    return F.split(F.lower(col), r"\s+")


def tokens_sql(expr: str) -> str:
    return rf"string_split_regex(lower({expr}), '\s+')"


def word_shingles(toks: Column, k: int = 2) -> Column:
    """Distinct word k-shingles (k=2 default: selective enough that
    LSH candidates are true near-dups, permissive enough to catch
    moderate edits).  Out-of-range tail elements are coalesced to ''
    (only reachable for docs shorter than k words)."""
    parts = lambda i: [F.try_element_at(toks, i)] + [
        F.coalesce(F.try_element_at(toks, i + j), F.lit("")) for j in range(1, k)
    ]
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", *parts(i)),
        )
    )


def word_shingles_sql(toks_expr: str, k: int = 2) -> str:
    joined = " || ' ' || ".join(
        [f"{toks_expr}[i]"]
        + [f"coalesce({toks_expr}[i+{j}], '')" for j in range(1, k)]
    )
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({toks_expr}) - {k - 1}, 1)), "
        f"i -> {joined}))"
    )


def minhash_signature(shingles: Column, num_perm: int = NUM_PERM) -> Column:
    """MinHash signature: for permutation ``p``, the lexicographic min
    of ``md5(shingle || '#p')`` hex strings.  Hex-string ordering is
    identical in both engines, so no integer conversion is needed.

    Scale: O(|shingles| x num_perm) pure map work per row — no
    shuffle; the signature replaces the document in all downstream
    LSH joins (SURVEY.md §2.5).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda p: F.array_min(
            F.transform(
                shingles, lambda s: F.md5(F.concat(s, F.lit("#"), p.cast("string")))
            )
        ),
    )


def minhash_signature_sql(shingles_expr: str, num_perm: int = NUM_PERM) -> str:
    return (
        f"list_transform(generate_series(0, {num_perm - 1}), "
        f"p -> list_min(list_transform({shingles_expr}, "
        f"s -> md5(s || '#' || CAST(p AS VARCHAR)))))"
    )


def band_keys(sig: Column, band_rows: int = BAND_ROWS, num_bands: int = NUM_BANDS) -> Column:
    """LSH band keys: md5 over each contiguous ``band_rows`` slice of
    the signature.  Docs sharing any band key are candidate pairs —
    the join is on the band key (bounded buckets), never all-pairs."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at(sig, b * band_rows + r + 1)
                        for r in range(band_rows)
                    ],
                )
            )
            for b in range(num_bands)
        ]
    )


def band_keys_sql(sig_expr: str, band_rows: int = BAND_ROWS, num_bands: int = NUM_BANDS) -> str:
    parts = " || '|' || ".join(
        f"{sig_expr}[b * {band_rows} + {r + 1}]" for r in range(band_rows)
    )
    return f"list_transform(generate_series(0, {num_bands - 1}), b -> md5({parts}))"
