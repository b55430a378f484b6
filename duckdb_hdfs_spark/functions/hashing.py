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

#: universal-hash permutation constants: perm_p(h) = (A[p]*h + B[p]) % PRIME.
#: One md5 per shingle + NUM_PERM integer multiply-adds replaces NUM_PERM
#: md5 calls per shingle (~12x less hash work; identical collision math).
#: h < 2^31 and A < 2^30, so A*h + B < 2^62 — no signed-int64 overflow in
#: either engine.  Fixed arbitrary odd constants (any would do; hardcoded
#: so Spark and the DuckDB oracle agree byte-for-byte).
MINHASH_PRIME = 2147483647  # 2^31 - 1
MINHASH_A = (
    387420489, 268435399, 536870909, 113246209, 822083581, 479001599,
    715827883, 251658241, 104857601, 999999937, 612220703, 377487361,
)
MINHASH_B = (
    15485863, 86028121, 32452843, 49979687, 67867967, 23456789,
    98765431, 54321689, 11111117, 77777777, 44444443, 31415927,
)


def md5_int60(col: Column) -> Column:
    """60-bit positive bigint from md5 (oracle:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_int60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


#: Unicode case-fold portability shim.  Two divergence classes
#: between Java's String.toLowerCase (Spark) and DuckDB's utf8proc
#: lower():
#:
#: 1. FULL vs SIMPLE special casing \u2014 U+0130 Turkish dotted capital
#:    I (Java: 'i' + combining dot, TWO codepoints; utf8proc: 'i')
#:    and U+03A3 capital Sigma (Java: contextual final-sigma \u03c2 at
#:    word end; utf8proc: \u03c3 everywhere);
#: 2. UNICODE-VERSION SKEW \u2014 this JVM carries Unicode 15.1/16 case
#:    mappings that utf8proc lacks: the Latin Extended-D additions
#:    (Old Polish O, stroked D/S, rams-horn Gamma, diagonal-stroke
#:    S, closed insular G, Middle Scots / sigmoid S, Lambda, lezh,
#:    reversed half H), Cyrillic Tje, and the Glagolitic caudate
#:    chrivi \u2014 Java lowers them, DuckDB leaves them unchanged.
#:
#: Either class splits every token, shingle hash, and content digest
#: over text containing the codepoint.  Pre-translating each
#: divergent codepoint to the lowercase target BOTH engines agree is
#: a fixed point makes folded text byte-identical.  The table is
#: COMPLETE over the BMP by construction:
#: tests/test_casefold_sweep.py lowercases every BMP codepoint on
#: both engines (bare and in final-sigma context) and asserts the
#: raw divergence set equals exactly this table and the folded set
#: is empty \u2014 a new JVM/utf8proc version skew fails that test
#: naming the codepoint to add here, and every SQL fragment derives
#: from fold_lower_sql(), so extending the table propagates
#: everywhere (single source of truth).
_CASEFOLD_SRC = (
    "\u0130\u03a3"  # dotted-I, capital sigma (full-vs-simple casing)
    "\u1c89\u2c2f"  # Cyrillic Tje, Glagolitic caudate chrivi
    "\ua7c0\ua7c7\ua7c9\ua7cb\ua7cc\ua7d0"  # Latin Extended-D (U14-16)
    "\ua7d6\ua7d8\ua7da\ua7dc\ua7f5"
)
_CASEFOLD_DST = (
    "I\u03c3"
    "\u1c8a\u2c5f"
    "\ua7c1\ua7c8\ua7ca\u0264\ua7cd\ua7d1"
    "\ua7d7\ua7d9\ua7db\u019b\ua7f6"
)

#: SUPPLEMENTARY-plane continuation of the same Unicode-version skew
#: (round-10 sweep, tests/test_casefold_sweep.py::
#: test_supplementary_casefold_sweep): this JVM lowercases the
#: Vithkuqi (U+10570\u201310595, Unicode 14) and Garay (U+10D50\u201310D65,
#: Unicode 16) capitals; utf8proc leaves them unchanged.  Same
#: pre-translate fix \u2014 every target is the lowercase letter BOTH
#: engines agree is a fixed point; translate is codepoint-wise for
#: supplementary characters on both engines (probe-verified).  Kept
#: as separate constants so each sweep test pins its own plane's
#: table exactly.
_CASEFOLD_SUPP_SRC = (
    "\U00010570\U00010571\U00010572\U00010573\U00010574\U00010575\U00010576\U00010577"
    "\U00010578\U00010579\U0001057a\U0001057c\U0001057d\U0001057e\U0001057f\U00010580"
    "\U00010581\U00010582\U00010583\U00010584\U00010585\U00010586\U00010587\U00010588"
    "\U00010589\U0001058a\U0001058c\U0001058d\U0001058e\U0001058f\U00010590\U00010591"
    "\U00010592\U00010594\U00010595\U00010d50\U00010d51\U00010d52\U00010d53\U00010d54"
    "\U00010d55\U00010d56\U00010d57\U00010d58\U00010d59\U00010d5a\U00010d5b\U00010d5c"
    "\U00010d5d\U00010d5e\U00010d5f\U00010d60\U00010d61\U00010d62\U00010d63\U00010d64"
    "\U00010d65"
)
_CASEFOLD_SUPP_DST = (
    "\U00010597\U00010598\U00010599\U0001059a\U0001059b\U0001059c\U0001059d\U0001059e"
    "\U0001059f\U000105a0\U000105a1\U000105a3\U000105a4\U000105a5\U000105a6\U000105a7"
    "\U000105a8\U000105a9\U000105aa\U000105ab\U000105ac\U000105ad\U000105ae\U000105af"
    "\U000105b0\U000105b1\U000105b3\U000105b4\U000105b5\U000105b6\U000105b7\U000105b8"
    "\U000105b9\U000105bb\U000105bc\U00010d70\U00010d71\U00010d72\U00010d73\U00010d74"
    "\U00010d75\U00010d76\U00010d77\U00010d78\U00010d79\U00010d7a\U00010d7b\U00010d7c"
    "\U00010d7d\U00010d7e\U00010d7f\U00010d80\U00010d81\U00010d82\U00010d83\U00010d84"
    "\U00010d85"
)

#: Whitespace-CLASS portability shim (round-10 sweep,
#: tests/test_ws_sweep.py): Java regex ``\s`` is ``[ \t\n\x0B\f\r]``
#: while RE2's (DuckDB string_split_regex) is ``[ \t\n\f\r]`` \u2014 the
#: ONE BMP codepoint they disagree on is U+000B vertical tab: Spark
#: splits a token there, DuckDB does not, so every token count,
#: shingle, and content hash over \x0B-bearing text diverges.
#: Pre-translating \x0B to TAB (whitespace in BOTH classes) makes
#: the split byte-identical.  The sweep test proves this table
#: complete over the BMP the same way the casefold sweep does.
_WS_SRC = "\x0b"
_WS_DST = "\t"


def ws_fold(col: Column) -> Column:
    """Whitespace-class portability translate alone \u2014 for call sites
    that split on ``\\s+`` over a bare ``lower()`` (token counts,
    where the casefold table cannot change the count)."""
    return F.translate(col, _WS_SRC, _WS_DST)


def ws_fold_sql(expr: str) -> str:
    return f"translate({expr}, '{_WS_SRC}', '{_WS_DST}')"


#: the one translate table fold_lower applies: BMP casefold pairs +
#: supplementary casefold pairs + the whitespace-class pair \u2014 all
#: portability shims ride a SINGLE translate pass over the text
_FOLD_SRC = _CASEFOLD_SRC + _CASEFOLD_SUPP_SRC + _WS_SRC
_FOLD_DST = _CASEFOLD_DST + _CASEFOLD_SUPP_DST + _WS_DST


def fold_lower(col: Column) -> Column:
    """Portable lowercase + whitespace-class fold: identical output
    on Spark and DuckDB for every Unicode codepoint in every plane
    (sweep-verified, tests/test_casefold_sweep.py +
    tests/test_ws_sweep.py), including the full-vs-simple special
    cases, the JVM/utf8proc Unicode-version skew (BMP and
    supplementary), and the Java-vs-RE2 ``\\s`` split (the
    whitespace pair rides the same single translate pass \u2014 no extra
    scan of the text)."""
    return F.lower(F.translate(col, _FOLD_SRC, _FOLD_DST))


def fold_lower_sql(expr: str) -> str:
    return f"lower(translate({expr}, '{_FOLD_SRC}', '{_FOLD_DST}'))"


def tokens(col: Column) -> Column:
    r"""Case-folded whitespace tokens (oracle:
    ``string_split_regex(<fold_lower>, '\s+')``) -- fold_lower, not
    a bare lower(), so Unicode special-cased codepoints tokenize
    identically on both engines."""
    return F.split(fold_lower(col), r"\s+")


def tokens_sql(expr: str) -> str:
    return rf"string_split_regex({fold_lower_sql(expr)}, '\s+')"


def word_kgrams(toks: Column, k: int = 2) -> Column:
    """Word k-grams WITH multiplicity, space-joined; out-of-range tail
    elements become '' (only reachable for docs shorter than k words).

    Built as zip_with over k shifted slices of the (padded) token
    array.  NEVER write this as ``transform(sequence(1, n), i ->
    ...element_at(toks, i)...)`` over an inline EXPRESSION: an outer
    expression referenced inside a higher-order-function lambda is
    re-evaluated per element — with ``toks`` a regexp split, that
    turns an O(n) shingle build into O(n) regex splits per row (~11x
    slower measured).  Over a PROJECTED COLUMN reference the
    transform+slice+array_join form is safe (a bound reference is
    O(1) per element) and beats this builder for large k, whose k−1
    zip_with passes copy each token O(k) times — the substring-span
    pipeline uses that form at k=8 (queries/dedup.py, round-10 A/B:
    ~35% off the key); at k=2-5 with padding needed, this builder
    stays the right default."""
    n = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    padded = F.concat(toks, F.array_repeat(F.lit(""), k - 1))
    acc = F.slice(padded, 1, n)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(padded, j + 1, n), lambda a, b: F.concat_ws(" ", a, b)
        )
    return acc


def word_shingles(toks: Column, k: int = 2) -> Column:
    """Distinct word k-shingles (k=2 default: selective enough that
    LSH candidates are true near-dups, permissive enough to catch
    moderate edits)."""
    return F.array_distinct(word_kgrams(toks, k))


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


def shingle_hash(col: Column) -> Column:
    """Base 31-bit shingle hash: md5-derived 60-bit int mod PRIME.
    Computed ONCE per shingle; all NUM_PERM permutations derive from
    it by integer multiply-add (see MINHASH_A/B)."""
    return md5_int60(col) % MINHASH_PRIME


def shingle_hash_sql(expr: str) -> str:
    return f"({md5_int60_sql(expr)} % {MINHASH_PRIME})"


def minhash_perm(h: Column, p: int) -> Column:
    """Permutation ``p`` of a base shingle hash (universal hashing)."""
    return (F.lit(MINHASH_A[p]) * h + F.lit(MINHASH_B[p])) % F.lit(MINHASH_PRIME)


def minhash_sigints_sql(hashes_expr: str, num_perm: int = NUM_PERM) -> str:
    """Oracle-side minhash over a pre-hashed shingle list: for each
    permutation, min of ``(A[p]*h + B[p]) % PRIME``.  The Spark side
    computes the same values via explode + min-agg
    (operators.dedup.minhash_signature_cols) — a nested array
    expression there would re-evaluate the signature subtree once per
    downstream reference."""
    a = "[" + ", ".join(str(x) for x in MINHASH_A[:num_perm]) + "]"
    b = "[" + ", ".join(str(x) for x in MINHASH_B[:num_perm]) + "]"
    return (
        f"list_transform(generate_series(1, {num_perm}), "
        f"p -> list_min(list_transform({hashes_expr}, "
        f"h -> ({a}[p] * h + {b}[p]) % {MINHASH_PRIME})))"
    )


def band_keys_sql(sig_expr: str, band_rows: int = BAND_ROWS, num_bands: int = NUM_BANDS) -> str:
    """Oracle-side LSH band keys: md5 over each contiguous
    ``band_rows`` slice of the (integer) signature list.  Docs sharing
    any band key are candidate pairs — the join is on the band key
    (bounded buckets), never all-pairs."""
    parts = " || '|' || ".join(
        f"CAST({sig_expr}[b * {band_rows} + {r + 1}] AS VARCHAR)"
        for r in range(band_rows)
    )
    return f"list_transform(generate_series(0, {num_bands - 1}), b -> md5({parts}))"
