"""Exhaustive BMP case-fold divergence sweep (round-9 verdict task 5).

``fold_lower`` pre-translates the codepoints where Java's
``String.toLowerCase`` (Spark) and utf8proc's ``lower`` (DuckDB)
disagree.  Round 9 found two (U+0130 dotted-I, U+03A3 capital sigma)
by adversarial audit; this test proves the pair table COMPLETE by
construction: it lowercases every BMP codepoint on BOTH engines —
alone and in a word-final position (Java's final-sigma rule is
contextual: a bare U+03A3 lowercases to U+03C3, but "aΣ" yields the
final form U+03C2) — and asserts

1. the raw (un-shimmed) divergence set is exactly the pair table's
   source set, and
2. after fold_lower / fold_lower_sql, the engines agree on every
   single BMP codepoint in both contexts.

If a Unicode-version skew between the JVM and utf8proc ever
introduces a new divergent codepoint, (1) fails naming it — extend
``hashing._CASEFOLD_SRC/_DST`` and every derived SQL fragment
updates automatically (single source of truth).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from duckdb_hdfs_spark.functions.hashing import (
    _CASEFOLD_SRC,
    _CASEFOLD_SUPP_SRC,
    fold_lower,
    fold_lower_sql,
)

# every BMP codepoint except the surrogate block (unencodable in
# UTF-8) and NUL (DuckDB VARCHARs are NUL-terminated C strings)
_CPS = [cp for cp in range(1, 0x10000) if not 0xD800 <= cp <= 0xDFFF]


def _sweep(spark, oracle_con, shape):
    """Return (raw_divergent, folded_divergent) codepoint sets for
    one context shape ('bare' or 'final')."""
    mk = (lambda ch: ch) if shape == "bare" else (lambda ch: "a" + ch)
    rows = [(cp, mk(chr(cp))) for cp in _CPS]

    schema = StructType(
        [StructField("cp", LongType()), StructField("s", StringType())]
    )
    sdf = (
        spark.createDataFrame(rows, schema)
        .select(
            "cp",
            F.lower("s").alias("raw"),
            fold_lower(F.col("s")).alias("folded"),
        )
        .toPandas()
        .set_index("cp")
    )

    import pandas as pd

    oracle_con.register("cf_sweep", pd.DataFrame(rows, columns=["cp", "s"]))
    ddf = (
        oracle_con.execute(
            f"SELECT cp, lower(s) AS raw, {fold_lower_sql('s')} AS folded "
            "FROM cf_sweep ORDER BY cp"
        )
        .fetchdf()
        .set_index("cp")
    )
    oracle_con.unregister("cf_sweep")

    raw_div = {
        cp for cp in _CPS if sdf.at[cp, "raw"] != ddf.at[cp, "raw"]
    }
    folded_div = {
        cp for cp in _CPS if sdf.at[cp, "folded"] != ddf.at[cp, "folded"]
    }
    return raw_div, folded_div


def test_bmp_casefold_sweep(spark, oracle_con):
    table = {ord(c) for c in _CASEFOLD_SRC}
    raw_all, folded_all = set(), set()
    for shape in ("bare", "final"):
        raw, folded = _sweep(spark, oracle_con, shape)
        raw_all |= raw
        folded_all |= folded

    assert folded_all == set(), (
        "fold_lower leaves cross-engine divergence at codepoints "
        f"{sorted(hex(c) for c in folded_all)} — extend _CASEFOLD_SRC/_DST"
    )
    # the pair table is exactly the raw divergence set: nothing
    # missing (covered above) and nothing superfluous (every entry
    # earns its translate slot)
    assert raw_all == table, (
        f"raw divergence set {sorted(hex(c) for c in raw_all)} != pair "
        f"table {sorted(hex(c) for c in table)}"
    )


@pytest.mark.slow  # 1.1M-codepoint plane sweep; re-run on toolchain image changes
def test_supplementary_casefold_sweep(spark, oracle_con):
    """Planes 1-16 continuation of the BMP sweep (round 10): the JVM
    lowercases the Vithkuqi (Unicode 14) and Garay (Unicode 16)
    capitals that utf8proc leaves unchanged — scraped corpora carry
    supplementary text (emoji, historic scripts), so the fold table
    must be complete beyond the BMP too.  Supplementary casing is
    context-free (the final-sigma rule is BMP-only), so one bare
    shape suffices; DuckDB generates its side via chr() to avoid a
    1M-row transfer."""
    cps = list(range(0x10000, 0x110000))
    rows = [(cp, chr(cp)) for cp in cps]
    schema = StructType(
        [StructField("cp", LongType()), StructField("s", StringType())]
    )
    sdf = (
        spark.createDataFrame(rows, schema)
        .select(
            "cp",
            F.lower("s").alias("raw"),
            fold_lower(F.col("s")).alias("folded"),
        )
        .toPandas()
        .set_index("cp")
    )
    ddf = (
        oracle_con.execute(
            f"""
            SELECT cp, lower(s) AS raw, {fold_lower_sql('s')} AS folded
            FROM (SELECT cp, chr(cp::INT) AS s
                  FROM (SELECT range AS cp FROM range(65536, 1114112)))
            ORDER BY cp
            """
        )
        .fetchdf()
        .set_index("cp")
    )

    raw_div = {cp for cp in cps if sdf.at[cp, "raw"] != ddf.at[cp, "raw"]}
    folded_div = {
        cp for cp in cps if sdf.at[cp, "folded"] != ddf.at[cp, "folded"]
    }

    assert folded_div == set(), (
        "fold_lower leaves supplementary-plane divergence at "
        f"{sorted(hex(c) for c in folded_div)} — extend "
        "_CASEFOLD_SUPP_SRC/_DST"
    )
    table = {ord(c) for c in _CASEFOLD_SUPP_SRC}
    assert raw_div == table, (
        f"supplementary raw divergence {sorted(hex(c) for c in raw_div)} "
        f"!= supp pair table {sorted(hex(c) for c in table)}"
    )
