r"""Exhaustive BMP whitespace-CLASS divergence sweep (round 10).

Tokenization splits on ``\s+`` in BOTH engines, but the class itself
differs: Java regex ``\s`` is ``[ \t\n\x0B\f\r]`` while RE2's (DuckDB
``string_split_regex``) is ``[ \t\n\f\r]``.  Any codepoint in one
class but not the other splits a token on one engine only, silently
diverging every token count, shingle, minhash signature, and langid
call over text containing it — the same failure mode as the casefold
skew, one layer below it.

This test proves ``hashing._WS_SRC`` complete over the BMP the same
way test_casefold_sweep proves the casefold table: embed every BMP
codepoint between two letters, split on ``\s+`` on both engines, and
assert

1. the raw (un-shimmed) split-class divergence set is exactly
   ``_WS_SRC`` (round 10 found one: U+000B vertical tab), and
2. after the ``ws_fold`` pre-translate (folded into ``fold_lower``'s
   single translate pass, so ``tokens()``/``tokens_sql()`` carry it
   automatically), the engines tokenize every BMP codepoint
   identically.

A future regex-engine skew (new Unicode whitespace handling in either
engine) fails (1) naming the codepoint to add to ``_WS_SRC/_WS_DST``.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from duckdb_hdfs_spark.functions.hashing import (
    _WS_SRC,
    tokens,
    tokens_sql,
)

# every BMP codepoint except the surrogate block (unencodable in
# UTF-8) and NUL (DuckDB VARCHARs are NUL-terminated C strings)
_CPS = [cp for cp in range(1, 0x10000) if not 0xD800 <= cp <= 0xDFFF]


def test_bmp_whitespace_class_sweep(spark, oracle_con):
    rows = [(cp, f"a{chr(cp)}b") for cp in _CPS]
    schema = StructType(
        [StructField("cp", LongType()), StructField("s", StringType())]
    )
    sdf = (
        spark.createDataFrame(rows, schema)
        .select(
            "cp",
            F.size(F.split("s", r"\s+")).alias("raw_n"),
            F.size(tokens(F.col("s"))).alias("tok_n"),
            tokens(F.col("s")).getItem(0).alias("tok_0"),
        )
        .toPandas()
        .set_index("cp")
    )

    import pandas as pd

    oracle_con.register("ws_sweep", pd.DataFrame(rows, columns=["cp", "s"]))
    ddf = (
        oracle_con.execute(
            rf"""
            SELECT cp,
                   len(string_split_regex(s, '\s+')) AS raw_n,
                   len({tokens_sql('s')}) AS tok_n,
                   {tokens_sql('s')}[1] AS tok_0
            FROM ws_sweep ORDER BY cp
            """
        )
        .fetchdf()
        .set_index("cp")
    )
    oracle_con.unregister("ws_sweep")

    raw_div = {cp for cp in _CPS if sdf.at[cp, "raw_n"] != ddf.at[cp, "raw_n"]}
    tok_div = {
        cp
        for cp in _CPS
        if sdf.at[cp, "tok_n"] != ddf.at[cp, "tok_n"]
        or sdf.at[cp, "tok_0"] != ddf.at[cp, "tok_0"]
    }

    assert tok_div == set(), (
        "tokens() leaves cross-engine whitespace-class divergence at "
        f"codepoints {sorted(hex(c) for c in tok_div)} — extend "
        "_WS_SRC/_WS_DST"
    )
    # the shim table is exactly the raw divergence set: nothing
    # missing (covered above) and nothing superfluous
    table = {ord(c) for c in _WS_SRC}
    assert raw_div == table, (
        f"raw \\s-class divergence set {sorted(hex(c) for c in raw_div)} "
        f"!= ws table {sorted(hex(c) for c in table)}"
    )


@pytest.mark.slow  # 1.1M-codepoint plane sweep; re-run on toolchain image changes
def test_supplementary_whitespace_class_sweep(spark, oracle_con):
    """Planes 1-16: Unicode defines no supplementary whitespace, and
    neither regex engine's ``\\s`` may invent one — proven by sweep
    (the companion of the supplementary casefold sweep).  DuckDB
    generates its side via chr() to avoid a 1M-row transfer."""
    cps = list(range(0x10000, 0x110000))
    rows = [(cp, f"a{chr(cp)}b") for cp in cps]
    schema = StructType(
        [StructField("cp", LongType()), StructField("s", StringType())]
    )
    sdf = (
        spark.createDataFrame(rows, schema)
        .select("cp", F.size(F.split("s", r"\s+")).alias("n"))
        .toPandas()
        .set_index("cp")
    )
    ddf = (
        oracle_con.execute(
            r"""
            SELECT cp, len(string_split_regex(s, '\s+')) AS n
            FROM (SELECT cp, 'a' || chr(cp::INT) || 'b' AS s
                  FROM (SELECT range AS cp FROM range(65536, 1114112)))
            ORDER BY cp
            """
        )
        .fetchdf()
        .set_index("cp")
    )
    split_any = {
        cp
        for cp in cps
        if sdf.at[cp, "n"] > 1 or ddf.at[cp, "n"] > 1
    }
    div = {cp for cp in cps if sdf.at[cp, "n"] != ddf.at[cp, "n"]}
    assert split_any == set(), (
        "an engine treats a supplementary codepoint as whitespace: "
        f"{sorted(hex(c) for c in split_any)}"
    )
    assert div == set(), (
        f"supplementary \\s-class divergence: {sorted(hex(c) for c in div)}"
    )
