"""Analytic fixtures for the round-9 eighth wave: regexp-class
no-match/multi-match semantics, Neyman allocation on a zero-variance
stratum, exact-fit packing efficiency, and the DOW-adjusted anomaly
detector's defining property (flags the off-cycle burst, not the
weekly spike)."""

from __future__ import annotations

import pandas as pd

from duckdb_hdfs_spark.queries import load_all
from tests.test_round9_fixtures import _both, _events_frame

T0 = pd.Timestamp("2024-01-01 00:00:00")  # a Monday


# --------------------------------------------------------------------------
def test_regexp_funcs_no_match_semantics(spark, tmp_path):
    """No-match extraction must yield '' on BOTH engines (not NULL),
    global replace must hit every occurrence, and the vowel-count
    identity must handle vowel-free and empty strings."""
    part = pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4],
            "p_name": ["aeiou aeiou", "xyz", "", "mixed case Words"],
            "p_brand": ["Brand#12", "Brand#1", "nope", "Brand#99"],
            "p_type": ["STANDARD ANODIZED BRASS", "X", "", "PROMO  PLATED"],
            "p_size": [1, 2, 3, 4],
            "p_retailprice": [1.0, 2.0, 3.0, 4.0],
        }
    )
    got, want = _both(
        spark, tmp_path, "sql_regexp_funcs",
        load_all()["sql_regexp_funcs"].oracle, {"part": part}, ["p_partkey"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    by = got.set_index("p_partkey")
    assert by.loc[1, "devoweled"] == "_____ _____"
    assert by.loc[1, "vowel_count"] == 10
    assert by.loc[2, "vowel_count"] == 0
    assert by.loc[2, "first_word"] == "xyz"
    assert by.loc[3, "first_word"] == ""  # empty input
    assert by.loc[2, "second_type_word"] == ""  # no second word
    assert bool(by.loc[1, "std_brand"]) and not bool(by.loc[2, "std_brand"])
    assert by.loc[4, "brand_digits"] == "99"


# --------------------------------------------------------------------------
def test_neyman_zero_variance_stratum(spark, tmp_path):
    """A constant-length stratum has S_h = 0 and must receive ZERO
    Neyman budget while proportional allocation still funds it —
    the exact disagreement the op exists to expose."""
    from duckdb_hdfs_spark.queries.curation import _neyman_oracle

    docs = pd.DataFrame(
        {
            "doc_id": range(100),
            "text": ["x"] * 100,
            "lang": ["en"] * 100,
            "source": ["flat"] * 50 + ["spread"] * 50,
            "n_chars": [500] * 50
            + [100 + 80 * i for i in range(50)],  # wide spread
        }
    )
    got, want = _both(
        spark, tmp_path, "sample_neyman_allocation", _neyman_oracle(),
        {"documents": docs}, ["source"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    by = got.set_index("source")
    assert by.loc["flat", "stratum_std"] == 0.0
    assert by.loc["flat", "neyman_n"] == 0
    assert by.loc["spread", "neyman_n"] == 1000
    assert by.loc["flat", "proportional_n"] == 500
    assert by.loc["spread", "proportional_n"] == 500


# --------------------------------------------------------------------------
def test_pack_efficiency_exact_fit(spark, tmp_path):
    """Docs of exactly B/2 tokens pack two-per-bin with zero waste:
    bins_used == lower bound, utilization == 1.0, no straddle; an
    oversize doc is counted and forces straddle bins."""
    from duckdb_hdfs_spark.queries.advanced import (
        PACK_BUDGET,
        _pack_efficiency_oracle,
    )

    half = PACK_BUDGET // 2
    texts = [" ".join(["tok"] * half) for _ in range(8)]  # en: 4 full bins
    texts += [" ".join(["tok"] * (2 * PACK_BUDGET))]  # de: one oversize doc
    docs = pd.DataFrame(
        {
            "doc_id": range(9),
            "text": texts,
            "lang": ["en"] * 8 + ["de"],
            "source": ["s"] * 9,
            "n_chars": [len(t) for t in texts],
        }
    )
    got, want = _both(
        spark, tmp_path, "pack_efficiency_audit",
        _pack_efficiency_oracle(), {"documents": docs}, ["lang"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    by = got.set_index("lang")
    assert by.loc["en", "bins_used"] == 4
    assert by.loc["en", "bin_lower_bound"] == 4
    assert by.loc["en", "utilization"] == 1.0
    assert by.loc["en", "bins_over_budget"] == 0
    assert by.loc["en", "oversize_docs"] == 0
    assert by.loc["de", "oversize_docs"] == 1
    assert by.loc["de", "bins_used"] == 1  # starts in bin 0, straddles
    assert by.loc["de", "bins_over_budget"] == 1


# --------------------------------------------------------------------------
def test_dow_adjusted_flags_burst_not_mondays(spark, tmp_path):
    """Four weeks where every Monday runs 60 events vs 6 on other
    days, plus ONE Tuesday burst of 60: the plain weekly spike must
    NOT be flagged (it IS the Monday baseline) while the off-cycle
    Tuesday must be the single anomaly."""
    from duckdb_hdfs_spark.queries.events import _dow_adjusted_oracle

    rows = []
    eid = 0
    for d in range(28):
        day = T0 + pd.Timedelta(days=d)
        n = 60 if d % 7 == 0 else 6  # T0 is a Monday
        if d == 8:  # the second Tuesday: a genuine burst
            n = 60
        for i in range(n):
            rows.append(
                (eid, day + pd.Timedelta(minutes=i), i % 9, "view", 1.0, "{}")
            )
            eid += 1
    got, want = _both(
        spark, tmp_path, "ev_anomaly_dow_adjusted",
        _dow_adjusted_oracle(), {"events": _events_frame(rows)},
        ["event_type", "day"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    flagged = got[got["is_anomaly"]]
    assert list(flagged["day"]) == ["2024-01-09"]
    mondays = got[got["day"].isin(["2024-01-01", "2024-01-08",
                                   "2024-01-15", "2024-01-22"])]
    assert not mondays["is_anomaly"].any()
    assert (mondays["n_events"] == 60).all()
