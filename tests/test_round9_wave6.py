"""Analytic fixtures for the round-9 sixth wave — the daily-revenue
diagnostics trio (Jarque-Bera / Ljung-Box / runs test) against
constructed series with hand-computable statistics, and term
burstiness against a corpus with exact Fano factors."""

from __future__ import annotations

import numpy as np
import pandas as pd

from duckdb_hdfs_spark.queries import load_all
from tests.test_round9_fixtures import _both

D0 = pd.Timestamp("1995-01-01")


def _orders_daily(revs):
    """One order per day: day i (offset from 1995-01-01) grosses
    revs[i]."""
    rows = [
        (i + 1, 1, "F", float(r), D0 + pd.Timedelta(days=i), "1-URGENT")
        for i, r in enumerate(revs)
    ]
    o = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    o["o_orderdate"] = o["o_orderdate"].astype("datetime64[us]")
    return {"orders": o}


# --------------------------------------------------------------------------
def test_jarque_bera_symmetric_vs_skewed(spark, tmp_path):
    """A short symmetric discrete-uniform series (platykurtic but
    symmetric → small JB at n=40, verdict normal) vs a heavily
    right-skewed series (one-sided spikes → JB blows up).  Both
    engines must match; moments cross-checked in numpy."""
    from duckdb_hdfs_spark.queries.advanced import _jarque_bera_oracle

    (tmp_path / "sym").mkdir()
    (tmp_path / "skw").mkdir()
    sym = [1000.0, 2000.0, 3000.0, 4000.0, 5000.0] * 8
    got, want = _both(
        spark, tmp_path / "sym", "stats_jarque_bera",
        _jarque_bera_oracle(), _orders_daily(sym), ["n_days"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.iloc[0]
    x = np.array(sym)
    m2 = ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    assert r["n_days"] == 40
    assert abs(r["skewness"] - m3 / m2**1.5) < 1e-6
    assert abs(r["kurtosis"] - m4 / m2**2) < 1e-6
    jb = 40 / 6 * ((m3 / m2**1.5) ** 2 + (m4 / m2**2 - 3) ** 2 / 4)
    assert abs(r["jb_stat"] - jb) < 1e-3
    assert r["normal_5pct"]  # JB ≈ 2.8 < 5.991

    skw = [1000.0] * 36 + [50000.0] * 4
    got2, want2 = _both(
        spark, tmp_path / "skw", "stats_jarque_bera",
        _jarque_bera_oracle(), _orders_daily(skw), ["n_days"],
    )
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)
    assert got2.iloc[0]["skewness"] > 1.5
    assert not got2.iloc[0]["normal_5pct"]


# --------------------------------------------------------------------------
def test_ljung_box_weekly_cycle_flagged(spark, tmp_path):
    """A hard weekly cycle (+5000 every 7th day) must put a strong
    positive spike at lag 7 and blow the Q statistic past χ²(7);
    ACF cross-checked against numpy's calendar-lag formula."""
    from duckdb_hdfs_spark.queries.advanced import _ljung_box_oracle

    revs = [1000.0 + (5000.0 if i % 7 == 0 else 0.0) for i in range(84)]
    got, want = _both(
        spark, tmp_path, "stats_ljung_box",
        _ljung_box_oracle(), _orders_daily(revs), ["lag"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    x = np.array(revs)
    xc = x - x.mean()
    s0 = (xc**2).sum()
    for _, row in got.iterrows():
        k = int(row["lag"])
        rk = (xc[:-k] * xc[k:]).sum() / s0
        assert abs(row["acf"] - rk) < 1e-6, k
        assert row["n_pairs"] == 84 - k
    acf = dict(zip(got["lag"], got["acf"]))
    assert acf[7] > 0.5  # the cycle
    assert not got["white_noise_5pct"].any()


# --------------------------------------------------------------------------
def test_runs_test_oscillation_and_regimes(spark, tmp_path):
    """Perfect daily alternation → runs = n (max possible), z ≫ 1.96,
    flagged; a two-regime year (low half, high half) → runs = 2,
    z ≪ −1.96, flagged.  E[R] checked against 2n₁n₂/n + 1."""
    from duckdb_hdfs_spark.queries.advanced import _runs_test_oracle

    (tmp_path / "alt").mkdir()
    (tmp_path / "reg").mkdir()
    alt = [1000.0 if i % 2 == 0 else 3000.0 for i in range(60)]
    got, want = _both(
        spark, tmp_path / "alt", "stats_runs_test",
        _runs_test_oracle(), _orders_daily(alt), ["yr"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.iloc[0]
    assert r["yr"] == 1995
    assert r["n_above"] == 30 and r["n_below"] == 30
    assert r["runs"] == 60
    assert r["expected_runs"] == round(2 * 30 * 30 / 60 + 1, 6)
    assert r["z_stat"] > 1.96 and r["nonrandom_5pct"]

    reg = [1000.0] * 30 + [3000.0] * 30
    got2, want2 = _both(
        spark, tmp_path / "reg", "stats_runs_test",
        _runs_test_oracle(), _orders_daily(reg), ["yr"],
    )
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)
    r2 = got2.iloc[0]
    assert r2["runs"] == 2
    assert r2["z_stat"] < -1.96 and r2["nonrandom_5pct"]


# --------------------------------------------------------------------------
def test_burstiness_exact_fano(spark, tmp_path):
    """20 docs: 'bursty' appears 10× in 5 docs (Fano 7.5 exactly),
    'flat' once in every doc (Fano 0 — a constant), filler terms
    below the df floor are pruned.  Exact values, both engines."""
    from duckdb_hdfs_spark.queries.text import _burstiness_oracle

    texts = []
    for i in range(20):
        parts = ["flat"]
        if i < 5:
            parts += ["bursty"] * 10
        parts += [f"rare{i}"]  # df=1 each → pruned by the df≥5 floor
        texts.append(" ".join(parts))
    docs = pd.DataFrame(
        {
            "doc_id": range(20),
            "text": texts,
            "lang": ["en"] * 20,
            "source": ["s"] * 20,
            "n_chars": [len(t) for t in texts],
        }
    )
    got, want = _both(
        spark, tmp_path, "text_term_burstiness",
        _burstiness_oracle(), {"documents": docs}, ["term"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    by_term = got.set_index("term")
    # bursty: mean = 50/20, E[c²] = 500/20 → var = 18.75, fano = 7.5
    assert by_term.loc["bursty", "fano"] == 7.5
    assert by_term.loc["bursty", "df"] == 5
    assert by_term.loc["bursty", "total_tf"] == 50
    # flat: every doc exactly once → zero variance
    assert by_term.loc["flat", "fano"] == 0.0
    assert not any(t.startswith("rare") for t in by_term.index)


def test_burstiness_topk_is_bounded_heap(spark, sf_dir):
    """The global top-k must plan as TakeOrderedAndProject, never a
    partition-less global Sort."""
    from duckdb_hdfs_spark.queries import load_all

    plan = (
        load_all()["text_term_burstiness"]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
