"""Analytic + adversarial fixtures for the round-9 fourth-wave
operators: Nelson-Aalen survival (hand-computed hazard ladder with
real censoring), Kendall's τ-b (perfect concordance and tie
correction), Benford digit audit (law-conforming vs uniform-digit
populations), and the zone-map pruning panel's layout ordering."""

from __future__ import annotations

import math

import pandas as pd

from duckdb_hdfs_spark.queries import load_all
from tests.test_round9_fixtures import _both, _events_frame

T0 = pd.Timestamp("2024-01-01 00:00:00")


def _h(hours: float) -> pd.Timestamp:
    return T0 + pd.Timedelta(hours=hours)


# --------------------------------------------------------------------------
def test_nelson_aalen_hand_computed_ladder(spark, tmp_path):
    """4 subjects with known fates: A converts in bucket 0, D is
    censored in bucket 0 (stream ends 30 min after the view), B
    converts in bucket 5, C is censored in bucket 10 — so
    n_at_risk = 4, 2, 1 and H = 0.25, 0.75, 0.75 exactly."""
    from duckdb_hdfs_spark.queries.events import _nelson_aalen_oracle

    ev = _events_frame(
        [
            (0, _h(0.0), 1, "view", 1.0, "{}"),        # A: event @ +30min
            (1, _h(0.5), 1, "purchase", 1.0, "{}"),
            (2, _h(1.0), 2, "view", 1.0, "{}"),        # B: event @ +5.5h
            (3, _h(6.5), 2, "purchase", 1.0, "{}"),
            (4, _h(30.0), 3, "view", 1.0, "{}"),       # C: censored @ +10.5h
            (5, _h(40.0), 4, "view", 1.0, "{}"),       # D: censored @ +0.5h
            (6, _h(40.5), 5, "click", 1.0, "{}"),      # sets max(ts)
        ]
    )
    got, want = _both(
        spark,
        tmp_path,
        "ev_nelson_aalen",
        _nelson_aalen_oracle(),
        {"events": ev},
        ["hour_bucket"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert list(got["hour_bucket"]) == [0, 5, 10]
    assert list(got["n_at_risk"]) == [4, 2, 1]
    assert list(got["d_events"]) == [1, 1, 0]
    assert list(got["c_censored"]) == [1, 0, 1]
    assert list(got["hazard"]) == [0.25, 0.5, 0.0]
    assert list(got["cum_hazard"]) == [0.25, 0.75, 0.75]
    assert list(got["survival_est"]) == [
        round(math.exp(-0.25), 6),
        round(math.exp(-0.75), 6),
        round(math.exp(-0.75), 6),
    ]


def test_nelson_aalen_monotone_on_sf_data(spark, sf_dir):
    """Structural invariants on real data: at-risk strictly decreases,
    cumulative hazard never decreases, and every subject is accounted
    for (Σ(d+c) = n_at_risk of the first bucket)."""
    df = (
        load_all()["ev_nelson_aalen"]
        .spark(spark, sf_dir)
        .toPandas()
        .sort_values("hour_bucket")
        .reset_index(drop=True)
    )
    assert df["n_at_risk"].is_monotonic_decreasing
    assert df["cum_hazard"].is_monotonic_increasing
    assert (df["d_events"] + df["c_censored"]).sum() == df["n_at_risk"].iloc[0]
    assert (df["survival_est"] > 0).all() and (df["survival_est"] <= 1).all()


# --------------------------------------------------------------------------
def _orders_customer(panel):
    """Build orders+customer parquet frames realizing a per-nation
    (revenue, n_customers) panel: nation k gets panel[k][1] customers
    with one order each of panel[k][0]/n value."""
    cust, orders, ck, ok = [], [], 1, 1
    for nk, (rev, ncust) in enumerate(panel):
        for _ in range(ncust):
            cust.append((ck, f"c{ck}", nk, 0.0, "SEG"))
            orders.append(
                (ok, ck, "F", rev / ncust, pd.Timestamp("2020-01-01"), "1-URGENT")
            )
            ck += 1
            ok += 1
    c = pd.DataFrame(
        cust,
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    c["c_nationkey"] = c["c_nationkey"].astype("int32")
    o = pd.DataFrame(
        orders,
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
    return {"orders": o, "customer": c}


def test_kendall_tau_perfect_concordance(spark, tmp_path):
    """Revenue and customer count strictly co-monotone across 5
    nations → every pair concordant, τ-b = 1, z > 0."""
    from duckdb_hdfs_spark.queries.advanced import _kendall_tau_oracle

    tables = _orders_customer(
        [(1000.0, 1), (2000.0, 2), (3000.0, 3), (4000.0, 4), (5000.0, 5)]
    )
    got, want = _both(
        spark, tmp_path, "stats_kendall_tau", _kendall_tau_oracle(), tables,
        ["n_groups"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.iloc[0]
    assert r["n_groups"] == 5 and r["n_pairs"] == 10
    assert r["concordant"] == 10 and r["discordant"] == 0
    assert r["tau_b"] == 1.0 and r["z_stat"] > 0


def test_kendall_tau_tie_correction(spark, tmp_path):
    """Two nations tied on customer count: the tied pair counts in
    neither C nor D, and the τ-b denominator shrinks by the y-tie —
    cross-checked against a brute-force pairwise count in Python."""
    from duckdb_hdfs_spark.queries.advanced import _kendall_tau_oracle

    panel = [(1000.0, 2), (2000.0, 2), (3000.0, 5), (4000.0, 1)]
    tables = _orders_customer(panel)
    got, want = _both(
        spark, tmp_path, "stats_kendall_tau", _kendall_tau_oracle(), tables,
        ["n_groups"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    xs = [p[0] for p in panel]
    ys = [p[1] for p in panel]
    c = d = tx = ty = 0
    n = len(panel)
    for i in range(n):
        for j in range(i + 1, n):
            px = (xs[i] - xs[j]) * (ys[i] - ys[j])
            c += px > 0
            d += px < 0
            tx += xs[i] == xs[j]
            ty += ys[i] == ys[j]
    n0 = n * (n - 1) // 2
    tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
    r = got.iloc[0]
    assert (r["concordant"], r["discordant"]) == (c, d)
    assert (r["ties_x"], r["ties_y"]) == (tx, ty)
    assert r["tau_b"] == round(tau, 6)


# --------------------------------------------------------------------------
def _orders_for_digits(counts):
    """One order per unit count: digit d contributes counts[d-1]
    orders with totalprice d·1000 + i (first digit stays d)."""
    rows, ok = [], 1
    for d, n in enumerate(counts, start=1):
        for i in range(n):
            rows.append(
                (ok, 1, "F", d * 1000.0 + i, pd.Timestamp("2020-01-01"), "1-URGENT")
            )
            ok += 1
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


def test_benford_conforming_population(spark, tmp_path):
    """Digit counts proportional to log10(1+1/d) (×1000) → χ² far
    under the 15.507 bar, conforms flag set, and p_expected matches
    the law computed independently in Python."""
    from duckdb_hdfs_spark.queries.dq import _benford_oracle

    counts = [round(1000 * math.log10(1 + 1 / d)) for d in range(1, 10)]
    got, want = _both(
        spark, tmp_path, "dq_benford_digits", _benford_oracle(),
        _orders_for_digits(counts), ["digit"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert list(got["digit"]) == list(range(1, 10))
    for _, r in got.iterrows():
        assert r["p_expected"] == round(math.log10(1 + 1 / r["digit"]), 9)
    assert (got["chi2_stat"] < 1.0).all()
    assert got["conforms_5pct"].all()


def test_benford_uniform_digits_flagged(spark, tmp_path):
    """A uniform digit distribution (the classic fabricated-data
    signature) must blow past the χ² bar and trip the alarm."""
    from duckdb_hdfs_spark.queries.dq import _benford_oracle

    got, want = _both(
        spark, tmp_path, "dq_benford_digits", _benford_oracle(),
        _orders_for_digits([111] * 9), ["digit"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["chi2_stat"] > 15.507).all()
    assert not got["conforms_5pct"].any()


# --------------------------------------------------------------------------
def test_zonemap_clustered_layout_dominates(spark, sf_dir):
    """The panel's punchline must hold on real data: for every
    predicate the shipdate-clustered layout skips at least as much
    as arrival order and prunes >80% of rows; accounting closes
    (rows_total = |lineitem|, zones_skipped ≤ zones_total)."""
    df = load_all()["layout_zonemap_prune"].spark(spark, sf_dir).toPandas()
    n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert set(df["layout"]) == {"arrival", "clustered"}
    assert (df["rows_total"] == n_li).all()
    assert (df["zones_skipped"] <= df["zones_total"]).all()
    piv = df.pivot(index="predicate", columns="layout", values="skip_ratio")
    assert (piv["clustered"] >= piv["arrival"]).all()
    assert (piv["clustered"] > 0.8).all()
