"""Analytic + adversarial fixtures for the round-9 fifth-wave
operators: MDE power panel (zero-conversion degenerate), Brown-
Forsythe (constructed equal vs wildly-unequal spreads + an
independent numpy recomputation), linear counting (accuracy on a
known-cardinality fixture), and degree assortativity (regular-graph
zero-variance degenerate + numpy cross-check on real data)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from duckdb_hdfs_spark.queries import load_all
from tests.test_round9_fixtures import _both, _events_frame

T0 = pd.Timestamp("2024-01-01 00:00:00")


# --------------------------------------------------------------------------
def test_power_mde_zero_conversion_degenerate(spark, tmp_path):
    """No purchases at all → pooled rate 0, the relative MDE NULLs
    through the mirrored guard on BOTH engines, and the absolute MDE
    is exactly 0 (√(2·0·1/n))."""
    from duckdb_hdfs_spark.queries.events import _power_mde_oracle

    ev = _events_frame(
        [
            (i, T0 + pd.Timedelta(minutes=i), i % 40, "view", 1.0, "{}")
            for i in range(200)
        ]
    )
    got, want = _both(
        spark, tmp_path, "ev_power_mde", _power_mde_oracle(),
        {"events": ev}, ["n_users_a"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.iloc[0]
    assert r["pooled_rate"] == 0.0
    assert r["mde_abs_80pct"] == 0.0
    assert pd.isna(r["mde_rel_80pct"])
    assert r["n_users_a"] + r["n_users_b"] == 40


def test_power_mde_formula_on_sf_data(spark, sf_dir):
    """Recompute the MDE from the panel's own integer columns in
    Python — the operator must be exactly the published formula."""
    df = load_all()["ev_power_mde"].spark(spark, sf_dir).toPandas()
    r = df.iloc[0]
    n_min = min(r["n_users_a"], r["n_users_b"])
    p = r["pooled_rate"]
    # pooled_rate is rounded(6) on output; recompute from rates
    ca = round(r["conv_rate_a"] * r["n_users_a"])
    cb = round(r["conv_rate_b"] * r["n_users_b"])
    p_exact = (ca + cb) / (r["n_users_a"] + r["n_users_b"])
    assert abs(p - round(p_exact, 6)) < 1e-12
    mde = 2.801585 * math.sqrt(2 * p_exact * (1 - p_exact) / n_min)
    assert r["mde_abs_80pct"] == round(mde, 6)
    assert r["mde_rel_80pct"] == round(mde / p_exact, 6)
    assert bool(r["powered_for_10pct_lift"]) == (mde / p_exact <= 0.10)


# --------------------------------------------------------------------------
def _lineitem_spreads(spread_b: float):
    """Two groups with identical medians, group B's spread scaled."""
    rows = []
    base = [-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0] * 20
    for i, v in enumerate(base):
        rows.append(("A", 50.0 + v))
        rows.append(("B", 50.0 + v * spread_b))
    return pd.DataFrame(rows, columns=["l_returnflag", "l_quantity"])


def test_brown_forsythe_equal_vs_unequal_spreads(spark, tmp_path):
    """Equal spreads → W ≈ 0, not significant; 50× spread → W large,
    flagged — and both fixtures hash-match the oracle."""
    from duckdb_hdfs_spark.queries.advanced import _brown_forsythe_oracle

    (tmp_path / "eq").mkdir()
    (tmp_path / "ne").mkdir()
    got_eq, want_eq = _both(
        spark, tmp_path / "eq", "stats_brown_forsythe",
        _brown_forsythe_oracle(), {"lineitem": _lineitem_spreads(1.0)},
        ["grp"],
    )
    pd.testing.assert_frame_equal(got_eq, want_eq, check_dtype=False)
    assert not got_eq["variances_differ_5pct"].any()
    assert (got_eq["w_stat"] == 0.0).all()  # identical z-panels

    got_ne, want_ne = _both(
        spark, tmp_path / "ne", "stats_brown_forsythe",
        _brown_forsythe_oracle(), {"lineitem": _lineitem_spreads(50.0)},
        ["grp"],
    )
    pd.testing.assert_frame_equal(got_ne, want_ne, check_dtype=False)
    assert got_ne["variances_differ_5pct"].all()
    assert (got_ne["w_stat"] > 100).all()


def test_brown_forsythe_matches_numpy(spark, sf_dir):
    """Independent recomputation: the W statistic on real data must
    equal scipy's levene(center='median') formula evaluated in
    numpy over the same rounded-z panel."""
    df = (
        load_all()["stats_brown_forsythe"]
        .spark(spark, sf_dir)
        .toPandas()
        .sort_values("grp")
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_quantity")
        .toPandas()
    )
    groups = []
    for g in sorted(li["l_returnflag"].unique()):
        x = li.loc[li["l_returnflag"] == g, "l_quantity"].to_numpy()
        z = np.round(np.abs(x - np.quantile(x, 0.5, method="linear")), 4)
        groups.append(z)
    k = len(groups)
    n = sum(len(z) for z in groups)
    zbar = np.concatenate(groups).mean()
    between = sum(len(z) * (z.mean() - zbar) ** 2 for z in groups) / (k - 1)
    within = sum(((z - z.mean()) ** 2).sum() for z in groups) / (n - k)
    w = between / within
    assert abs(df["w_stat"].iloc[0] - w) < 1e-3 * max(1.0, abs(w))


# --------------------------------------------------------------------------
def test_linear_counting_known_cardinality(spark, tmp_path):
    """5,000 distinct users in one event type: LC at m=65536 (load
    0.076) must estimate within 5% and the panel must hash-match the
    oracle; occupancy can never exceed the true cardinality."""
    from duckdb_hdfs_spark.queries.sketches import _linear_counting_oracle

    ev = _events_frame(
        [
            (i, T0 + pd.Timedelta(seconds=i), i % 5000, "view", 1.0, "{}")
            for i in range(10000)
        ]
    )
    got, want = _both(
        spark, tmp_path, "sketch_linear_counting",
        _linear_counting_oracle(), {"events": ev}, ["event_type"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.iloc[0]
    assert r["n_exact"] == 5000
    assert r["occupied_buckets"] <= 5000
    assert abs(r["lc_est"] - 5000) / 5000 <= 0.05
    assert r["within_bound"]


def test_linear_counting_estimate_dominates_occupancy(spark, sf_dir):
    """-m·ln(1-V/m) ≥ V always (collision correction only adds), and
    the audited bound holds on real data for every event type."""
    df = load_all()["sketch_linear_counting"].spark(spark, sf_dir).toPandas()
    assert (df["lc_est"] >= df["occupied_buckets"]).all()
    assert df["within_bound"].all()


# --------------------------------------------------------------------------
def test_assortativity_regular_graph_degenerate(spark, tmp_path):
    """Five identical documents form a 5-clique in the LSH candidate
    graph: every degree is 4, endpoint-degree variance is 0, and the
    correlation must NULL through the mirrored guard on BOTH
    engines (never a division blow-up)."""
    from duckdb_hdfs_spark.queries.graph import _assortativity_oracle

    text = "the quick brown fox jumps over the lazy dog " * 8
    docs = pd.DataFrame(
        {
            "doc_id": range(5),
            "text": [text] * 5,
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [len(text)] * 5,
        }
    )
    got, want = _both(
        spark, tmp_path, "graph_degree_assortativity",
        _assortativity_oracle(), {"documents": docs}, ["n_nodes"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.iloc[0]
    assert r["n_nodes"] == 5 and r["n_edges"] == 10
    assert r["mean_degree"] == 4.0
    assert pd.isna(r["assortativity"])


def test_assortativity_matches_numpy(spark, sf_dir):
    """Recompute Newman's r in numpy from the same candidate pairs
    the operator consumes — exact same directed-edge convention."""
    from duckdb_hdfs_spark.operators.dedup import minhash_candidate_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_candidate_pairs(docs).toPandas()
    df = load_all()["graph_degree_assortativity"].spark(spark, sf_dir).toPandas()
    src = np.concatenate([pairs["doc_a"], pairs["doc_b"]])
    dst = np.concatenate([pairs["doc_b"], pairs["doc_a"]])
    deg = pd.Series(src).value_counts()
    x = deg.reindex(src).to_numpy(dtype=float)
    y = deg.reindex(dst).to_numpy(dtype=float)
    r = np.corrcoef(x, y)[0, 1]
    got = df["assortativity"].iloc[0]
    assert df["n_edges"].iloc[0] == len(pairs)
    assert abs(got - r) < 1e-4
