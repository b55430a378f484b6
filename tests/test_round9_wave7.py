"""Analytic fixtures + cross-op consistency checks for the round-9
seventh wave: hubness (accounting identities + numpy recompute),
IQR outliers (constructed spike tail), Cramér's V (perfect vs
independent tables), and langid metrics (recomputed from the
sibling confusion-matrix operator's own output)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from duckdb_hdfs_spark.queries import load_all
from tests.test_round9_fixtures import _both

D0 = pd.Timestamp("1995-01-01")


# --------------------------------------------------------------------------
def test_hubness_accounting_and_numpy(spark, sf_dir):
    """Slot accounting must close exactly (Σ k·n_vectors = 5·probes,
    Σ n_vectors = corpus size) and the skewness must match a numpy
    recomputation of the same k-occurrence moments."""
    from duckdb_hdfs_spark.queries.similarity import HUB_K, HUB_STRIDE

    df = (
        load_all()["sim_hubness_koccurrence"]
        .spark(spark, sf_dir)
        .toPandas()
        .sort_values("k_occurrence")
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    n_corpus = len(emb)
    n_probes = (emb["vec_id"] % HUB_STRIDE == 0).sum()
    assert (df["n_probes"] == n_probes).all()
    assert (df["k_occurrence"] * df["n_vectors"]).sum() == n_probes * HUB_K
    assert df["n_vectors"].sum() == n_corpus
    # numpy skewness of the full N_k array (zeros expanded)
    nk = np.repeat(df["k_occurrence"].to_numpy(), df["n_vectors"].to_numpy())
    m1 = nk.mean()
    m2 = ((nk - m1) ** 2).mean()
    m3 = ((nk - m1) ** 3).mean()
    assert abs(df["occurrence_skewness"].iloc[0] - m3 / m2**1.5) < 1e-4


# --------------------------------------------------------------------------
def test_iqr_outliers_constructed_spikes(spark, tmp_path):
    """One priority class: 96 values in [100, 195] and 4 spikes at
    10,000 — the spikes sit beyond q3 + 1.5·IQR, the bulk does not;
    quartiles cross-checked against numpy's linear interpolation."""
    from duckdb_hdfs_spark.queries.dq import _iqr_oracle

    vals = [100.0 + i for i in range(96)] + [10000.0] * 4
    rows = [
        (i + 1, 1, "F", v, D0 + pd.Timedelta(days=i), "1-URGENT")
        for i, v in enumerate(vals)
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
    got, want = _both(
        spark, tmp_path, "dq_iqr_outliers", _iqr_oracle(),
        {"orders": o}, ["priority"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.iloc[0]
    x = np.array(vals)
    assert r["q1"] == round(float(np.quantile(x, 0.25, method="linear")), 4)
    assert r["q3"] == round(float(np.quantile(x, 0.75, method="linear")), 4)
    assert r["n_high"] == 4 and r["n_low"] == 0
    assert r["outlier_share"] == 0.04


# --------------------------------------------------------------------------
def _orders_customer_seg(pairs):
    """orders+customer realizing (segment, priority, n) cell counts."""
    cust, orders, ck, ok = [], [], 1, 1
    for seg, prio, n in pairs:
        for _ in range(n):
            cust.append((ck, f"c{ck}", 0, 0.0, seg))
            orders.append((ok, ck, "F", 100.0, D0, prio))
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


def test_cramers_v_perfect_and_independent(spark, tmp_path):
    """Segment determines priority 1:1 → V = 1 exactly; a uniform
    2×2 grid → χ² = 0 → V = 0 (and the corrected V's max(0, ·)
    guard fires rather than going negative)."""
    from duckdb_hdfs_spark.queries.advanced import _cramers_v_oracle

    (tmp_path / "p").mkdir()
    (tmp_path / "i").mkdir()
    perfect = [("AUTO", "1-URGENT", 30), ("BLDG", "2-HIGH", 30),
               ("FURN", "3-MEDIUM", 30)]
    got, want = _both(
        spark, tmp_path / "p", "stats_cramers_v", _cramers_v_oracle(),
        _orders_customer_seg(perfect), ["n"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.iloc[0]
    assert r["cramers_v"] == 1.0 and r["association"] == "strong"

    indep = [("AUTO", "1-URGENT", 25), ("AUTO", "2-HIGH", 25),
             ("BLDG", "1-URGENT", 25), ("BLDG", "2-HIGH", 25)]
    got2, want2 = _both(
        spark, tmp_path / "i", "stats_cramers_v", _cramers_v_oracle(),
        _orders_customer_seg(indep), ["n"],
    )
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)
    r2 = got2.iloc[0]
    assert r2["chi2"] == 0.0 and r2["cramers_v"] == 0.0
    assert r2["cramers_v_corrected"] == 0.0
    assert r2["association"] == "negligible"


# --------------------------------------------------------------------------
def test_langid_metrics_consistent_with_confusion(spark, sf_dir):
    """The metrics panel must be exactly the precision/recall/F1
    algebra applied to text_langid's own confusion counts."""
    reg = load_all()
    conf = reg["text_langid"].spark(spark, sf_dir).toPandas()
    met = reg["text_langid_metrics"].spark(spark, sf_dir).toPandas()
    total = conf["n_docs"].sum()
    correct = conf.loc[conf.pred_lang == conf.actual_lang, "n_docs"].sum()
    assert (met["overall_accuracy"] == round(correct / total, 6)).all()
    for _, r in met.iterrows():
        lang = r["lang"]
        support = conf.loc[conf.actual_lang == lang, "n_docs"].sum()
        pred_n = conf.loc[conf.pred_lang == lang, "n_docs"].sum()
        tp = conf.loc[
            (conf.pred_lang == lang) & (conf.actual_lang == lang), "n_docs"
        ].sum()
        assert r["support"] == support and r["tp"] == tp
        if pred_n:
            assert r["precision_"] == round(tp / pred_n, 6)
        else:
            assert pd.isna(r["precision_"])
        assert r["recall_"] == round(tp / support, 6)
        if pred_n + support:
            assert r["f1"] == round(2 * tp / (pred_n + support), 6)
