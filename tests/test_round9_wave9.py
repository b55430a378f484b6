"""Analytic fixtures for the round-9 final wave: id-audit gap/dup
accounting, clustering-coefficient exactness on constructed cliques,
and conversion-latency quantiles against numpy interpolation."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.test_round9_fixtures import _both, _events_frame

D0 = pd.Timestamp("1995-01-01")
T0 = pd.Timestamp("2024-01-01 00:00:00")


def _orders_ids(ids):
    rows = [
        (i, 1, "F", 100.0, D0, "1-URGENT") for i in ids
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


def test_id_audit_dupes_and_gaps(spark, tmp_path):
    """ids [1,2,2,5,9]: one duplicate, span 9, distinct 4 → 5 gaps;
    both verdicts false.  A contiguous run flips both verdicts."""
    from duckdb_hdfs_spark.queries import load_all

    (tmp_path / "bad").mkdir()
    (tmp_path / "ok").mkdir()
    oracle = load_all()["dq_monotonic_id_audit"].oracle
    got, want = _both(
        spark, tmp_path / "bad", "dq_monotonic_id_audit", oracle,
        _orders_ids([1, 2, 2, 5, 9]), ["n_rows"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.iloc[0]
    assert (r["n_rows"], r["n_distinct"], r["n_duplicates"]) == (5, 4, 1)
    assert (r["id_span"], r["n_gaps"]) == (9, 5)
    assert not r["ids_unique"] and not r["ids_contiguous"]

    got2, want2 = _both(
        spark, tmp_path / "ok", "dq_monotonic_id_audit", oracle,
        _orders_ids(list(range(10, 20))), ["n_rows"],
    )
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)
    r2 = got2.iloc[0]
    assert r2["ids_unique"] and r2["ids_contiguous"] and r2["n_gaps"] == 0
    assert r2["density"] == 1.0


def test_clustering_coeff_cliques_exact(spark, tmp_path):
    """A 3-clique and a 4-clique (two groups of identical docs):
    triangles = 1+4, wedges = 3+12, C = 3·5/15 = 1.0 exactly."""
    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.queries.graph import _clustering_oracle

    t1 = "alpha beta gamma delta epsilon zeta eta theta " * 6
    t2 = "one two three four five six seven eight nine ten " * 6
    docs = pd.DataFrame(
        {
            "doc_id": range(7),
            "text": [t1] * 3 + [t2] * 4,
            "lang": ["en"] * 7,
            "source": ["s"] * 7,
            "n_chars": [len(t1)] * 3 + [len(t2)] * 4,
        }
    )
    got, want = _both(
        spark, tmp_path, "graph_clustering_coeff", _clustering_oracle(),
        {"documents": docs}, ["n_nodes"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.iloc[0]
    assert (r["n_nodes"], r["n_edges"]) == (7, 3 + 6)
    assert r["n_triangles"] == 5 and r["n_wedges"] == 15
    assert r["global_clustering"] == 1.0


def test_conversion_latency_quantiles_numpy(spark, tmp_path):
    """Ten converting views with delays 1..10 minutes: quantiles must
    match numpy's linear interpolation; p99/p50 ratio rechecked."""
    from duckdb_hdfs_spark.queries.events import _conv_latency_oracle

    rows = []
    eid = 0
    for u in range(10):
        view = T0 + pd.Timedelta(hours=u)
        rows.append((eid, view, u, "view", 1.0, "{}")); eid += 1
        rows.append(
            (eid, view + pd.Timedelta(minutes=u + 1), u, "purchase", 1.0, "{}")
        ); eid += 1
    got, want = _both(
        spark, tmp_path, "ev_conversion_latency_quantiles",
        _conv_latency_oracle(), {"events": _events_frame(rows)},
        ["n_conversions"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.iloc[0]
    delays = np.array([(u + 1) * 60.0 for u in range(10)])
    assert r["n_conversions"] == 10
    for col, q in [("p25_s", 0.25), ("p50_s", 0.5), ("p90_s", 0.9),
                   ("p99_s", 0.99)]:
        assert r[col] == round(float(np.quantile(delays, q, method="linear")), 3)
    assert r["p99_to_p50"] == round(
        float(np.quantile(delays, 0.99, method="linear"))
        / float(np.quantile(delays, 0.5, method="linear")), 4
    )
