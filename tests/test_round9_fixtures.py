"""Adversarial branch fixtures for the round-9 second-wave operators
(the review-wave discipline): the sf test data never exercises the
degenerate guards — zero-variance panels, disjoint sets, punctuation-
free documents, sub-head vocabularies — so feed constructed tables
through BOTH engines and require identical panels, then assert the
guarded branch actually fired."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from duckdb_hdfs_spark.queries import load_all


def _both(spark, tmp_path, key, oracle_sql, tables, sort_cols):
    """Run registry key + its oracle over fixture parquet tables and
    return (spark_df, duckdb_df) normalized for exact compare."""
    con = duckdb.connect()
    for name, df in tables.items():
        p = tmp_path / f"{name}.parquet"
        df.to_parquet(p)
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    got = (
        load_all()[key]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values(sort_cols)
        .reset_index(drop=True)
    )
    want = con.execute(oracle_sql).df().sort_values(sort_cols).reset_index(drop=True)
    got = got[sorted(got.columns)].astype(object).where(lambda d: d.notna(), np.nan)
    want = want[sorted(want.columns)].astype(object).where(lambda d: d.notna(), np.nan)
    return got, want


def _events_frame(rows):
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    return ev


# --------------------------------------------------------------------------
def test_spearman_degenerate_panels_match(spark, tmp_path):
    """Three panels the sf lineitem can never produce: 'C' has zero
    variance on both axes (rho NULL via the sqrt-guard), 'P' is a
    perfect monotone map (rho=1, so 1-rho^2=0 fires the t-stat
    guard), 'N' is ordinary.  Both engines must agree row-for-row."""
    from duckdb_hdfs_spark.queries.advanced import _spearman_oracle

    rows = []
    for i in range(12):
        rows.append(("C", 7.0, 100.0))                  # constant/constant
        rows.append(("P", float(i + 1), float(10 * (i + 1))))  # perfect
        rows.append(("N", float(i % 4 + 1), float((i * 37) % 11)))
    li = pd.DataFrame(rows, columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    got, want = _both(
        spark, tmp_path, "stats_spearman_corr", _spearman_oracle(),
        {"lineitem": li}, ["flag"],
    )
    assert got.astype(str).equals(want.astype(str)), (got, want)
    by = got.set_index("flag")
    assert np.isnan(by.loc["C", "spearman_rho"])      # sqrt guard fired
    assert by.loc["P", "spearman_rho"] == 1.0
    assert np.isnan(by.loc["P", "t_stat"])            # 1-rho^2 guard fired
    assert abs(by.loc["N", "spearman_rho"]) < 1.0


# --------------------------------------------------------------------------
def test_kmv_jaccard_disjoint_pair_matches(spark, tmp_path):
    """A type pair with NO shared users exercises the left-join
    coalesce-0 branch (sf event types all overlap heavily); a third
    type overlaps both.  Panels must match exactly."""
    from duckdb_hdfs_spark.queries.sketches import _kmv_jaccard_oracle

    rows, eid = [], 0
    for u in range(1, 21):
        rows.append((eid, pd.Timestamp(2024, 1, 1, 8, 0, u % 60), u, "alpha", 1.0, "{}"))
        eid += 1
    for u in range(100, 120):  # disjoint from alpha
        rows.append((eid, pd.Timestamp(2024, 1, 1, 9, 0, u % 60), u, "beta", 1.0, "{}"))
        eid += 1
    for u in list(range(1, 11)) + list(range(100, 110)):  # overlaps both
        rows.append((eid, pd.Timestamp(2024, 1, 1, 10, 0, u % 60), u, "gamma", 1.0, "{}"))
        eid += 1
    got, want = _both(
        spark, tmp_path, "sketch_kmv_jaccard", _kmv_jaccard_oracle(),
        {"events": _events_frame(rows)}, ["type_a", "type_b"],
    )
    assert got.astype(str).equals(want.astype(str)), (got, want)
    ab = got.set_index(["type_a", "type_b"])
    assert ab.loc[("alpha", "beta"), "inter_exact"] == 0       # coalesce branch
    assert ab.loc[("alpha", "beta"), "jaccard_exact"] == 0.0
    assert ab.loc[("alpha", "beta"), "kmv_jaccard_est"] == 0.0  # sketch agrees
    assert ab.loc[("alpha", "gamma"), "inter_exact"] == 10


# --------------------------------------------------------------------------
def test_bh_fdr_separates_real_effect_from_null(spark, tmp_path):
    """A constructed stream where two hours carry a large value shift
    and the rest are homogeneous: BH must reject the shifted hours
    and keep the null hours, identically on both engines (the sf
    stream is a global null — the rejected branch never fires)."""
    from duckdb_hdfs_spark.queries.advanced import _bh_fdr_oracle

    rows, eid = [], 0
    for day in range(1, 11):
        for hr in range(6):
            for i in range(10):
                # hours 0,1: strong shift; hours 2-5: N(10)-ish nulls
                base = 100.0 if hr < 2 else 10.0
                val = base + ((eid * 7) % 5) - 2  # deterministic jitter
                rows.append(
                    (eid, pd.Timestamp(2024, 1, day, hr, i, 0), i, "e", val, "{}")
                )
                eid += 1
    got, want = _both(
        spark, tmp_path, "stats_bh_fdr", _bh_fdr_oracle(),
        {"events": _events_frame(rows)}, ["hr"],
    )
    assert got.astype(str).equals(want.astype(str)), (got, want)
    by = got.set_index("hr")
    assert bool(by.loc[0, "rejected_fdr_5pct"]) and bool(by.loc[1, "rejected_fdr_5pct"])
    # shifted hours rank first in the step-up order
    assert set(by.loc[[0, 1], "p_rank"]) == {1, 2}


# --------------------------------------------------------------------------
def test_readability_punctless_and_empty_docs_match(spark, tmp_path):
    """Documents with no sentence punctuation (the greatest(...,1)
    floor) and an empty document (words=0 → NULL syllables/word via
    the mirrored nullif) — both unreachable on the sf corpus."""
    from duckdb_hdfs_spark.queries.text import _readability_oracle

    docs = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": [
                "no punctuation here just words flowing on",  # floor branch
                "",  # zero words → NULL spw
                "One. Two! Three? Short bursts.",
                "the queue sees you aye oui",  # vowel-group stress
            ],
            "lang": ["en"] * 4,
            # the empty doc gets its OWN source so the words=0 ->
            # NULL syllables/word nullif branch actually fires
            # (round-9 review: sharing a source with a worded doc
            # left the guard untested)
            "source": ["pf", "empty", "ok", "ok"],
            "n_chars": [0] * 4,
        }
    )
    got, want = _both(
        spark, tmp_path, "text_readability", _readability_oracle(),
        {"documents": docs}, ["source"],
    )
    assert got.astype(str).equals(want.astype(str)), (got, want)
    by = got.set_index("source")
    assert by.loc["pf", "sentences"] == 1      # punctless doc floored to 1
    assert by.loc["empty", "words"] == 0
    assert np.isnan(by.loc["empty", "syllables_per_word"])  # guard fired


# --------------------------------------------------------------------------
def test_zipf_small_vocab_matches(spark, tmp_path):
    """A corpus with fewer distinct tokens than ZIPF_TOP_N exercises
    the n_ranks < 200 path (head smaller than the heap bound) and a
    frequency tie resolved by the token tiebreak."""
    from duckdb_hdfs_spark.queries.text import ZIPF_TOP_N, _zipf_oracle

    text = " ".join(
        ["alpha"] * 16 + ["beta"] * 8 + ["gamma"] * 8 + ["delta"] * 4 + ["eps"] * 2
    )
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [text, "alpha beta gamma"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [0] * 2,
        }
    )
    got, want = _both(
        spark, tmp_path, "text_zipf_slope", _zipf_oracle(),
        {"documents": docs}, ["n_ranks"],
    )
    assert got.astype(str).equals(want.astype(str)), (got, want)
    assert got.loc[0, "n_ranks"] == 5 < ZIPF_TOP_N
    assert got.loc[0, "zipf_slope"] < 0


# --------------------------------------------------------------------------
def test_gini_boundary_distributions_match(spark, tmp_path):
    """Boundary inequality shapes the sf stream can't hit: a
    single-user type (G=0 by the identity), a perfectly equal
    multi-user type (G=0), and a whale type where one user holds
    almost everything (G near its n-bounded maximum)."""
    from duckdb_hdfs_spark.queries.events import _gini_oracle

    rows, eid = [], 0
    for i in range(5):
        rows.append((eid, pd.Timestamp(2024, 1, 1, 8, 0, i), 1, "solo", 1.0, "{}"))
        eid += 1
    for u in range(1, 5):
        for i in range(3):  # equal: 3 each
            rows.append((eid, pd.Timestamp(2024, 1, 1, 9, u, i), u, "equal", 1.0, "{}"))
            eid += 1
    for u in range(1, 10):
        rows.append((eid, pd.Timestamp(2024, 1, 1, 10, 0, u), u, "whale", 1.0, "{}"))
        eid += 1
    for i in range(91):  # user 10 holds 91 of 100 events
        rows.append((eid, pd.Timestamp(2024, 1, 1, 11, i % 60, i % 60), 10, "whale", 1.0, "{}"))
        eid += 1
    got, want = _both(
        spark, tmp_path, "ev_gini_concentration", _gini_oracle(),
        {"events": _events_frame(rows)}, ["event_type"],
    )
    assert got.astype(str).equals(want.astype(str)), (got, want)
    by = got.set_index("event_type")
    assert by.loc["solo", "gini"] == 0.0
    assert by.loc["equal", "gini"] == 0.0
    assert by.loc["whale", "gini"] > 0.7


# --------------------------------------------------------------------------
def test_psi_drift_fires_on_constructed_shift(spark, tmp_path):
    """The sf orders stream is a global null (eras are statistically
    identical, psi ~ 0) — construct a priority-mix shift so the
    drifted flag actually fires, and a bin present in only one era
    so the Laplace smoothing branch is exercised; panels must match
    across engines."""
    from duckdb_hdfs_spark.queries.dq import _psi_oracle

    rows = []
    for i in range(400):
        era_a = i < 200
        date = pd.Timestamp(1994, 1, 1) if era_a else pd.Timestamp(1996, 1, 1)
        if era_a:
            prio = "1-URGENT" if i % 10 < 8 else "5-LOW"
        else:
            prio = "5-LOW" if i % 10 < 8 else "3-MEDIUM"  # 3-MEDIUM: B-only bin
        rows.append((i, date, prio, "O", 1000.0 + (i % 3) * 30000.0))
    od = pd.DataFrame(
        rows,
        columns=["o_orderkey", "o_orderdate", "o_orderpriority",
                 "o_orderstatus", "o_totalprice"],
    )
    od["o_orderdate"] = od["o_orderdate"].astype("datetime64[us]")
    got, want = _both(
        spark, tmp_path, "dq_psi_drift", _psi_oracle(),
        {"orders": od}, ["col_name"],
    )
    assert got.astype(str).equals(want.astype(str)), (got, want)
    by = got.set_index("col_name")
    assert bool(by.loc["orderpriority", "drifted"])       # the shift fires
    assert not bool(by.loc["orderstatus", "drifted"])     # constant column
    assert int(by.loc["orderpriority", "n_bins"]) == 3    # one-era bin counted


# --------------------------------------------------------------------------
def test_bh_fdr_constant_stream_matches(spark, tmp_path):
    """A globally CONSTANT value stream NULLs every z (the mirrored
    nullif) — p must coalesce to 1.0 on both engines so the BH rank
    stays total and nothing is rejected (round-9 review: the inline
    theta-join rank gave every NULL-p row rank 1 while the oracle's
    row_number ranked NULLS LAST — confirmed divergence, now pinned)."""
    from duckdb_hdfs_spark.queries.advanced import _bh_fdr_oracle

    rows, eid = [], 0
    for day in range(1, 4):
        for hr in range(4):
            for i in range(5):
                rows.append(
                    (eid, pd.Timestamp(2024, 1, day, hr, i, 0), i, "e", 7.0, "{}")
                )
                eid += 1
    got, want = _both(
        spark, tmp_path, "stats_bh_fdr", _bh_fdr_oracle(),
        {"events": _events_frame(rows)}, ["hr"],
    )
    assert got.astype(str).equals(want.astype(str)), (got, want)
    assert (got["p_value"] == 1.0).all()
    assert not got["rejected_fdr_5pct"].any()
    assert sorted(got["p_rank"]) == [1, 2, 3, 4]


# --------------------------------------------------------------------------
def test_lsh_recall_eval_inverted_index_branch(spark, tmp_path):
    """dedup_lsh_recall_eval's GENERIC ground-truth branch (vocabulary
    > 62 distinct tokens → inverted index, not the 64-bit mask scan)
    against the oracle on a constructed corpus — every shipped sf
    fixture has a 31-token vocabulary, so the branch real corpora run
    had zero coverage (round-13 advisor, medium).  The fixture's 80
    distinct tokens force the inverted-index path structurally (the
    limit(63) decision job sees 63 rows), and exact-twin documents
    guarantee a non-empty truth set so the recall arithmetic is
    exercised, not just the empty-corpus NULL path."""
    from duckdb_hdfs_spark.queries import load_all

    qd = load_all()["dedup_lsh_recall_eval"]
    vocab = [f"tok{i:02d}" for i in range(80)]
    rows = []
    for d in range(30):
        toks = [vocab[(d * 7 + j) % 80] for j in range(8)]
        rows.append((d, " ".join(toks)))
    # exact twins of the first six docs: Jaccard 1.0 ≥ 0.5 truth pairs
    for d in range(6):
        toks = [vocab[(d * 7 + j) % 80] for j in range(8)]
        rows.append((100 + d, " ".join(toks)))
    docs = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs["lang"] = "en"
    docs["source"] = "fixture"
    docs["n_chars"] = docs["text"].str.len()
    # structural guarantee the mask path CANNOT take this corpus
    assert len({t for s in docs["text"] for t in s.split()}) > 62
    got, want = _both(
        spark, tmp_path, "dedup_lsh_recall_eval", qd.oracle,
        {"documents": docs}, ["n_true_pairs"],
    )
    assert got.astype(str).equals(want.astype(str)), (got, want)
    assert int(got.loc[0, "n_true_pairs"]) >= 6
