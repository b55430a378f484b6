"""Analytic semantics for the round-8/9 statistics / selection keys.

The DuckDB oracle proves ENGINE PARITY (both engines compute the same
expression); these tests prove the expression computes the intended
STATISTIC — U against pandas average ranks, chi-square / ANOVA / KW
against the textbook formulas, CUSUM against the recursion it
de-recursed, Theil-Sen against the NumPy pairwise-slope median, the
bootstrap SE against the classical sigma/sqrt(n), SRM against its
alarm-on-skew design intent, k-core against an unbounded reference
peel, SemDeDup against a NumPy re-derivation of the assignment +
prune, QUALIFY against the per-group definition, DSIR against its
design intent (target-domain docs score higher).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from duckdb_hdfs_spark.queries import load_all

REG = load_all()


def test_mann_whitney_matches_pandas_average_ranks(spark, sf_dir):
    """U from the value-grain doubled-rank panel == U from explicit
    per-row average ranks (pandas rank(method='average')) — the
    identity the distributed formulation must preserve."""
    out = REG["stats_mann_whitney"].spark(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    x = li["l_quantity"].astype(float)
    is_a = (li["l_orderkey"] % 2 == 0).to_numpy()
    ranks = x.rank(method="average").to_numpy()
    n_a, n_b = int(is_a.sum()), int((~is_a).sum())
    u_a = float(ranks[is_a].sum()) - n_a * (n_a + 1) / 2
    row = out.iloc[0]
    assert int(row["n_a"]) == n_a and int(row["n_b"]) == n_b
    assert abs(float(row["u_a"]) - u_a) < 0.5
    assert abs(float(row["u_a"]) + float(row["u_b"]) - n_a * n_b) < 0.5
    # tie-corrected z against the explicit formula
    _, counts = np.unique(x.to_numpy(), return_counts=True)
    tie3 = float((counts.astype(float) ** 3 - counts).sum())
    n = n_a + n_b
    var_u = n_a * n_b / 12 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u_a - n_a * n_b / 2) / np.sqrt(var_u)
    assert abs(float(row["z_stat"]) - z) < 1e-4


def test_chi2_matches_crosstab_formula(spark, sf_dir):
    """chi2_total == sum over the pandas crosstab of (O-E)^2/E, and
    the per-cell panel is complete and internally consistent."""
    out = REG["stats_chi2_independence"].spark(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    ct = pd.crosstab(j["c_mktsegment"], j["o_orderpriority"])
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / ct.to_numpy().sum()
    chi2 = float(((ct.to_numpy() - e) ** 2 / e).sum())
    assert len(out) == ct.shape[0] * ct.shape[1]
    assert out["chi2_total"].nunique() == 1
    assert abs(float(out["chi2_total"].iloc[0]) - chi2) < 1e-3
    assert int(out["dof"].iloc[0]) == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert int(out["observed"].sum()) == len(j)
    # per-cell observed matches the crosstab
    got = out.set_index(["segment", "priority"])["observed"].to_dict()
    for seg in ct.index:
        for pri in ct.columns:
            assert got[(seg, pri)] == ct.loc[seg, pri]


def _np_semdedup(emb_df: pd.DataFrame, n_cells: int = 8, tau: float = 0.3):
    """NumPy re-derivation: md5-sampled codebook, argmax-cosine cell
    assignment (tiebreak cent_id asc), within-cell keep-first prune."""
    ids = emb_df["vec_id"].to_numpy()
    mat = np.stack(emb_df["embedding"].to_numpy()).astype(np.float64)
    order = np.argsort([hashlib.md5(str(i).encode()).hexdigest() for i in ids])
    cent_ids = ids[order[:n_cells]]
    cents = mat[order[:n_cells]]
    sims = (mat @ cents.T) / (
        np.linalg.norm(mat, axis=1)[:, None] * np.linalg.norm(cents, axis=1)[None, :]
    )
    # argmax with cent_id-ascending tiebreak: stable argmax over
    # cells sorted by cent_id
    csort = np.argsort(cent_ids)
    cell = cent_ids[csort][np.argmax(sims[:, csort], axis=1)]
    dropped = set()
    for cid in np.unique(cell):
        members = ids[cell == cid]
        m = mat[cell == cid]
        nrm = np.linalg.norm(m, axis=1)
        cos = (m @ m.T) / np.outer(nrm, nrm)
        o = np.argsort(members)
        for i in range(len(members)):
            for k in range(i):
                if cos[o[i], o[k]] >= tau:
                    dropped.add(int(members[o[i]]))
                    break
    return {int(i): int(c) for i, c in zip(ids, cell)}, dropped


def test_semdedup_matches_numpy(spark, sf_dir):
    out = REG["dedup_semdedup"].spark(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    cells, dropped = _np_semdedup(emb)
    assert len(out) == len(emb)
    got_cells = dict(zip(out["vec_id"].astype(int), out["cent_id"].astype(int)))
    assert got_cells == cells
    got_dropped = set(out.loc[out["dropped"], "vec_id"].astype(int))
    assert got_dropped == dropped
    # the policy must keep at least one representative everywhere:
    # the lowest-id member of every cell is never dropped
    keep_min = out.groupby("cent_id")["vec_id"].min()
    assert not out.set_index("vec_id").loc[keep_min, "dropped"].any()


def test_qualify_is_per_group_top3(spark, sf_dir):
    """The query ranks on (acctbal DESC, suppkey) — a TOTAL order, so
    rank() is tie-free and each nation emits exactly its first 3 rows
    under that order (round-8 review: an acctbal-only competition
    rank diverges whenever balance ties span the top-3 boundary)."""
    out = REG["sql_qualify"].spark(spark, sf_dir).toPandas()
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    assert (out["rk"] <= 3).all()
    for nk, grp in s.groupby("s_nationkey"):
        ranked = grp.sort_values(
            ["s_acctbal", "s_suppkey"], ascending=[False, True]
        )
        expect = list(ranked["s_suppkey"].head(3))
        got = list(
            out.loc[out["s_nationkey"] == nk]
            .sort_values("rk")["s_suppkey"]
        )
        assert got == expect, f"nation {nk}"


def test_dsir_upweights_target_domain(spark, sf_dir):
    """Design intent: the target (English) sub-corpus must score a
    higher MEAN log importance ratio than the rest — if it doesn't,
    the target/raw LMs are swapped or the smoothing is broken."""
    out = REG["text_dsir_weights"].spark(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    j = out.merge(docs, on="doc_id")
    assert len(j) == len(docs)
    en = j.loc[j["lang"] == "en", "dsir_logratio"].mean()
    rest = j.loc[j["lang"] != "en", "dsir_logratio"].mean()
    assert en > rest


def test_ks_matches_numpy_ecdf(spark, sf_dir):
    """D from the integer-numerator panel == sup|F_A - F_B| from
    explicit NumPy empirical CDFs evaluated at every sample point."""
    out = REG["stats_ks_test"].spark(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"])
    x = li["l_extendedprice"].astype(float).to_numpy()
    is_a = (li["l_orderkey"] % 2 == 0).to_numpy()
    a, b = np.sort(x[is_a]), np.sort(x[~is_a])
    grid = np.unique(x)
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    d = float(np.max(np.abs(fa - fb)))
    row = out.iloc[0]
    assert int(row["n_a"]) == len(a) and int(row["n_b"]) == len(b)
    assert abs(float(row["d_stat"]) - d) < 1e-6
    # the reported location attains the max gap
    at = float(row["ks_at_value"])
    ia = np.searchsorted(a, at, side="right") / len(a)
    ib = np.searchsorted(b, at, side="right") / len(b)
    assert abs(abs(ia - ib) - d) < 1e-9


def test_holt_matches_python_fold(spark, sf_dir):
    """The engine fold == an explicit python Holt recursion over the
    same monthly panel (the recurrence documented in the docstring)."""
    out = REG["orders_forecast_holt"].spark(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    m = (
        o.assign(month=pd.to_datetime(o["o_orderdate"]).dt.to_period("M"))
        .groupby("month")["o_totalprice"]
        .sum()
        .sort_index()
        .round(2)
        .to_numpy()
    )
    l, b = float(m[0]), 0.0
    for v in m[1:]:
        nl = 0.5 * float(v) + 0.5 * (l + b)
        b = 0.5 * (nl - l) + 0.5 * b
        l = nl
    row = out.iloc[0]
    assert int(row["n_months"]) == len(m)
    assert abs(float(row["level"]) - l) < 1e-2
    assert abs(float(row["trend"]) - b) < 1e-2
    assert abs(float(row["forecast_next"]) - (l + b)) < 2e-2


# --------------------------------------------------------------------------
def test_cusum_matches_recursive_fold(spark, sf_dir):
    """The cumsum-minus-running-min formulation must equal the
    textbook recursion Sₜ = max(0, Sₜ₋₁ + zₜ − k) on both sides —
    the identity that let the operator use two stock windows."""
    out = (
        REG["ev_cusum_changepoint"]
        .spark(spark, sf_dir)
        .toPandas()
        .sort_values(["event_type", "day"])
    )
    for _, g in out.groupby("event_type"):
        sp = sn = 0.0
        for _, row in g.iterrows():
            z = row["z_day"]
            sp = max(0.0, sp + z - 0.5)
            sn = max(0.0, sn + (-z) - 0.5)
            assert abs(sp - row["cusum_pos"]) < 1e-6, row
            assert abs(sn - row["cusum_neg"]) < 1e-6, row
            assert bool(row["drift_alarm"]) == (sp > 4.0 or sn > 4.0)


def test_kruskal_matches_scipy_formula(spark, sf_dir):
    """H from the value-grain panel == H from explicit average ranks
    (the pandas/scipy definition with tie correction)."""
    out = REG["stats_kruskal_wallis"].spark(spark, sf_dir).toPandas()
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )
    x = li["l_quantity"].astype(float)
    ranks = x.rank(method="average")
    n = len(x)
    h = 0.0
    for flag, idx in li.groupby("l_returnflag").groups.items():
        r = ranks.loc[idx]
        h += r.sum() ** 2 / len(r)
        row = out[out["grp"] == flag].iloc[0]
        assert abs(row["mean_rank"] - r.mean()) < 1e-3
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    _, counts = np.unique(x, return_counts=True)
    tie = 1 - (counts**3 - counts).sum() / (n**3 - n)
    assert abs(out["h_stat"].iloc[0] - h / tie) < 1e-3


def test_theil_sen_matches_numpy_median(spark, sf_dir):
    """The distributed median-of-pairwise-slopes == the explicit
    NumPy enumeration over the monthly panel."""
    out = REG["stats_theil_sen_slope"].spark(spark, sf_dir).toPandas().iloc[0]
    od = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    od["t"] = (od["o_orderdate"].dt.year - 1990) * 12 + od["o_orderdate"].dt.month
    m = od.groupby("t")["o_totalprice"].sum().round(2)
    t = m.index.to_numpy()
    y = m.to_numpy()
    slopes = np.round(
        [
            (y[j] - y[i]) / (t[j] - t[i])
            for i in range(len(t))
            for j in range(i + 1, len(t))
        ],
        6,
    )
    assert out["n_pairs"] == len(slopes)
    slopes.sort()
    lo = slopes[(len(slopes) + 1) // 2 - 1]
    hi = slopes[len(slopes) // 2]
    assert abs(out["ts_slope"] - (lo + hi) / 2) < 1e-4


def test_bootstrap_weights_are_poisson_like(spark, sf_dir):
    """Across orders × replicates the deterministic weight ladder must
    look Poisson(1): mean ≈ 1, and the bootstrap SE must approximate
    the classical SE = σ/√n within sampling slack — the property that
    makes the CI meaningful, which engine parity alone cannot pin."""
    out = REG["stats_bootstrap_ci"].spark(spark, sf_dir).toPandas().iloc[0]
    od = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    classical = od["o_totalprice"].std(ddof=1) / np.sqrt(len(od))
    assert 0.5 * classical < out["boot_se"] < 2.0 * classical
    assert out["ci_lo"] < out["point_mean"] < out["ci_hi"]
    width = out["ci_hi"] - out["ci_lo"]
    assert 2.0 * out["boot_se"] < width < 8.0 * out["boot_se"]


def test_anova_matches_textbook_formula(spark, sf_dir):
    """F from the decimal power sums == F from the explicit
    between/within decomposition on raw values."""
    out = REG["stats_anova_oneway"].spark(spark, sf_dir).toPandas()
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )
    x = li["l_quantity"].astype(float)
    grand = x.mean()
    ssb = ssw = 0.0
    k = 0
    for flag, idx in li.groupby("l_returnflag").groups.items():
        xs = x.loc[idx]
        ssb += len(xs) * (xs.mean() - grand) ** 2
        ssw += ((xs - xs.mean()) ** 2).sum()
        k += 1
        row = out[out["grp"] == flag].iloc[0]
        assert abs(row["mean_j"] - xs.mean()) < 1e-4
    f = (ssb / (k - 1)) / (ssw / (len(x) - k))
    assert abs(out["f_stat"].iloc[0] - f) < 1e-3


def test_srm_detects_broken_assignment(spark, sf_dir):
    """The SRM chi-square must fire on a deliberately skewed split and
    stay quiet on the honest md5 split — the design intent engine
    parity alone cannot pin."""
    import numpy as np

    out = REG["ev_abtest_srm"].spark(spark, sf_dir).toPandas()
    na = int(out[out["arm"] == "A"]["n_users"].iloc[0])
    nb = int(out[out["arm"] == "B"]["n_users"].iloc[0])
    n = na + nb
    assert not out["srm_alarm"].any(), (na, nb)  # honest split: quiet
    # an 80/20 corruption of the same population must alarm (severe
    # enough to clear the 3.84 bar even at the sf0.001 user count)
    na_bad = int(round(0.8 * n))
    chi2_bad = (na_bad - (n - na_bad)) ** 2 / n
    assert chi2_bad > 3.841


def test_kcore_peeling_converges_and_is_sound(spark, sf_dir):
    """The fixed peeling-round bound must reach the stationary 2-core
    at test scale (one extra peel changes nothing), and every member
    must have >= 2 neighbors INSIDE the core (the defining property)."""
    out = REG["graph_kcore"].spark(spark, sf_dir).toPandas()
    core = set(out[out["in_2core"]]["doc_id"])
    # rebuild the candidate edge set the query used
    from duckdb_hdfs_spark.operators.dedup import minhash_candidate_pairs
    from duckdb_hdfs_spark.queries._helpers import _t

    pairs = minhash_candidate_pairs(_t(spark, sf_dir, "documents")).toPandas()
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        adj[a].add(b)
        adj[b].add(a)
    # reference fixed-point peel (no round bound)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < 2}
        if not drop:
            break
        alive -= drop
    assert core == alive, (len(core), len(alive))
    for n in core:
        assert len(adj[n] & core) >= 2


def test_substring_spans_are_true_and_maximal(spark, sf_dir):
    """Every reported run must be a TRUE equal token span in both
    documents, and MAXIMAL — extending one token left or right breaks
    the equality (or leaves a document) — the defining property of
    the Lee et al. substring dedup this key implements."""
    out = REG["dedup_substring_spans"].spark(spark, sf_dir).toPandas()
    assert len(out) > 0  # the planted near-dups must surface
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    toks = {r.doc_id: r.text.lower().split() for r in docs.itertuples()}
    for r in out.itertuples():
        a, b = toks[r.doc_a], toks[r.doc_b]
        sa, sb, n = r.start_a - 1, r.start_b - 1, r.span_tokens
        assert a[sa : sa + n] == b[sb : sb + n], (r.doc_a, r.doc_b)
        if sa > 0 and sb > 0:
            assert a[sa - 1] != b[sb - 1], ("extendable left", r)
        if sa + n < len(a) and sb + n < len(b):
            assert a[sa + n] != b[sb + n], ("extendable right", r)


# --------------------------------------------------------------------------
def test_spearman_matches_pandas_rank_corr(spark, sf_dir):
    """rho from the pair-grain weighted formulation == Pearson over
    explicit per-row average ranks (pandas rank method='average') —
    the identity the single-scan rewrite must preserve."""
    out = REG["stats_spearman_corr"].spark(spark, sf_dir).toPandas()
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    for flag, grp in li.groupby("l_returnflag"):
        rx = grp["l_quantity"].round(0).rank(method="average").to_numpy()
        ry = grp["l_extendedprice"].rank(method="average").to_numpy()
        rho = float(np.corrcoef(rx, ry)[0, 1])
        row = out[out["flag"] == flag].iloc[0]
        assert int(row["n_rows"]) == len(grp)
        assert abs(float(row["spearman_rho"]) - rho) < 1e-4, (flag, rho, row)


def test_gini_matches_numpy_sorted_identity(spark, sf_dir):
    """G from the distributed rank == the explicit sorted-array
    identity over per-user counts."""
    out = REG["ev_gini_concentration"].spark(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    for et, grp in ev.groupby("event_type"):
        x = np.sort(grp.groupby("user_id").size().to_numpy().astype(float))
        n, s = len(x), x.sum()
        g = 2 * float((np.arange(1, n + 1) * x).sum()) / (n * s) - (n + 1) / n
        row = out[out["event_type"] == et].iloc[0]
        assert int(row["n_users"]) == n and int(row["n_events"]) == int(s)
        assert abs(float(row["gini"]) - g) < 1e-4, (et, g, row)


def test_zipf_slope_matches_numpy_polyfit(spark, sf_dir):
    """The decimal-summed OLS == NumPy polyfit over the explicitly
    recomputed top-200 head (freq desc, token asc tiebreak)."""
    from collections import Counter

    from duckdb_hdfs_spark.queries.text import ZIPF_TOP_N

    out = REG["text_zipf_slope"].spark(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    cnt = Counter()
    import re as _re

    for t in docs["text"]:
        cnt.update(tok for tok in _re.split(r"\s+", t.lower()) if tok != "")
    head = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP_N]
    lx = np.log(np.arange(1, len(head) + 1, dtype=float))
    ly = np.log(np.array([c for _, c in head], dtype=float))
    slope, intercept = np.polyfit(lx, ly, 1)
    assert int(out["n_ranks"]) == len(head)
    assert abs(float(out["zipf_slope"]) - slope) < 1e-3
    assert abs(float(out["intercept"]) - intercept) < 1e-3
    assert float(out["zipf_slope"]) < 0 and 0 <= float(out["r_squared"]) <= 1


def test_readability_matches_python_recount(spark, sf_dir):
    """Source-grain Flesch panel == an explicit python re recount."""
    import re as _re

    out = REG["text_readability"].spark(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    for src, grp in docs.groupby("source"):
        w = sum(len([t for t in _re.split(r"\s+", t.lower()) if t]) for t in grp["text"])
        s = sum(max(len(_re.findall(r"[.!?]+", t)), 1) for t in grp["text"])
        v = sum(len(_re.findall(r"[aeiouy]+", t.lower())) for t in grp["text"])
        row = out[out["source"] == src].iloc[0]
        assert (int(row["words"]), int(row["sentences"]), int(row["syllables_est"])) == (w, s, v)
        flesch = 206.835 - 1.015 * (w / s) - 84.6 * (v / w)
        assert abs(float(row["flesch_score"]) - flesch) < 1e-4


def test_bh_fdr_step_up_is_internally_consistent(spark, sf_dir):
    """Given the panel's own p-values, the adjusted p must equal the
    textbook BH step-up (cumulative min from the largest rank of
    p*m/i, capped at 1) and the rejection flag must be p_adj <= q."""
    out = (
        REG["stats_bh_fdr"].spark(spark, sf_dir).toPandas().sort_values("p_rank")
    )
    m = len(out)
    p = out["p_value"].to_numpy()
    assert (np.diff(p) >= -1e-12).all()  # p sorted by rank
    term = p * m / out["p_rank"].to_numpy()
    adj = np.minimum(np.minimum.accumulate(term[::-1])[::-1], 1.0)
    assert np.allclose(out["p_adj"].to_numpy(), np.round(adj, 6), atol=1e-9)
    assert (out["rejected_fdr_5pct"].to_numpy() == (adj <= 0.05)).all()
    assert set(out["p_rank"]) == set(range(1, m + 1))


def test_kmv_jaccard_matches_python_sketch(spark, sf_dir):
    """Exact arm == pandas set arithmetic; the KMV estimate == a pure
    python recomputation of the bottom-k signature estimator."""
    from duckdb_hdfs_spark.queries.sketches import KMV_K

    out = REG["sketch_kmv_jaccard"].spark(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def h60(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    sets = {
        et: {h60(u) for u in grp["user_id"].unique()}
        for et, grp in ev.groupby("event_type")
    }
    sigs = {et: set(sorted(s)[:KMV_K]) for et, s in sets.items()}
    for _, row in out.iterrows():
        a, b = row["type_a"], row["type_b"]
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert int(row["inter_exact"]) == inter
        assert abs(float(row["jaccard_exact"]) - inter / union) < 1e-6
        topk = sorted(sigs[a] | sigs[b])[:KMV_K]
        est = sum(1 for h in topk if h in sigs[a] and h in sigs[b]) / len(topk)
        assert abs(float(row["kmv_jaccard_est"]) - est) < 1e-6


# --------------------------------------------------------------------------
def test_tone_probe_matches_numpy_fft(spark, sf_dir):
    """The integer DFT-bin folds over DECODED samples == numpy FFT
    bins of the reconstructed synth wave: DC always, Nyquist bin for
    even n, quarter bin for 4|n (the folds generalize to any n; the
    FFT comparison applies where the bin frequency is integral)."""
    from duckdb_hdfs_spark.multimodal.decode import _wav_params

    out = REG["mm_audio_tone_probe"].spark(spark, sf_dir).toPandas()
    for _, row in out.iterrows():
        amp, n = _wav_params(int(row["doc_id"]))
        assert int(row["n_samples"]) == n
        s = np.array([amp if i % 2 == 0 else -amp for i in range(n)], dtype=float)
        fft = np.fft.fft(s)
        assert int(row["dc_sum"]) == int(round(fft[0].real))
        if n % 2 == 0:
            assert int(row["nyquist_sum"]) == int(round(fft[n // 2].real))
        if n % 4 == 0:
            assert int(row["quarter_real"]) == int(round(fft[n // 4].real))
            assert int(row["quarter_imag"]) == int(round(fft[n // 4].imag))


def test_cosine_diversity_matches_numpy(spark, sf_dir):
    """The histogram == a numpy recomputation of the disjoint
    pairing (2k with 2k+1), including bin edges on the rounded
    cosine and the pair count identity."""
    out = REG["emb_cosine_diversity"].spark(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
            for _, r in emb.iterrows()}
    bins, count = {}, 0
    for vid, va in vecs.items():
        if vid % 2 == 0 and vid + 1 in vecs:
            vb = vecs[vid + 1]
            cr = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 6)
            b = min(int(np.floor((cr + 1) * 10)), 19)
            bins.setdefault(b, []).append(cr)
            count += 1
    assert int(out["n_pairs"].sum()) == count
    for b, vals in bins.items():
        row = out[out["cos_bin"] == b].iloc[0]
        assert int(row["n_pairs"]) == len(vals)
        assert abs(float(row["mean_cos"]) - float(np.mean(vals))) < 1e-5


# --------------------------------------------------------------------------
def test_cohens_d_matches_textbook_formula(spark, sf_dir):
    """d / Hedges' g / CI against the explicit pooled-SD formulas
    over the same even/odd cohort split."""
    out = REG["stats_cohens_d"].spark(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    x = li["l_quantity"].round(0).astype(float)
    a = x[(li["l_orderkey"] % 2 == 0).to_numpy()]
    b = x[(li["l_orderkey"] % 2 == 1).to_numpy()]
    na, nb = len(a), len(b)
    sp = np.sqrt(((na - 1) * a.var(ddof=1) + (nb - 1) * b.var(ddof=1)) / (na + nb - 2))
    d = (a.mean() - b.mean()) / sp
    assert (int(out["n_a"]), int(out["n_b"])) == (na, nb)
    assert abs(float(out["cohens_d"]) - d) < 1e-4
    assert abs(float(out["hedges_g"]) - d * (1 - 3 / (4 * (na + nb) - 9))) < 1e-4
    se = np.sqrt((na + nb) / (na * nb) + d * d / (2 * (na + nb - 2)))
    assert abs(float(out["ci95_lo"]) - (d - 1.96 * se)) < 1e-4
    assert abs(float(out["ci95_hi"]) - (d + 1.96 * se)) < 1e-4
    assert float(out["ci95_lo"]) <= float(out["cohens_d"]) <= float(out["ci95_hi"])


def test_range_partition_stats_matches_pandas_qcut(spark, sf_dir):
    """Tile bounds/counts against an explicit pandas ntile (the SQL
    allocation: first n mod k tiles get one extra row) and the
    invariants a range-partition plan must satisfy: tiles cover the
    key space in order and the skew ratios average to 1."""
    from duckdb_hdfs_spark.queries.layout import RANGE_PARTS

    out = (
        REG["layout_range_partition_stats"].spark(spark, sf_dir)
        .toPandas().sort_values("range_id").reset_index(drop=True)
    )
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    ).sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    n = len(li)
    base, extra = divmod(n, RANGE_PARTS)
    sizes = [base + (1 if i < extra else 0) for i in range(RANGE_PARTS)]
    assert out["n_rows"].tolist() == sizes
    pos = 0
    for i, sz in enumerate(sizes):
        seg = li.iloc[pos : pos + sz]
        assert int(out.loc[i, "lo_key"]) == int(seg["l_orderkey"].iloc[0])
        assert int(out.loc[i, "hi_key"]) == int(seg["l_orderkey"].iloc[-1])
        pos += sz
    assert (out["lo_key"] <= out["hi_key"]).all()
    assert (out["hi_key"].iloc[:-1].to_numpy() <= out["lo_key"].iloc[1:].to_numpy()).all()
    assert abs(out["skew_ratio"].mean() - 1.0) < 1e-3
