"""Similarity-search registry entries (SURVEY.md §2.6).

Every entry is oracle-checked: the DuckDB side mirrors the
sequential-fold dot product exactly (functions/vectors.py), so
cosines are bit-identical and rank order (tie-broken on vec_id)
matches.  The ANN variants re-derive their candidate sets in SQL —
band buckets via lsh_band_keys_sql (bit-identical sign tests) and
IVF cells via the same md5-ordered centroid sample + argmax-cosine
assignment — so buckets, candidates, and ranks all hash-match.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_hdfs_spark.functions.vectors import cosine_sql, norm_sql
from duckdb_hdfs_spark.operators.similarity import brute_topk, ivf_ann, lsh_ann
from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _t

_PROBE_FILTER = "vec_id % 100 = 0"


def _probes(emb: DataFrame) -> DataFrame:
    """Deterministic probe subset — every 100th vector."""
    return emb.filter(F.col("vec_id") % 100 == 0)


# --------------------------------------------------------------------------
@query(
    "sim_bruteforce_topk",
    oracle=f"""
WITH p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
           WHERE {_PROBE_FILTER}),
scored AS (
    SELECT p.probe_id, c.vec_id,
           {cosine_sql('p.pe', 'c.embedding')} AS cos_raw
    FROM embeddings c, p
    WHERE c.vec_id <> p.probe_id
)
SELECT probe_id, vec_id, round(cos_raw, 6) AS cos_sim, rk
FROM (
    SELECT probe_id, vec_id, cos_raw,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cos_raw DESC, vec_id) AS rk
    FROM scored
) t WHERE rk <= 5
""",
    headline=True,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for every 100th vector as probe."""
    emb = _t(spark, sf_dir, "embeddings")
    return brute_topk(_probes(emb), emb, k=5)


# --------------------------------------------------------------------------
@query(
    "sim_knn_join",
    oracle=f"""
WITH p AS (SELECT vec_id AS probe_id, embedding AS pe, label AS plabel
           FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
    SELECT p.probe_id, p.plabel, c.vec_id, c.label,
           {cosine_sql('p.pe', 'c.embedding')} AS cos_raw
    FROM embeddings c, p
    WHERE c.vec_id <> p.probe_id
)
SELECT probe_id, vec_id, round(cos_raw, 6) AS cos_sim, rk,
       CASE WHEN plabel = label THEN 1 ELSE 0 END AS same_label
FROM (
    SELECT probe_id, plabel, vec_id, label, cos_raw,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cos_raw DESC, vec_id) AS rk
    FROM scored
) t WHERE rk <= 3
""",
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-NN join with label agreement (the eval-style variant: does
    the neighbor share the probe's class?).

    Scale shape: the corpus is scored map-side against broadcast
    probes and reduced to per-partition partial top-k BEFORE the only
    shuffle (operators/similarity.py:_topk_merge) — the full
    N_corpus x N_probes score set never moves.  Labels are attached
    AFTER ranking, on the tiny (probes x k) winner set: corpus labels
    via a broadcast-winners join, probe labels via a broadcast-probes
    join — no extra corpus shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    winners = brute_topk(
        probes.select("vec_id", "embedding"), emb, k=3, exclude_self=True
    )
    plabels = probes.select(
        F.col("vec_id").alias("probe_id"), F.col("label").alias("plabel")
    )
    clabels = emb.select("vec_id", "label")
    return (
        clabels.join(F.broadcast(winners), "vec_id")
        .join(F.broadcast(plabels), "probe_id")
        .select(
            "probe_id",
            "vec_id",
            "cos_sim",
            "rk",
            F.when(F.col("plabel") == F.col("label"), 1).otherwise(0).alias(
                "same_label"
            ),
        )
    )


# --------------------------------------------------------------------------
def _lsh_cand_sql() -> str:
    """Candidate CTE body shared by the lsh_ann oracle and the recall
    oracle: DISTINCT (probe_id, vec_id) pairs sharing any band key."""
    from duckdb_hdfs_spark.operators.similarity import lsh_band_keys_sql

    return f"""
    SELECT DISTINCT p.vec_id AS probe_id, c.vec_id
    FROM (SELECT vec_id, unnest({lsh_band_keys_sql('embedding')}) AS band_key
          FROM embeddings) c
    JOIN (SELECT vec_id, unnest({lsh_band_keys_sql('embedding')}) AS band_key
          FROM embeddings WHERE {_PROBE_FILTER}) p
      ON c.band_key = p.band_key
    WHERE c.vec_id <> p.vec_id"""


def _ivf_cand_sql(n_cells: int = 16, nprobe: int = 2) -> str:
    """Candidate CTE body for the ivf_ann oracle: centroid sample by
    md5 order (mirrors orderBy(md5).limit), argmax-cosine cell
    assignment, probes visit their nprobe nearest cells."""
    return f"""
    SELECT pc.probe_id, cc.vec_id
    FROM (
        SELECT vec_id, cent_id FROM (
            SELECT e.vec_id, c.cent_id,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {cosine_sql('e.embedding', 'c.cent')} DESC,
                                c.cent_id) AS crk
            FROM embeddings e, (
                SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
                ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {n_cells}
            ) c
        ) WHERE crk = 1
    ) cc
    JOIN (
        SELECT probe_id, cent_id FROM (
            SELECT e.vec_id AS probe_id, c.cent_id,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {cosine_sql('e.embedding', 'c.cent')} DESC,
                                c.cent_id) AS crk
            FROM embeddings e, (
                SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
                ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {n_cells}
            ) c
            WHERE e.{_PROBE_FILTER}
        ) WHERE crk <= {nprobe}
    ) pc ON cc.cent_id = pc.cent_id
    WHERE cc.vec_id <> pc.probe_id"""


def _ann_topk_sql(cand_sql: str, k: int = 5) -> str:
    """Score + exact top-k over a candidate CTE — the oracle mirror
    of operators/similarity.py:_topk_merge (rank on the unrounded
    cosine, ties on vec_id, round(6) output-only)."""
    return f"""
WITH cand AS ({cand_sql}),
scored AS (
    SELECT cand.probe_id, cand.vec_id,
           {cosine_sql('pe.embedding', 'ce.embedding')} AS cos_raw
    FROM cand
    JOIN embeddings pe ON pe.vec_id = cand.probe_id
    JOIN embeddings ce ON ce.vec_id = cand.vec_id
)
SELECT probe_id, vec_id, round(cos_raw, 6) AS cos_sim, rk
FROM (
    SELECT probe_id, vec_id, cos_raw,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cos_raw DESC, vec_id) AS rk
    FROM scored
) t WHERE rk <= {k}
"""


@query("sim_lsh_ann", oracle=_ann_topk_sql(_lsh_cand_sql()))
def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN (12 md5-seeded planes).  Hash-checked: the
    oracle re-derives the band buckets bit-identically
    (lsh_band_keys_sql), so candidates, cosines, and ranks match."""
    emb = _t(spark, sf_dir, "embeddings")
    return lsh_ann(_probes(emb), emb, k=5)


# --------------------------------------------------------------------------
@query("sim_ivf_ann", oracle=_ann_topk_sql(_ivf_cand_sql()))
def sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: 16 coarse cells, nprobe=2.  Hash-checked: the
    oracle mirrors the md5-ordered centroid sample and argmax-cosine
    cell assignment exactly."""
    emb = _t(spark, sf_dir, "embeddings")
    return ivf_ann(_probes(emb), emb, n_cells=16, nprobe=2, k=5)


# --------------------------------------------------------------------------
PQ_M = 8        # subspaces
PQ_DSUB = 8     # dims per subspace (PQ_M * PQ_DSUB = DIM)
PQ_K = 16       # codes per subspace


def _pq_dist_sql(m: int) -> str:
    """DuckDB mirror of the Spark per-subspace squared-L2 fold:
    sequential left fold over the m-th 8-dim slice, double precision,
    identical operation order — bit-identical distances."""
    base = m * PQ_DSUB
    diff = (
        f"(CAST(e.embedding[{base} + i] AS DOUBLE)"
        f" - CAST(c.cent[{base} + i] AS DOUBLE))"
    )
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {PQ_DSUB}), "
        f"i -> {diff} * {diff})), (acc, x) -> acc + x)"
    )


def _adc_ctes() -> str:
    """The ADC CTE chain (codebook sample → per-subspace code argmins
    → long-form code/table match → per-(probe, vec) ADC sums), shared
    by the sim_pq_adc_topk oracle and the recall oracle's pq arm.
    Per-subspace distances round to 9 decimals and sum in DECIMAL
    (matching the Spark side exactly), so the ADC total is
    order-independent and engine-exact.  The code/table match is ONE
    long-form join + group-by — an 8-way join formulation lets the
    join reorderer cross-multiply the table instances on probe_id
    (measured: planner blowup)."""
    dists = ",\n           ".join(
        f"{_pq_dist_sql(m)} AS d{m}" for m in range(PQ_M)
    )
    branches = ",\n".join(
        f"""b{m} AS (
    SELECT vec_id, cent_id AS code_{m} FROM (
        SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d{m}, cent_id) AS rn
        FROM x
    ) WHERE rn = 1
)"""
        for m in range(PQ_M)
    )
    code_joins = " ".join(f"JOIN b{m} USING (vec_id)" for m in range(1, PQ_M))
    codes = ", ".join(f"code_{m}" for m in range(PQ_M))
    codes_long = " UNION ALL ".join(
        f"SELECT vec_id, {m} AS m, code_{m} AS code FROM codes"
        for m in range(PQ_M)
    )
    pc_long = " UNION ALL ".join(
        f"SELECT probe_id, cent_id, {m} AS m, "
        f"CAST(round(d{m}, 9) AS DECIMAL(20, 10)) AS dd FROM pc"
        for m in range(PQ_M)
    )
    return f"""
cents AS (
    SELECT vec_id AS cent_id, embedding AS cent
    FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {PQ_K}
),
x AS (
    SELECT e.vec_id, c.cent_id,
           {dists}
    FROM embeddings e CROSS JOIN cents c
),
{branches},
codes AS (SELECT b0.vec_id, {codes} FROM b0 {code_joins}),
codes_long AS ({codes_long}),
pc AS (
    SELECT e.vec_id AS probe_id, c.cent_id,
           {dists}
    FROM embeddings e CROSS JOIN cents c
    WHERE {_PROBE_FILTER}
),
pc_long AS ({pc_long}),
adc_scored AS (
    SELECT pl.probe_id, cl.vec_id, sum(pl.dd) AS adc
    FROM codes_long cl
    JOIN pc_long pl ON pl.m = cl.m AND pl.cent_id = cl.code
    WHERE cl.vec_id <> pl.probe_id
    GROUP BY pl.probe_id, cl.vec_id
)"""


def _recall_oracle() -> str:
    truth = f"""
    SELECT probe_id, vec_id FROM (
        SELECT p.vec_id AS probe_id, c.vec_id,
               row_number() OVER (PARTITION BY p.vec_id
                   ORDER BY {cosine_sql('p.embedding', 'c.embedding')} DESC,
                            c.vec_id) AS rk
        FROM embeddings c, (SELECT * FROM embeddings WHERE {_PROBE_FILTER}) p
        WHERE c.vec_id <> p.vec_id
    ) WHERE rk <= 5"""
    lsh_top = f"""
    SELECT probe_id, vec_id FROM (
        SELECT cand.probe_id, cand.vec_id,
               row_number() OVER (PARTITION BY cand.probe_id
                   ORDER BY {cosine_sql('pe.embedding', 'ce.embedding')} DESC,
                            cand.vec_id) AS rk
        FROM ({_lsh_cand_sql()}) cand
        JOIN embeddings pe ON pe.vec_id = cand.probe_id
        JOIN embeddings ce ON ce.vec_id = cand.vec_id
    ) WHERE rk <= 5"""
    ivf_top = f"""
    SELECT probe_id, vec_id FROM (
        SELECT cand.probe_id, cand.vec_id,
               row_number() OVER (PARTITION BY cand.probe_id
                   ORDER BY {cosine_sql('pe.embedding', 'ce.embedding')} DESC,
                            cand.vec_id) AS rk
        FROM ({_ivf_cand_sql()}) cand
        JOIN embeddings pe ON pe.vec_id = cand.probe_id
        JOIN embeddings ce ON ce.vec_id = cand.vec_id
    ) WHERE rk <= 5"""
    return f"""
WITH truth AS ({truth}),
lsh AS ({lsh_top}),
ivf AS ({ivf_top}),
{_adc_ctes()},
pq AS (
    SELECT probe_id, vec_id FROM (
        SELECT probe_id, vec_id,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY adc, vec_id) AS rk
        FROM adc_scored
    ) WHERE rk <= 5
),
rec_lsh AS (
    SELECT t.probe_id, CAST(count(l.vec_id) AS DOUBLE) / count(*) AS r
    FROM truth t LEFT JOIN lsh l
      ON t.probe_id = l.probe_id AND t.vec_id = l.vec_id
    GROUP BY t.probe_id
),
rec_ivf AS (
    SELECT t.probe_id, CAST(count(i.vec_id) AS DOUBLE) / count(*) AS r
    FROM truth t LEFT JOIN ivf i
      ON t.probe_id = i.probe_id AND t.vec_id = i.vec_id
    GROUP BY t.probe_id
),
rec_pq AS (
    SELECT t.probe_id, CAST(count(p.vec_id) AS DOUBLE) / count(*) AS r
    FROM truth t LEFT JOIN pq p
      ON t.probe_id = p.probe_id AND t.vec_id = p.vec_id
    GROUP BY t.probe_id
)
SELECT 'lsh' AS method, count(*) AS n_probes,
       round(avg(r), 4) AS recall_at_5 FROM rec_lsh
UNION ALL
SELECT 'ivf' AS method, count(*) AS n_probes,
       round(avg(r), 4) AS recall_at_5 FROM rec_ivf
UNION ALL
SELECT 'pq' AS method, count(*) AS n_probes,
       round(avg(r), 4) AS recall_at_5 FROM rec_pq
"""


def _per_probe_recall(truth: DataFrame, approx: DataFrame) -> DataFrame:
    """(probe_id, r): each probe's recall of ``approx`` against the
    exact ``truth`` top-k — the shared evaluation core of
    sim_recall_eval and sim_ivf_probe_sweep (round-7 review: two
    copies).  Both inputs are expected pre-checkpointed (probes × k
    rows), so the joins here run over tiny materialized sets."""
    hits = truth.join(
        approx.select("probe_id", "vec_id"), ["probe_id", "vec_id"]
    )
    return (
        truth.groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("n_truth"))
        .join(
            hits.groupBy("probe_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "probe_id",
            "left",
        )
        .select(
            "probe_id",
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_truth")).alias(
                "r"
            ),
        )
    )


@query("sim_recall_eval", oracle=_recall_oracle())
def sim_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@5 of the LSH, IVF, and PQ/ADC
    paths against the exact brute-force top-5 — the measurement that
    justifies (or rejects) an approximate index before a 100 TB
    rollout (an ANN path without a recall number is unfinished).
    Output: one row per method with mean per-probe recall."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = _probes(emb)

    def method_recall(truth: DataFrame, df: DataFrame, method: str) -> DataFrame:
        return _per_probe_recall(truth, df).agg(
            F.lit(method).alias("method"),
            F.count(F.lit(1)).alias("n_probes"),
            F.round(F.avg("r"), 4).alias("recall_at_5"),
        )

    # the IVF codebook and the PQ sample are the same md5-ordered 16
    # rows — build once (one corpus sample pass, not two) and share;
    # _pq_best_structs reads cent_id/cent from the richer IVF structs.
    # Materialize the (probes x k)-row result sets once: each is
    # reused by two joins below, and DataFrame reuse re-executes the
    # full ANN lineage per reference.  The checkpoints run in TWO
    # PARALLEL WAVES (guide §2.6; round 14 — the serial chain of 5
    # eager checkpoint jobs was 4.3 s of the 7 s DataFrame build):
    # truth/codebook/LSH are mutually independent, the IVF and ADC
    # arms each need only the checkpointed codebook.
    from duckdb_hdfs_spark.operators.genutil import parallel_checkpoints
    from duckdb_hdfs_spark.operators.similarity import centroid_codebook

    truth, cent_arr, lsh_topk = parallel_checkpoints(
        brute_topk(probes, emb, k=5).select("probe_id", "vec_id"),
        centroid_codebook(emb, 16),
        lsh_ann(probes, emb, k=5),
    )
    ivf_topk, pq_topk = parallel_checkpoints(
        ivf_ann(probes, emb, n_cells=16, nprobe=2, k=5, cent_arr=cent_arr),
        _adc_topk(emb, cent_arr=cent_arr),
    )
    lsh = method_recall(truth, lsh_topk, "lsh")
    ivf = method_recall(truth, ivf_topk, "ivf")
    pq = method_recall(truth, pq_topk, "pq")
    return lsh.unionByName(ivf).unionByName(pq)


# --------------------------------------------------------------------------
@query(
    "sim_embedding_norms",
    oracle=f"""
WITH v AS (
    SELECT vec_id, label,
           {norm_sql("embedding")} AS nrm
    FROM embeddings
)
SELECT label, count(*) AS n_vecs,
       round(avg(nrm), 6) AS mean_norm,
       round(min(nrm), 6) AS min_norm,
       round(max(nrm), 6) AS max_norm
FROM v GROUP BY label
""",
)
def sim_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding norm statistics — the sanity pass before
    any cosine-based index (catches unnormalized or degenerate
    vectors).  avg of sequential-fold norms is order-sensitive only
    in the final mean; round(6) absorbs the per-engine merge order
    at this magnitude (norms ~O(1))."""
    from duckdb_hdfs_spark.functions.vectors import norm_fold_expr

    emb = _t(spark, sf_dir, "embeddings")
    v = emb.select("label", norm_fold_expr("embedding").alias("nrm"))
    return v.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("nrm"), 6).alias("mean_norm"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
    )


# --------------------------------------------------------------------------
@query(
    "sim_norm_outliers",
    oracle=f"""
WITH r AS (
    SELECT vec_id, label,
           -- CASE guard NULL-propagates a NULL embedding exactly like
           -- Spark's aggregate(transform(NULL)) — list_prepend's seed
           -- otherwise survives alone and folds to 0.0 (all-NULL
           -- audit, round 10)
           CASE WHEN embedding IS NULL THEN NULL ELSE
           CAST(round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
                (acc, x) -> acc + x), 6) AS DECIMAL(12, 6)) END AS nr
    FROM embeddings
),
s AS (
    SELECT count(*) AS n,
           CAST(sum(nr) AS DOUBLE) AS s1,
           CAST(sum(nr * nr) AS DOUBLE) AS s2
    FROM r
)
SELECT vec_id, label,
       CAST(nr AS DOUBLE) AS l1_norm,
       -- nullif guards mirror the Spark side (constant-data audit,
       -- round 10): an all-identical corpus zeroes the variance and
       -- a 1-row corpus zeroes (n - 1); Spark's ANSI division RAISES
       -- on either, so both engines must NULL out instead
       round((CAST(nr AS DOUBLE) - s1 / n)
             / nullif(sqrt((s2 - s1 * s1 / n) / nullif(n - 1, 0)), 0), 4) AS z,
       abs((CAST(nr AS DOUBLE) - s1 / n)
           / nullif(sqrt((s2 - s1 * s1 / n) / nullif(n - 1, 0)), 0))
           > 3.0 AS is_outlier
FROM r, s
""",
)
def sim_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QC: per-vector L1-norm z-score against the corpus
    distribution, flagging |z| > 3 outliers.  The vectors are
    unit-L2-normalized upstream, so the L2 norm is constant — the L1
    norm is the discriminating statistic (L1/L2 concentration: a
    spiky / truncated / corrupted vector has mass in few components
    and a low L1), surfacing bad vectors before they poison ANN
    recall.

    Determinism discipline: norms round to 6 decimals then enter the
    moment sums as DECIMAL (exact, order-independent); mean/variance
    derive from those exact sums in identical double arithmetic on
    both engines, so even the boolean threshold cannot flip between
    engines.  Scale shape: map-side norms, one 3-value moment
    aggregate broadcast back — one scan plus a 1-row join."""
    e = _t(spark, sf_dir, "embeddings")
    l1 = F.aggregate(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nr = F.round(l1, 6).cast("decimal(12,6)")
    rows = e.select("vec_id", "label", nr.alias("nr"))
    mom = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nr").cast("double").alias("s1"),
        F.sum(F.col("nr") * F.col("nr")).cast("double").alias("s2"),
    )
    # zero-variance corpus / 1-row corpus → NULL z on both engines
    # (guards mirrored in the oracle; constant-data audit, round 10)
    z = (F.col("nr").cast("double") - F.col("s1") / F.col("n")) / F.nullif(
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / F.nullif(F.col("n") - 1, F.lit(0))
        ),
        F.lit(0.0),
    )
    return rows.join(F.broadcast(mom)).select(
        "vec_id",
        "label",
        F.col("nr").cast("double").alias("l1_norm"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 3.0).alias("is_outlier"),
    )


# --------------------------------------------------------------------------
def _pq_sub_dist(emb_col, cent_col, m: int):
    """Squared L2 over the m-th PQ_DSUB-dim slice — sequential
    zip_with/aggregate fold in double precision (engine-portable)."""
    a = F.slice(emb_col, m * PQ_DSUB + 1, PQ_DSUB)
    b = F.slice(cent_col, m * PQ_DSUB + 1, PQ_DSUB)
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_sub_dist_sql(a: str, b: str, m: int) -> str:
    """:func:`_pq_sub_dist` as Spark-SQL text — the identical
    slice+zip_with+fold tree in ONE ``F.expr`` parse instead of ~50
    py4j round-trips per (call site, subspace) (round 14, the
    lsh_band_keys construction collapse)."""
    return (
        f"aggregate(zip_with("
        f"slice({a}, {m * PQ_DSUB + 1}, {PQ_DSUB}), "
        f"slice({b}, {m * PQ_DSUB + 1}, {PQ_DSUB}), "
        f"(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        f"* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def _pq_cent_arr(e: DataFrame) -> DataFrame:
    """The PQ codebook folded into ONE broadcastable array row
    (md5-ordered deterministic sample, TakeOrderedAndProject)."""
    cents = (
        e.select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
        )
        .orderBy(F.md5(F.col("cent_id").cast("string")))
        .limit(PQ_K)
    )
    return cents.agg(F.collect_list(F.struct("cent_id", "cent")).alias("cents"))


def _pq_oracle() -> str:
    dists = ",\n           ".join(
        f"{_pq_dist_sql(m)} AS d{m}" for m in range(PQ_M)
    )
    branches = ",\n".join(
        f"""b{m} AS (
    SELECT vec_id, cent_id AS code_{m}, d{m} FROM (
        SELECT vec_id, cent_id, d{m},
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d{m}, cent_id) AS rn
        FROM x
    ) WHERE rn = 1
)"""
        for m in range(PQ_M)
    )
    joins = " ".join(f"JOIN b{m} USING (vec_id)" for m in range(1, PQ_M))
    codes = ", ".join(f"code_{m}" for m in range(PQ_M))
    err = " + ".join(f"d{m}" for m in range(PQ_M))
    return f"""
WITH cents AS (
    SELECT vec_id AS cent_id, embedding AS cent
    FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {PQ_K}
),
x AS (
    SELECT e.vec_id, c.cent_id,
           {dists}
    FROM embeddings e CROSS JOIN cents c
),
{branches}
SELECT b0.vec_id, {codes}, round({err}, 6) AS pq_err
FROM b0 {joins}
"""


def _pq_best_structs() -> list:
    """The PQ encode core shared by emb_pq_codes and the ADC search's
    codes build (round-7 review: two copies of the scorer/transform):
    8 ``array_min(transform(cents, ...))`` struct columns (d,
    cent_id), one per subspace — argmin squared-L2 with ties on
    centroid id — evaluated against the row's ``embedding`` and the
    broadcast ``cents`` codebook column, entirely map-side.  Each
    subspace is ONE ``F.expr`` parse of the identical tree the former
    per-centroid Column lambda assembled (round 14 construction
    collapse)."""
    return [
        F.expr(
            f"array_min(transform(cents, c -> named_struct("
            f"'d', {_pq_sub_dist_sql('embedding', 'c.cent', m)}, "
            f"'cent_id', c.cent_id)))"
        )
        for m in range(PQ_M)
    ]


@query("emb_pq_codes", oracle=_pq_oracle())
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: encode each 64-dim embedding as 8
    subspace codes (argmin squared-L2 against a 16-entry per-subspace
    codebook) plus the total reconstruction error — the compression
    step that makes 100 TB vector search feasible (8 bytes per vector
    instead of 256; ADC distance tables scan codes, not floats).
    The codebook here is the deterministic md5-ordered sample (the
    IVF centroid recipe — TakeOrderedAndProject, bounded heap);
    production would refine it with emb_kmeans_update iterations.

    Scale shape: the codebook folds into ONE broadcast array row and
    every assignment is a map-side expression (the sim_ivf_ann
    pattern) — ZERO shuffles for encoding, regardless of corpus
    size.  Distances are sequential double folds, identical on both
    engines; ties break on centroid id."""
    from duckdb_hdfs_spark.functions.vectors import dot  # noqa: F401  (module convention)

    e = _t(spark, sf_dir, "embeddings")
    cent_arr = _pq_cent_arr(e)
    base = e.join(F.broadcast(cent_arr))
    bests = _pq_best_structs()
    # left-to-right d0..d7, matching the oracle's left-to-right sum:
    # float addition is order-dependent, and round(err, 6) can flip a
    # hash on boundary values if the association differs
    err = functools.reduce(lambda acc, b: acc + b["d"], bests[1:], bests[0]["d"])
    return base.select(
        "vec_id",
        *[b["cent_id"].alias(f"code_{m}") for m, b in enumerate(bests)],
        F.round(err, 6).alias("pq_err"),
    )


# --------------------------------------------------------------------------
def _adc_oracle() -> str:
    return f"""
WITH {_adc_ctes()}
SELECT probe_id, vec_id, round(CAST(adc AS DOUBLE), 6) AS adc_dist, rk
FROM (
    SELECT probe_id, vec_id, adc,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY adc, vec_id) AS rk
    FROM adc_scored
) WHERE rk <= 5
"""


def _pq_ptab(e: DataFrame, cent_arr: DataFrame) -> DataFrame:
    """Probe-to-centroid distance tables: one row per (probe,
    centroid) with the 8 per-subspace squared-L2 distances — P x 16
    rows, broadcastable.  ``cent_arr`` is any 1-row codebook whose
    ``cents`` structs carry ``cent_id``/``cent`` (the PQ sample or
    the richer IVF codebook).  Eagerly checkpointed: the tiny table
    feeds 8 join branches, and without the pin each branch re-derives
    the codebook sample scan (measured 18 file scans without)."""
    return (
        _probes(e)
        .select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe"))
        .join(F.broadcast(cent_arr))
        .select(
            "probe_id",
            F.explode("cents").alias("c"),
            F.col("pe"),
        )
        .select(
            "probe_id",
            F.col("c.cent_id").alias("cent_id"),
            *[
                F.expr(
                    f"CAST(round({_pq_sub_dist_sql('pe', 'c.cent', m)}, 9) "
                    f"AS DECIMAL(20,10))"
                ).alias(f"d{m}")
                for m in range(PQ_M)
            ],
        )
        .localCheckpoint(eager=True)
    )


def _adc_rank(joined: DataFrame, ptab: DataFrame) -> DataFrame:
    """ADC lookup + rank tail shared by the PQ searches: ``joined``
    is (probe_id, vec_id, code_0..7) candidate rows; each subspace
    code picks its distance from the broadcast ``ptab`` slice keyed
    (probe_id, cent_id), the 8 DECIMAL distances sum exactly
    (order-independent — matches the oracle's group-by sum), and the
    bounded partial top-k merge ranks per probe."""
    from duckdb_hdfs_spark.operators.similarity import _topk_merge

    for m in range(PQ_M):
        side = ptab.select(
            F.col("probe_id").alias(f"p{m}"),
            F.col("cent_id").alias(f"c{m}"),
            f"d{m}",
        )
        cond = (joined[f"code_{m}"] == side[f"c{m}"]) & (
            joined["probe_id"] == side[f"p{m}"]
        )
        joined = joined.join(F.broadcast(side), cond).drop(f"c{m}", f"p{m}")
    adc = sum(F.col(f"d{m}") for m in range(1, PQ_M)) + F.col("d0")
    scored = joined.filter(F.col("vec_id") != F.col("probe_id")).select(
        "probe_id",
        "vec_id",
        (-adc.cast("double")).alias("cos_sim"),
    )
    ranked = _topk_merge(scored, k=5)
    return ranked.select(
        "probe_id",
        "vec_id",
        F.round(-F.col("cos_sim"), 6).alias("adc_dist"),
        "rk",
    )


def _adc_topk(e: DataFrame, cent_arr: DataFrame | None = None) -> DataFrame:
    """ADC top-5 per probe over PQ codes, full corpus (the
    sim_pq_adc_topk body, reusable by the recall eval's pq arm).
    Returns (probe_id, vec_id, adc_dist, rk).

    ``cent_arr``: optional pre-built (checkpointed) codebook — the
    PQ sample and the IVF codebook are the SAME md5-ordered 16 rows,
    so multi-method callers (the recall eval) pass one shared build
    instead of paying a second corpus-wide sample pass."""
    # the codebook row and the probe tables are TINY (1 row; P x 16
    # rows) but feed many plan branches — eager checkpoints pin them
    # to one computation each, instead of re-deriving the codebook
    # sample scan per joined branch (measured 18 file scans without)
    if cent_arr is None:
        cent_arr = _pq_cent_arr(e).localCheckpoint(eager=True)
    enc = e.join(F.broadcast(cent_arr))
    codes = enc.select(
        "vec_id",
        *[
            b["cent_id"].alias(f"code_{m}")
            for m, b in enumerate(_pq_best_structs())
        ],
    )
    ptab = _pq_ptab(e, cent_arr)
    # pre-attach probe_id by broadcasting the tiny probe-id list onto
    # every code row (P rows per corpus row — the same fan-out the
    # ADC contract requires), then share _adc_rank's 8-way lookup +
    # decimal sum + top-k tail with the IVF+PQ path
    probe_ids = _probes(e).select(F.col("vec_id").alias("probe_id"))
    joined = codes.join(F.broadcast(probe_ids))
    return _adc_rank(joined, ptab)


@query("sim_pq_adc_topk", oracle=_adc_oracle())
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-5 per probe over PQ codes — the
    search path product quantization exists for: each probe computes
    one 8×16 distance table against the codebook, and every corpus
    vector's approximate distance is 8 TABLE LOOKUPS on its codes
    (no float vector is touched at scan time — at 100 TB the scan
    reads 8-byte codes instead of 256-byte vectors, a 32× I/O cut).

    Scale shape: the probe tables materialize as a tiny DataFrame
    (probes × codebook rows with the 8 per-subspace distances) and
    attach to the encoded corpus through 8 BROADCAST hash joins, one
    per subspace, keyed on that subspace's code — small constant
    build sides, no giant per-row expressions (a map-lookup
    formulation was measured to explode Catalyst planning), and no
    shuffle until the bounded partial top-k merge
    (operators/similarity._topk_merge).  The ADC sum runs
    left-to-right m = 0..7 on both engines — deterministic."""
    return _adc_topk(_t(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
def _mutual_knn_oracle() -> str:
    return f"""
WITH scored AS (
    SELECT a.vec_id AS probe_id, b.vec_id,
           row_number() OVER (PARTITION BY a.vec_id
               ORDER BY {cosine_sql('a.embedding', 'b.embedding')} DESC,
                        b.vec_id) AS rk
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
knn AS MATERIALIZED (SELECT probe_id, vec_id FROM scored WHERE rk <= 3),
mutual AS (
    SELECT k1.probe_id AS a, k1.vec_id AS b
    FROM knn k1 JOIN knn k2
      ON k1.probe_id = k2.vec_id AND k1.vec_id = k2.probe_id
    WHERE k1.probe_id < k1.vec_id
),
deg AS (
    SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM mutual UNION ALL SELECT b FROM mutual
    ) GROUP BY node
),
alln AS (
    SELECT e.vec_id, coalesce(deg.d, 0) AS mutual_degree
    FROM embeddings e LEFT JOIN deg ON e.vec_id = deg.node
)
SELECT mutual_degree, count(*) AS n_vectors
FROM alln GROUP BY mutual_degree
"""


@query("sim_mutual_knn_graph", oracle=_mutual_knn_oracle())
def sim_mutual_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-3-NN graph degree histogram (round 5): an edge exists
    when BOTH endpoints rank each other in their top-3 — the
    kNN-graph symmetrization behind graph-based clustering and
    hubness diagnostics (a spike at degree 0 means isolated vectors;
    missing high degrees means hub domination).

    Scale BOUND (made explicit, round-7 review): the probe side of
    brute_topk here is the ENTIRE corpus, and brute_topk broadcasts
    its probes — so this exact formulation is bounded by the driver /
    broadcast limit (~10⁶ × d=64 vectors ≈ 0.5 GB; Spark's broadcast
    hard cap is 8 GB).  That is inherent to EXACT all-pairs kNN
    (Ω(N²) work regardless of plan shape); beyond the bound the
    graph is built from an ANN neighbor list instead (ivf_ann /
    lsh_ann produce the same (probe, vec) edge shape and everything
    downstream — checkpoint, mutuality self-join, degree rollup — is
    unchanged and N-bounded)."""
    from duckdb_hdfs_spark.operators.similarity import brute_topk

    emb = _t(spark, sf_dir, "embeddings")
    knn = (
        # every vector probes: the N² score map is the wall — take the
        # unrolled-dot branch (1.3× at sf0.1's 4M pairs, round 14)
        brute_topk(
            emb.select("vec_id", "embedding"),
            emb,
            k=3,
            exclude_self=True,
            unrolled_dot=True,
        )
        .select("probe_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    k2 = knn.select(
        F.col("probe_id").alias("p2"), F.col("vec_id").alias("v2")
    )
    mutual = knn.join(
        k2, (F.col("probe_id") == F.col("v2")) & (F.col("vec_id") == F.col("p2"))
    ).filter(F.col("probe_id") < F.col("vec_id"))
    deg = (
        mutual.select(F.col("probe_id").alias("node"))
        .unionAll(mutual.select(F.col("vec_id").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return (
        emb.select("vec_id")
        .join(deg, F.col("vec_id") == F.col("node"), "left")
        .select(F.coalesce(F.col("d"), F.lit(0)).alias("mutual_degree"))
        .groupBy("mutual_degree")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


# --------------------------------------------------------------------------
@query(
    "sim_knn_label_accuracy",
    oracle=f"""
WITH p AS (SELECT vec_id AS probe_id, embedding AS pe, label AS plabel
           FROM embeddings WHERE vec_id % 5 = 0),
scored AS (
    SELECT p.probe_id, p.plabel, c.vec_id, c.label,
           {cosine_sql('p.pe', 'c.embedding')} AS cos_raw
    FROM embeddings c, p
    WHERE c.vec_id <> p.probe_id
),
nn AS (
    SELECT probe_id, plabel, label FROM (
        SELECT probe_id, plabel, label,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cos_raw DESC, vec_id) AS rk
        FROM scored) t
    WHERE rk <= 3
),
votes AS (
    SELECT probe_id, plabel, label, count(*) AS v
    FROM nn GROUP BY 1, 2, 3
),
pred AS (
    SELECT probe_id, plabel, label AS pred_label FROM (
        SELECT probe_id, plabel, label,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY v DESC, label) AS rk
        FROM votes) t
    WHERE rk = 1
)
SELECT plabel AS label,
       count(*) AS n_probes,
       CAST(sum(CASE WHEN pred_label = plabel THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       round(CAST(sum(CASE WHEN pred_label = plabel THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 4) AS accuracy
FROM pred GROUP BY plabel
""",
)
def sim_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 3-NN classification accuracy per label — the
    standard embedding-quality eval (if labels aren't recoverable
    from neighborhoods, the embedding space is noise and every
    downstream ANN/cluster pass inherits it).  Majority vote over the
    3 nearest neighbors, ties broken to the smallest label on both
    engines.

    Scale shape: reuses brute_topk — probes broadcast, corpus scored
    map-side, per-partition partial top-k ahead of the only corpus
    shuffle.  Neighbor labels attach via a broadcast join on the tiny
    (probes × 3) winner set; the vote and the accuracy rollup are
    probe-keyed partitioned windows and partial-aggregated group-bys.
    The 100 TB upgrade swaps brute_topk for the IVF/PQ path — the
    vote/accuracy stages are index-agnostic."""
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 5 == 0)
    winners = brute_topk(
        probes.select("vec_id", "embedding"), emb, k=3, exclude_self=True
    )
    clabels = emb.select("vec_id", "label")
    nn = clabels.join(F.broadcast(winners), "vec_id")
    votes = nn.groupBy("probe_id", "label").agg(F.count(F.lit(1)).alias("v"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("v"), F.asc("label"))
    pred = (
        votes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("probe_id", F.col("label").alias("pred_label"))
    )
    truth = probes.select(
        F.col("vec_id").alias("probe_id"), F.col("label").alias("plabel")
    )
    correct = F.when(F.col("pred_label") == F.col("plabel"), 1).otherwise(0)
    return (
        pred.join(F.broadcast(truth), "probe_id")
        .groupBy(F.col("plabel").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(correct).alias("n_correct"),
            F.round(
                F.sum(correct).cast("double") / F.count(F.lit(1)), 4
            ).alias("accuracy"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "emb_matryoshka_recall",
    oracle=f"""
WITH p AS (SELECT vec_id AS probe_id, embedding AS pe,
                  embedding[1:16] AS pe16
           FROM embeddings WHERE vec_id % 20 = 0),
full_nn AS (
    SELECT probe_id, vec_id FROM (
        SELECT p.probe_id, c.vec_id,
               row_number() OVER (PARTITION BY p.probe_id
                    ORDER BY {cosine_sql('p.pe', 'c.embedding')} DESC,
                             c.vec_id) AS rk
        FROM embeddings c, p
        WHERE c.vec_id <> p.probe_id) t
    WHERE rk <= 5
),
trunc_nn AS (
    SELECT probe_id, vec_id FROM (
        SELECT p.probe_id, c.vec_id,
               row_number() OVER (PARTITION BY p.probe_id
                    ORDER BY {cosine_sql('p.pe16', 'c.e16')} DESC,
                             c.vec_id) AS rk
        FROM (SELECT vec_id, embedding[1:16] AS e16 FROM embeddings) c, p
        WHERE c.vec_id <> p.probe_id) t
    WHERE rk <= 5
)
SELECT f.probe_id,
       CAST(count(t.vec_id) AS BIGINT) AS n_overlap,
       round(CAST(count(t.vec_id) AS DOUBLE) / 5, 2) AS recall_at_5
FROM full_nn f
LEFT JOIN trunc_nn t
  ON f.probe_id = t.probe_id AND f.vec_id = t.vec_id
GROUP BY f.probe_id
""",
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation eval: recall@5 of exact
    top-k computed on the FIRST 16 of 64 dimensions vs the full-dim
    top-k — the go/no-go number for serving truncated embeddings
    (MRL-trained models keep this high; if recall craters, the index
    can't shed dimensions).  At 100 TB a 4× dimension cut is a 4× cut
    in scan bytes, shuffle volume, and ANN memory — this eval prices
    that trade.

    Scale shape: both arms are brute_topk (broadcast probes, map-side
    scoring, partial top-k before the only shuffle); the truncated
    arm slices vectors map-side.  The overlap join runs on the tiny
    probes × 5 winner sets."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 20 == 0)
    sliced = F.slice(F.col("embedding"), 1, 16).alias("embedding")
    full_nn = brute_topk(
        probes.select("vec_id", "embedding"), emb, k=5, exclude_self=True
    )
    trunc_nn = brute_topk(
        probes.select("vec_id", sliced),
        emb.select("vec_id", sliced),
        k=5,
        exclude_self=True,
    )
    hits = trunc_nn.select("probe_id", "vec_id", F.lit(1).alias("hit"))
    return (
        full_nn.join(F.broadcast(hits), ["probe_id", "vec_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.count("hit").alias("n_overlap"),
            F.round(F.count("hit").cast("double") / 5, 2).alias(
                "recall_at_5"
            ),
        )
    )


# --------------------------------------------------------------------------
def _ivf_sweep_oracle() -> str:
    truth = f"""
    SELECT probe_id, vec_id FROM (
        SELECT p.vec_id AS probe_id, c.vec_id,
               row_number() OVER (PARTITION BY p.vec_id
                   ORDER BY {cosine_sql('p.embedding', 'c.embedding')} DESC,
                            c.vec_id) AS rk
        FROM embeddings c, (SELECT * FROM embeddings WHERE {_PROBE_FILTER}) p
        WHERE c.vec_id <> p.vec_id
    ) WHERE rk <= 5"""
    arms = []
    for p in (1, 2, 4):
        arms.append(f"""
SELECT CAST({p} AS BIGINT) AS nprobe,
       count(*) AS n_probes,
       round(avg(r), 4) AS recall_at_5
FROM (
    SELECT t.probe_id, CAST(count(a.vec_id) AS DOUBLE) / count(*) AS r
    FROM truth t LEFT JOIN (
        SELECT probe_id, vec_id FROM (
            SELECT cand.probe_id, cand.vec_id,
                   row_number() OVER (PARTITION BY cand.probe_id
                       ORDER BY {cosine_sql('pe.embedding', 'ce.embedding')}
                                DESC, cand.vec_id) AS rk
            FROM ({_ivf_cand_sql(16, p)}) cand
            JOIN embeddings pe ON pe.vec_id = cand.probe_id
            JOIN embeddings ce ON ce.vec_id = cand.vec_id
        ) WHERE rk <= 5
    ) a ON t.probe_id = a.probe_id AND t.vec_id = a.vec_id
    GROUP BY t.probe_id
)""")
        
    return f"WITH truth AS ({truth})\n" + "\nUNION ALL\n".join(arms)


@query("sim_ivf_probe_sweep", oracle=_ivf_sweep_oracle())
def sim_ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe sweep: recall@5 at nprobe ∈ {1, 2, 4} against the
    exact top-5 — the latency/recall dial of an IVF index priced in
    one eval (nprobe is THE production knob: scan cost grows linearly
    with it, recall saturates; this table shows where).  Completes
    the calibration family: dedup_lsh_band_sweep prices banded
    dedup, this prices IVF search.

    Scale shape: truth and each nprobe arm are eagerly checkpointed
    (probes × 5 rows each) so the recall joins run over tiny
    materialized sets; each arm reuses the same map-side IVF
    machinery (broadcast codebook argmax assignment, partial top-k
    before the only shuffle)."""
    from duckdb_hdfs_spark.operators.genutil import parallel_checkpoints
    from duckdb_hdfs_spark.operators.similarity import centroid_codebook

    emb = _t(spark, sf_dir, "embeddings")
    probes = _probes(emb)
    # ONE corpus-wide codebook sample shared by all three arms — at
    # scale each build is a full corpus pass, so per-arm rebuilds
    # triple the sampling cost for bit-identical 16 rows.  Checkpoint
    # WAVES (guide §2.6, round 14): truth ∥ codebook, then the three
    # nprobe arms concurrently — five serial jobs become two waves.
    truth, cent_arr = parallel_checkpoints(
        brute_topk(probes, emb, k=5).select("probe_id", "vec_id"),
        centroid_codebook(emb, 16),
    )
    approxes = parallel_checkpoints(
        *[
            ivf_ann(
                probes, emb, n_cells=16, nprobe=p, k=5, cent_arr=cent_arr
            ).select("probe_id", "vec_id")
            for p in (1, 2, 4)
        ]
    )
    arms = [
        _per_probe_recall(truth, approx).agg(
            F.lit(p).cast("long").alias("nprobe"),
            F.count(F.lit(1)).alias("n_probes"),
            F.round(F.avg("r"), 4).alias("recall_at_5"),
        )
        for p, approx in zip((1, 2, 4), approxes)
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


# --------------------------------------------------------------------------
@query(
    "sim_range_search",
    oracle=f"""
WITH p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
           WHERE {_PROBE_FILTER})
SELECT probe_id, vec_id, round(cos_raw, 6) AS cos_sim
FROM (
    SELECT p.probe_id, c.vec_id,
           {cosine_sql('p.pe', 'c.embedding')} AS cos_raw
    FROM embeddings c, p
    WHERE c.vec_id <> p.probe_id
) t
WHERE cos_raw >= 0.25
""",
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (radius) similarity search: ALL corpus vectors with
    cosine ≥ τ = 0.25 per probe — the threshold-query counterpart of
    top-k (dedup wants 'everything above τ', not 'the best 5'; a
    top-k index silently truncates dense neighborhoods).  The
    threshold compares the RAW fold cosine (bit-identical across
    engines); rounding is output-only.

    Scale shape: probes broadcast, corpus scored map-side, and the
    τ-filter applies BEFORE any shuffle — the result set (not the
    score set) is all that moves; no top-k state at all.  The 100 TB
    path puts the same filter after an IVF/LSH candidate stage."""
    from duckdb_hdfs_spark.functions.vectors import (
        dot_fold_sql_spark,
        norm_fold_expr,
    )
    from duckdb_hdfs_spark.operators.rebalance import rebalance_cpu_heavy

    emb = _t(spark, sf_dir, "embeddings")
    # norms once per VECTOR before the pair join (round 14 — the
    # inline cosine recomputed both fold norms per PAIR, 3 interpreted
    # folds per candidate; same fold expression on the same rows, so
    # the quotient is bit-identical and the τ-filter decision cannot
    # move)
    p = _probes(emb).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        norm_fold_expr("embedding").alias("pn"),
    )
    c = rebalance_cpu_heavy(emb.select("vec_id", "embedding")).withColumn(
        "cn", norm_fold_expr("embedding")
    )
    cos_raw = F.expr(
        f"{dot_fold_sql_spark('pe', 'embedding')} / (pn * cn)"
    )
    return (
        c.join(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn("cos_raw", cos_raw)
        .filter(F.col("cos_raw") >= 0.25)
        .select(
            "probe_id",
            "vec_id",
            F.round("cos_raw", 6).alias("cos_sim"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "sim_ivf_cell_stats",
    oracle=f"""
SELECT cent_id, count(*) AS n_vectors
FROM (
    SELECT vec_id, cent_id FROM (
        SELECT e.vec_id, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {cosine_sql('e.embedding', 'c.cent')} DESC,
                            c.cent_id) AS crk
        FROM embeddings e, (
            SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16
        ) c
    ) WHERE crk = 1
)
GROUP BY cent_id
""",
)
def sim_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-size histogram — the load-balance monitor for the IVF
    index (dedup_lsh_bucket_stats' sibling): a skewed cell is both a
    probe-latency straggler and a recall risk (its vectors crowd out
    neighbors in fixed-k scans).  Read next to sim_ivf_probe_sweep
    when sizing n_cells for a corpus.

    Scale shape: the same map-side assignment ivf_ann uses — the
    16-centroid codebook folds into ONE broadcast array row, each
    vector scores all centroids inside a transform() and keeps its
    argmax WITHOUT any corpus-keyed Exchange — then one 16-group
    partial-aggregated count."""
    from duckdb_hdfs_spark.functions.vectors import norm_fold_expr
    from duckdb_hdfs_spark.operators.rebalance import rebalance_cpu_heavy
    from duckdb_hdfs_spark.operators.similarity import (
        assign_nearest,
        centroid_codebook,
    )

    emb = _t(spark, sf_dir, "embeddings")
    corpus = rebalance_cpu_heavy(
        emb.select("vec_id", F.col("embedding").alias("ce"))
    ).select("vec_id", "ce", norm_fold_expr("ce").alias("cn"))
    assigned = assign_nearest(
        corpus, centroid_codebook(emb, 16), "ce", "cn", top=1
    )
    return assigned.groupBy("cent_id").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


# --------------------------------------------------------------------------
def _ivf_pq_oracle() -> str:
    return f"""
WITH {_adc_ctes()},
cand AS ({_ivf_cand_sql()}),
restricted AS (
    SELECT a.probe_id, a.vec_id, a.adc
    FROM adc_scored a
    JOIN cand ON cand.probe_id = a.probe_id AND cand.vec_id = a.vec_id
)
SELECT probe_id, vec_id, round(CAST(adc AS DOUBLE), 6) AS adc_dist, rk
FROM (
    SELECT probe_id, vec_id, adc,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY adc, vec_id) AS rk
    FROM restricted
) WHERE rk <= 5
"""


@query("sim_ivf_pq_topk", oracle=_ivf_pq_oracle())
def sim_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ combined search (round 8) — the production ANN index
    shape (FAISS IVFPQ, Jégou et al. 2011): IVF routes each probe to
    its nprobe=2 nearest of 16 cells, and only the vectors IN those
    cells are scored — by ADC table lookups over their 8-byte PQ
    codes, not their float vectors.  sim_ivf_ann prunes the corpus
    but scans floats; sim_pq_adc_topk compresses the scan but visits
    everything; this composes both prunings, which is why it is the
    index every billion-vector deployment actually builds.

    Scale shape: ONE corpus scan computes BOTH prunings map-side —
    each vector's IVF cell (broadcast-codebook argmax) and its 8 PQ
    codes come out of the same projection, so the 100 TB pass reads
    every embedding exactly once and emits only (vec_id, cell, 8
    codes).  Candidates attach by broadcasting the tiny P x nprobe
    probe-routing table onto the cell column (corpus x
    nprobe/n_cells expected, never corpus x P, and NO corpus-keyed
    shuffle at all — the earlier two-scan formulation paid a vec_id
    Exchange to re-join codes to candidates), the 8 ADC lookups are
    broadcast hash joins against the P x 16 distance tables, and the
    final rank is the bounded partial top-k merge.

    Determinism: the SAME md5-sample codebook drives cells and PQ
    (roles differ — _pq_best_structs reads cent_id/cent from the
    richer IVF structs); per-subspace distances round to 9 decimals
    into DECIMAL sums (the ADC contract), ranks tie on vec_id."""
    from duckdb_hdfs_spark.functions.vectors import (
        dot_fold_sql_spark,
        norm_fold_expr,
    )
    from duckdb_hdfs_spark.operators.rebalance import rebalance_cpu_heavy
    from duckdb_hdfs_spark.operators.similarity import (
        assign_nearest,
        centroid_codebook,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # ONE checkpointed codebook feeds cells, codes, routing, and the
    # probe distance tables: the TakeOrdered sample scan runs once
    cent_arr = centroid_codebook(emb, 16).localCheckpoint(eager=True)
    # probe routing: P x nprobe=2 rows — tiny; checkpoint so the
    # probe-side scan leaves the corpus plan entirely
    routing = (
        assign_nearest(
            _probes(emb).select(
                F.col("vec_id").alias("probe_id"),
                F.col("embedding").alias("pe"),
                norm_fold_expr("embedding").alias("pn"),
            ),
            cent_arr,
            "pe",
            "pn",
            2,
        )
        .select("probe_id", "cent_id")
        .localCheckpoint(eager=True)
    )
    ptab = _pq_ptab(emb, cent_arr)
    # the fused corpus scan: cell argmax (assign_nearest's expression,
    # top=1 as array_min) + the 8 PQ code argmins, all map-side
    enc = (
        rebalance_cpu_heavy(emb.select("vec_id", "embedding"))
        .withColumn("_n", norm_fold_expr("embedding"))
        .join(F.broadcast(cent_arr))
    )
    cell_scored = F.expr(
        f"transform(cents, c -> named_struct("
        f"'neg_cos', -({dot_fold_sql_spark('embedding', 'c.cent')}"
        f" / (_n * c.cent_n)), "
        f"'cent_id', c.cent_id))"
    )
    codes = enc.select(
        "vec_id",
        F.array_min(cell_scored)["cent_id"].alias("cent_id"),
        *[
            b["cent_id"].alias(f"code_{m}")
            for m, b in enumerate(_pq_best_structs())
        ],
    )
    joined = (
        codes.join(F.broadcast(routing), "cent_id")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .drop("cent_id")
    )
    return _adc_rank(joined, ptab)


# --------------------------------------------------------------------------
def _cos_diversity_oracle() -> str:
    c = cosine_sql("a.embedding", "b.embedding")
    return f"""
WITH a AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
b AS (SELECT vec_id - 1 AS vec_id, embedding
      FROM embeddings WHERE vec_id % 2 = 1),
p AS (
    SELECT round({c}, 6) AS cr
    FROM a JOIN b USING (vec_id)
)
SELECT least(CAST(floor((cr + 1) * 10) AS BIGINT), 19) AS cos_bin,
       count(*) AS n_pairs,
       round(CAST(sum(CAST(cr AS DECIMAL(20,8))) AS DOUBLE) / count(*), 6)
           AS mean_cos
FROM p
GROUP BY 1
"""


@query("emb_cosine_diversity", oracle=_cos_diversity_oracle())
def emb_cosine_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-diversity histogram: cosine similarity of a
    deterministic DISJOINT pairing (vec 2k with vec 2k+1 — ids carry
    no embedding-space meaning, so the pairing is an unbiased
    similarity sample at exactly n/2 pairs), bucketed into 0.1-wide
    bins over [-1, 1).  The SemDeDup-era diversity audit: a healthy
    diverse corpus concentrates near 0; mass migrating into the
    high-cos bins is the collapse signal that precedes dedup — the
    DISTRIBUTION companion to dedup_semdedup's verdicts and
    dedup_embedding_threshold_sweep's cutoff curve.

    Determinism: the sequential-fold cosine is bit-identical
    cross-engine (functions/vectors.py); it rounds to 6dp BEFORE
    binning and DECIMAL-sums for the bin means, so bin membership
    and means hash-match.

    Scale shape: one equi-join shuffle on the derived pair key (no
    self-join explosion — the pairing is 1:1 by construction), then
    a 20-row partial-aggregated histogram fold."""
    from duckdb_hdfs_spark.functions.vectors import cosine

    emb = _t(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0).select(
        "vec_id", F.col("embedding").alias("ea")
    )
    b = emb.filter(F.col("vec_id") % 2 == 1).select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").alias("eb"),
    )
    cr = F.round(cosine(F.col("ea"), F.col("eb")), 6)
    p = a.join(b, "vec_id").select(cr.alias("cr"))
    return p.groupBy(
        F.least(F.floor((F.col("cr") + 1) * 10), F.lit(19))
        .cast("bigint")
        .alias("cos_bin")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum(F.col("cr").cast("decimal(20,8)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_cos"),
    )


# --------------------------------------------------------------------------
#: Hubness probe stride (denser than the top-k demo probes: the
#: k-occurrence distribution needs enough queries to populate its
#: tail) and the kNN depth it counts occurrences at.
HUB_STRIDE = 10
HUB_K = 5


def _hubness_oracle() -> str:
    return f"""
WITH p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
           WHERE vec_id % {HUB_STRIDE} = 0),
scored AS (
    SELECT p.probe_id, c.vec_id,
           {cosine_sql('p.pe', 'c.embedding')} AS cos_raw
    FROM embeddings c, p
    WHERE c.vec_id <> p.probe_id
),
top AS (
    SELECT vec_id FROM (
        SELECT probe_id, vec_id,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cos_raw DESC, vec_id) AS rk
        FROM scored
    ) t WHERE rk <= {HUB_K}
),
occ AS (SELECT vec_id, count(*) AS n_k FROM top GROUP BY vec_id),
nc AS (SELECT count(*) AS n_corpus FROM embeddings),
np AS (SELECT count(*) AS n_probes FROM embeddings
       WHERE vec_id % {HUB_STRIDE} = 0),
mom AS (
    SELECT CAST(sum(CAST(n_k AS DECIMAL(20,0))) AS DOUBLE) AS s1,
           CAST(sum(CAST(n_k AS DECIMAL(20,0)) * n_k) AS DOUBLE) AS s2,
           CAST(sum(CAST(n_k AS DECIMAL(20,0)) * n_k * n_k) AS DOUBLE)
               AS s3,
           count(*) AS n_hit
    FROM occ
),
sk AS (
    SELECT round(
        (s3 / n_corpus
         - 3 * (s1 / n_corpus) * (s2 / n_corpus)
         + 2 * (s1 / n_corpus) * (s1 / n_corpus) * (s1 / n_corpus))
        / nullif((s2 / n_corpus - (s1 / n_corpus) * (s1 / n_corpus))
                 * sqrt(s2 / n_corpus
                        - (s1 / n_corpus) * (s1 / n_corpus)), 0), 6)
            AS skew,
        n_hit
    FROM mom, nc
),
hist AS (
    SELECT n_k AS k_occurrence, count(*) AS n_vectors FROM occ GROUP BY n_k
    UNION ALL
    SELECT 0 AS k_occurrence, nc.n_corpus - sk.n_hit AS n_vectors
    FROM nc, sk WHERE nc.n_corpus > sk.n_hit
)
SELECT CAST(h.k_occurrence AS BIGINT) AS k_occurrence,
       CAST(h.n_vectors AS BIGINT) AS n_vectors,
       CAST(np.n_probes AS BIGINT) AS n_probes,
       sk.skew AS occurrence_skewness
FROM hist h CROSS JOIN np CROSS JOIN sk
"""


@query("sim_hubness_koccurrence", oracle=_hubness_oracle())
def sim_hubness_koccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence hubness audit (round 9; Radovanović et al. 2010):
    how many probes' top-5 lists each corpus vector appears in.  In
    high dimension the N_k distribution skews right — a few 'hub'
    vectors show up in everyone's neighbor list while antihubs are
    never retrieved — which silently corrupts kNN labels, recall
    evals, and embedding-dedup thresholds.  Emits the N_k histogram
    (zeros included) and its skewness: the single drift number to
    alarm on before trusting any of this module's neighbor ops.

    Determinism: occurrence counts are exact integers; the zero
    bucket and the three moment sums enter through the algebra
    (Σc, Σc², Σc³ over hit vectors + the corpus count — zeros never
    materialize); skewness assembles in fixed-order doubles with a
    mirrored zero-variance guard.

    Scale shape: the kNN pass is brute_topk's shape (probes
    broadcast, corpus never shuffled, WindowGroupLimit bounded
    heap); the occurrence rollup is one partial-agged shuffle of
    probes×k rows; the histogram and moments are panel-sized."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % HUB_STRIDE == 0)
    top = brute_topk(probes, emb, k=HUB_K)
    occ = (
        top.groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_k"))
        .localCheckpoint(eager=True)
    )
    nc = emb.agg(F.count(F.lit(1)).alias("n_corpus"))
    np_ = probes.agg(F.count(F.lit(1)).alias("n_probes"))
    cd = F.col("n_k").cast("decimal(20,0)")
    mom = occ.agg(
        F.sum(cd).cast("double").alias("s1"),
        F.sum(cd * F.col("n_k")).cast("double").alias("s2"),
        F.sum(cd * F.col("n_k") * F.col("n_k")).cast("double").alias("s3"),
        F.count(F.lit(1)).alias("n_hit"),
    )
    n = F.col("n_corpus").cast("double")
    m1 = F.col("s1") / n
    m2 = F.col("s2") / n - m1 * m1
    m3 = F.col("s3") / n - 3 * m1 * (F.col("s2") / n) + 2 * m1 * m1 * m1
    sk = (
        mom.join(F.broadcast(nc))
        .select(
            F.round(
                m3 / F.nullif(m2 * F.sqrt(m2), F.lit(0.0)), 6
            ).alias("skew"),
            "n_hit",
            "n_corpus",
        )
        .localCheckpoint(eager=True)
    )
    hist = (
        occ.groupBy(F.col("n_k").alias("k_occurrence"))
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .unionByName(
            sk.filter(F.col("n_corpus") > F.col("n_hit")).select(
                F.lit(0).alias("k_occurrence"),
                (F.col("n_corpus") - F.col("n_hit")).alias("n_vectors"),
            )
        )
    )
    return (
        hist.join(F.broadcast(np_))
        .join(F.broadcast(sk.select("skew")))
        .select(
            F.col("k_occurrence").cast("bigint").alias("k_occurrence"),
            F.col("n_vectors").cast("bigint").alias("n_vectors"),
            F.col("n_probes").cast("bigint").alias("n_probes"),
            F.col("skew").alias("occurrence_skewness"),
        )
    )
