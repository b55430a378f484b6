"""Advanced operator battery (SURVEY.md §2.9): as-of join, range
join, deterministic hash-split sampling, exact quantiles, moment
statistics, edit-distance fuzzy pairs, unpivot — the DuckDB surface
(ASOF JOIN, quantile_cont, levenshtein, UNPIVOT, USING SAMPLE) the
reference serves over HDFS, re-expressed Spark-first.

Cross-engine notes (verified by probe, tests/test_oracle_parity.py):
- Spark ``percentile`` == DuckDB ``quantile_cont`` (same linear
  interpolation) bit-exactly;
- ``stddev_samp/var_samp/covar_samp`` identical, ``corr`` differs in
  the last ulp (rounded); skewness/kurtosis use DIFFERENT definitions
  (sample vs population) — deliberately not exposed;
- ``levenshtein`` identical integer metric in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_hdfs_spark.functions.hashing import (
    fold_lower,
    fold_lower_sql,
    md5_int60,
    md5_int60_sql,
    ws_fold,
)
from duckdb_hdfs_spark.operators.joins import asof_backward, range_join_count
from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _dsum, _t


# --------------------------------------------------------------------------
@query(
    "asof_purchase_last_view",
    oracle="""
WITH v AS (
    SELECT user_id, ts AS view_ts, max(event_id) AS view_event_id
    FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
p AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, v.view_event_id, v.view_ts,
       epoch_us(p.ts) - epoch_us(v.view_ts) AS lag_us
FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.view_ts
""",
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each purchase matched to the user's most
    recent view at-or-before it — DuckDB ``ASOF JOIN`` parity via the
    union-sort formulation (one shuffle, no per-key pair explosion;
    see operators/joins.py)."""
    ev = _t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("view_ts"))
        .agg(F.max("event_id").alias("view_event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    matched = asof_backward(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="view_ts",
        payload=["view_event_id", "view_ts"],
    )
    return matched.select(
        "event_id",
        "user_id",
        "ts",
        "view_event_id",
        "view_ts",
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("view_ts"))
        ).alias("lag_us"),
    )


# --------------------------------------------------------------------------
@query(
    "range_join_view_purchases",
    oracle="""
SELECT v.event_id AS view_event_id,
       count(*) AS n_purchases_1h,
       CAST(round(sum(CAST(p.value AS DECIMAL(28,6))), 2) AS DOUBLE)
           AS purchase_value_1h
FROM events v
JOIN events p ON v.user_id = p.user_id
             AND v.event_type = 'view' AND p.event_type = 'purchase'
             AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
GROUP BY v.event_id
""",
)
def range_join_view_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: purchases within 1 hour after each view, per
    user — equi-join on user_id with the time range as a residual
    (sort-merge, per-key bounded)."""
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event_id"), F.col("ts").alias("vts")
    )
    # pval: both sides derive from the same ev frame, so the payload
    # column needs a side-unique name for the self-join analyzer
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("value").alias("pval")
    )
    # through the shared interval-join operator (round-7 review: this
    # query hand-rolled the identical join+aggregate while importing
    # range_join_count and never calling it)
    return range_join_count(
        views,
        purchases,
        on="user_id",
        lower=views["vts"],
        upper=views["vts"] + F.expr("INTERVAL 1 HOUR"),
        right_ts="pts",
        aggs=[
            F.count(F.lit(1)).alias("n_purchases_1h"),
            _dsum(F.col("pval")).alias("purchase_value_1h"),
        ],
        group=["view_event_id"],
    )


# --------------------------------------------------------------------------
@query(
    "sample_hash_split",
    oracle=f"""
SELECT doc_id, b AS bucket,
       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END
           AS split
FROM (SELECT doc_id, {md5_int60_sql("CAST(doc_id AS VARCHAR)")} % 100 AS b
      FROM documents)
""",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split via content-hash
    bucketing — the reproducible alternative to USING SAMPLE for
    training pipelines: stable under reruns, re-partitioning, and
    incremental corpus growth (a doc's split never changes)."""
    docs = _t(spark, sf_dir, "documents")
    b = md5_int60(F.col("doc_id").cast("string")) % 100
    return docs.select(
        "doc_id",
        b.alias("bucket"),
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
    )


# --------------------------------------------------------------------------
@query(
    "stats_quantiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       round(quantile_cont(l_extendedprice, 0.90), 6) AS p90
FROM lineitem GROUP BY l_returnflag
""",
)
def stats_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group — Spark ``percentile``
    == DuckDB ``quantile_cont`` bit-for-bit.  (approx_percentile is
    the sketch path at scale; exposed rows-only as
    distinct_users_approx is for HLL.)"""
    li = _t(spark, sf_dir, "lineitem")
    # ONE array-percentile aggregate, not four scalar ones: each
    # percentile() buffers the ENTIRE column in its own aggregation
    # state (21.5 MB of shuffled partials for 4.6 MB of input — 4
    # copies; guide §2.3 shuffle fewer bytes) and re-sorts it at eval.
    # The array form shares one buffer and one sort; element k is
    # bit-identical to the scalar call (same sorted data, same
    # interpolation).  Measured 9.3s → 2.4s at sf0.1, round 13.
    names = (("p25", 0.25), ("p50", 0.50), ("p75", 0.75), ("p90", 0.90))
    qarr = ", ".join(str(q) for _, q in names)
    g = li.groupBy("l_returnflag").agg(
        F.expr(f"percentile(l_extendedprice, array({qarr}))").alias("_qs")
    )
    return g.select(
        "l_returnflag",
        *[
            F.round(F.col("_qs").getItem(i), 6).alias(name)
            for i, (name, _) in enumerate(names)
        ],
    )


# --------------------------------------------------------------------------
@query(
    "stats_moments",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS price_sd,
       round(var_samp(l_extendedprice), 2) AS price_var,
       round(covar_samp(l_extendedprice, l_quantity), 2) AS price_qty_cov,
       round(regr_sxy(l_extendedprice, l_quantity)
             / nullif(sqrt(regr_sxx(l_extendedprice, l_quantity)
                           * regr_syy(l_extendedprice, l_quantity)), 0), 6)
           AS price_qty_corr
FROM lineitem GROUP BY l_returnflag
""",
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group (identical estimator
    definitions across engines; corr rounded for last-ulp drift).

    Pearson r is composed from the regr_* co-moments with a mirrored
    nullif guard instead of the builtin ``corr`` (constant-data audit,
    round 10): a zero-variance group makes Spark's ANSI ``corr``
    RAISE DIVIDE_BY_ZERO while DuckDB's yields NULL — the co-moment
    form (sxy/√(sxx·syy), exactly corr's internal formula) NULLs out
    identically on both engines, and on non-degenerate groups the
    round(6) grain absorbs the accumulation-path difference just as
    it did for the builtin."""
    li = _t(spark, sf_dir, "lineitem")
    sxy = F.regr_sxy("l_extendedprice", "l_quantity")
    sxx = F.regr_sxx("l_extendedprice", "l_quantity")
    syy = F.regr_syy("l_extendedprice", "l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_sd"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("price_var"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias(
            "price_qty_cov"
        ),
        F.round(
            sxy / F.nullif(F.sqrt(sxx * syy), F.lit(0.0)), 6
        ).alias("price_qty_corr"),
    )


# --------------------------------------------------------------------------
@query(
    "text_levenshtein_pairs",
    oracle=f"""
WITH t AS (
    SELECT doc_id, lang, source,
           {fold_lower_sql("substr(text, 1, 24)")} AS pre
    FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.pre, b.pre) AS lev
FROM t a
JOIN t b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE levenshtein(a.pre, b.pre) <= 15
""",
)
def text_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs by edit distance on a 24-char prefix,
    blocked by (lang, source) — identical integer metric in both
    engines.  Blocking bounds the pair count (at 100 TB the block key
    would be a coarse fingerprint, same shape)."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        "source",
        # fold_lower: a special-cased codepoint in the prefix would
        # diverge the group key cross-engine (unicode audit r9)
        fold_lower(F.substring("text", 1, 24)).alias("pre"),
    )
    a, b = t.alias("a"), t.alias("b")
    lev = F.levenshtein(F.col("a.pre"), F.col("b.pre"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(lev <= 15)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            lev.alias("lev"),
        )
    )


# --------------------------------------------------------------------------
PACK_BUDGET = 2048  # tokens per context window


@query(
    "pack_context_windows",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, lang,
           len(string_split_regex(lower(translate(text, chr(11), chr(9))), '\\s+')) AS n_tokens
    FROM documents
),
cum AS (
    SELECT doc_id, lang, n_tokens,
           sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
    FROM toks
)
SELECT lang, CAST((cum_tokens - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin_id,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM cum
GROUP BY lang, bin_id
""",
)
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential context-window packing: docs (in stable doc_id order
    per lang shard) fill {PACK_BUDGET}-token bins; a doc starts in the
    bin its preceding cumulative token count falls into — the
    deterministic, restart-safe packing a pretraining data loader
    needs (bin assignment depends only on the ordered shard prefix,
    never on partitioning).

    Scale shape (round 7): the running total comes from
    operators.ranks.grouped_cumsum (range-bucketed local cumsums +
    broadcast per-group prefix offsets) instead of a
    ``PARTITION BY lang`` window — a handful of lang shards would
    otherwise serialize the whole corpus through as many tasks."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.size(F.split(F.lower(ws_fold(F.col("text"))), r"\s+")).alias("n_tokens")
    )
    cum = grouped_cumsum(
        toks, ["lang"], [("doc_id", "asc")], "n_tokens", "cum_tokens"
    )
    # integral division on both sides — double-division + cast would
    # round in DuckDB but truncate in Spark
    binned = cum.withColumn(
        "bin_id", F.expr(f"(cum_tokens - n_tokens) div {PACK_BUDGET}")
    )
    return binned.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# --------------------------------------------------------------------------
@query(
    "unpivot_event_metrics",
    oracle="""
WITH a AS (
    SELECT event_type,
           CAST(count(*) AS DOUBLE) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
               AS total_value
    FROM events GROUP BY event_type
)
SELECT event_type, 'n_events' AS metric, n_events AS metric_value FROM a
UNION ALL
SELECT event_type, 'total_value' AS metric, total_value FROM a
""",
)
def unpivot_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (DuckDB UNPIVOT / Spark ``stack``) over the
    per-type event metrics."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        _dsum(F.col("value")).alias("total_value"),
    )
    return agg.select(
        "event_type",
        F.expr(
            "stack(2, 'n_events', n_events, 'total_value', total_value)"
            " AS (metric, metric_value)"
        ),
    )


# --------------------------------------------------------------------------
#: per-source sampling rates (permille) for the training mix
MIX_RATES = {"web": 600, "books": 900, "code": 800, "wiki": 1000, "news": 400}
MIX_DEFAULT = 500


@query(
    "corpus_mix_sample",
    oracle=f"""
WITH rated AS (
    SELECT doc_id, source,
           CASE source
               {' '.join(f"WHEN '{s}' THEN {r}" for s, r in sorted(MIX_RATES.items()))}
               ELSE {MIX_DEFAULT} END AS rate_permille,
           {md5_int60_sql("'mix-' || CAST(doc_id AS VARCHAR)")} % 1000 AS bucket
    FROM documents
)
SELECT source, rate_permille,
       count(*) AS n_docs,
       count(*) FILTER (WHERE bucket < rate_permille) AS n_kept
FROM rated
GROUP BY source, rate_permille
""",
)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted source mixing: each doc is kept iff its
    content-hash bucket falls under the source's permille rate — the
    reproducible mix-proportioning pass of a pretraining pipeline
    (stable under reruns and partitioning, like sample_hash_split).
    Map work + one small aggregation."""
    docs = _t(spark, sf_dir, "documents")
    rate = F.lit(MIX_DEFAULT)
    for s, r in sorted(MIX_RATES.items()):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    bucket = md5_int60(F.concat(F.lit("mix-"), F.col("doc_id").cast("string"))) % 1000
    rated = docs.select(
        "source", rate.alias("rate_permille"), bucket.alias("bucket")
    )
    return rated.groupBy("source", "rate_permille").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("bucket") < F.col("rate_permille"), 1)).alias("n_kept"),
    )


# --------------------------------------------------------------------------
@query(
    "asof_view_next_purchase",
    oracle="""
WITH p AS (
    SELECT user_id, ts AS p_ts, min(event_id) AS p_event_id
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
v AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
)
SELECT v.event_id, v.user_id, v.ts, p.p_event_id, p.p_ts,
       epoch_us(p.p_ts) - epoch_us(v.ts) AS lead_us
FROM v ASOF JOIN p ON v.user_id = p.user_id AND v.ts <= p.p_ts
""",
)
def asof_view_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (FORWARD) join: each view matched to the user's next
    purchase at-or-after it — time-to-conversion attribution, the
    other direction of DuckDB's ``ASOF JOIN`` (``l.ts <= r.ts``
    picks the smallest later right row).  Same union-sort shape as
    the backward op: one shuffle, per-key descending sort, no
    per-key pair explosion (operators/joins.py:asof_forward).
    Purchase ties per (user, ts) resolve to min event_id on both
    engines."""
    from duckdb_hdfs_spark.operators.joins import asof_forward

    ev = _t(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(F.min("event_id").alias("p_event_id"))
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    matched = asof_forward(
        views,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        payload=["p_event_id", "p_ts"],
    )
    return matched.select(
        "event_id",
        "user_id",
        "ts",
        "p_event_id",
        "p_ts",
        (F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("ts"))).alias(
            "lead_us"
        ),
    )


# --------------------------------------------------------------------------
@query(
    "orders_rfm_scores",
    oracle="""
WITH ref AS (SELECT max(o_orderdate) AS ref_day FROM orders),
agg AS (
    SELECT o_custkey,
           date_diff('day', max(o_orderdate), any_value(ref_day)) AS recency_days,
           count(*) AS frequency,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS monetary
    FROM orders, ref
    GROUP BY o_custkey
)
SELECT o_custkey, recency_days, frequency, monetary,
       ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_quartile,
       ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_quartile,
       ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_quartile
FROM agg
""",
)
def orders_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring: recency (days since last order, vs the
    corpus's latest order day), frequency, monetary (decimal-summed),
    and quartile ranks for each — the classic segmentation panel.

    Determinism: every quartile orders on (metric, o_custkey), so the
    assignment is total-order stable on both engines; the reference
    day is a broadcast 1-row aggregate in-plan.  Scale shape: the
    global ntile windows of earlier rounds (one task holding EVERY
    customer row — 10⁸-10⁹ at 100 TB) are replaced by the two-phase
    ranked formulation (operators.ranks.distributed_ntile): range
    buckets from broadcast approx-quantile bounds, per-BUCKET
    row_number, broadcast prefix offsets, then ntile row-allocation
    arithmetic — no stage sees more than ~1/32 of the customers.
    The per-customer aggregate is eagerly checkpointed once so the
    three metrics' bucket/count branches never re-scan orders."""
    from duckdb_hdfs_spark.operators.ranks import distributed_ntile

    o = _t(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("ref_day"))
    agg = (
        o.join(F.broadcast(ref))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("ref_day"), F.max("o_orderdate"))
            .cast("bigint")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("monetary"),
        )
        .localCheckpoint(eager=True)
    )
    scored = distributed_ntile(
        agg, [("recency_days", "asc"), ("o_custkey", "asc")], "r_quartile"
    )
    scored = distributed_ntile(
        scored, [("frequency", "desc"), ("o_custkey", "asc")], "f_quartile"
    )
    scored = distributed_ntile(
        scored, [("monetary", "desc"), ("o_custkey", "asc")], "m_quartile"
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_quartile",
        "f_quartile",
        "m_quartile",
    )


# --------------------------------------------------------------------------
@query(
    "orders_pareto_deciles",
    oracle="""
WITH spend AS (
    SELECT o_custkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                AS DECIMAL(38,2)) AS monetary
    FROM orders GROUP BY o_custkey
),
tiered AS (
    SELECT monetary,
           ntile(10) OVER (ORDER BY monetary DESC, o_custkey) AS spend_decile
    FROM spend
)
SELECT spend_decile, count(*) AS n_customers,
       CAST(sum(monetary) AS DOUBLE) AS decile_revenue,
       round(CAST(sum(monetary) AS DOUBLE)
             / (SELECT CAST(sum(monetary) AS DOUBLE) FROM spend), 6)
           AS revenue_share
FROM tiered GROUP BY spend_decile
""",
)
def orders_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) panel (round 5): customers
    ranked into spend deciles, each decile's revenue and share of the
    grand total — the 80/20 analysis behind sampling weights and
    account tiering.  Spend sums are DECIMAL end to end, so decile
    totals and the grand total are order-independent and exact.

    Scale shape: per-customer aggregate (one shuffle, checkpointed),
    two-phase distributed ntile for the decile (no global window),
    bounded 10-row rollup, and the grand total attached as a 1-row
    broadcast aggregate over the same checkpointed frame — orders is
    scanned ONCE."""
    from duckdb_hdfs_spark.operators.ranks import distributed_ntile

    o = _t(spark, sf_dir, "orders")
    spend = (
        o.groupBy("o_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("decimal(38,2)")
            .alias("monetary")
        )
        .localCheckpoint(eager=True)
    )
    tiered = distributed_ntile(
        spend, [("monetary", "desc"), ("o_custkey", "asc")], "spend_decile", 10
    )
    total = spend.agg(F.sum("monetary").cast("double").alias("grand"))
    return (
        tiered.groupBy("spend_decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").cast("double").alias("decile_revenue"),
        )
        .join(F.broadcast(total))
        .select(
            "spend_decile",
            "n_customers",
            "decile_revenue",
            F.round(F.col("decile_revenue") / F.col("grand"), 6).alias(
                "revenue_share"
            ),
        )
    )


# --------------------------------------------------------------------------
@query(
    "asof_left_view_purchase",
    oracle="""
WITH p AS (
    SELECT user_id, ts AS p_ts, min(event_id) AS p_event_id
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
v AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
)
SELECT v.event_id, v.user_id, v.ts, p.p_event_id, p.p_ts,
       p.p_event_id IS NOT NULL AS converted
FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts <= p.p_ts
""",
)
def asof_left_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of LEFT join (round 5): every view kept, matched to the
    user's next purchase where one exists, NULL payload otherwise —
    DuckDB's ``ASOF LEFT JOIN`` (the attribution table that also
    counts the non-converters; the inner variant
    asof_view_next_purchase drops them).  Exercises the operator's
    ``how='left'`` path, whose match detection rides the explicit
    lit(true) marker — a NULL payload field cannot masquerade as a
    missed match."""
    from duckdb_hdfs_spark.operators.joins import asof_forward

    ev = _t(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(F.min("event_id").alias("p_event_id"))
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    matched = asof_forward(
        views,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        payload=["p_event_id", "p_ts"],
        how="left",
    )
    return matched.select(
        "event_id",
        "user_id",
        "ts",
        "p_event_id",
        "p_ts",
        F.col("p_event_id").isNotNull().alias("converted"),
    )


# --------------------------------------------------------------------------
@query(
    "stats_welch_ttest",
    oracle="""
WITH q AS (
    SELECT source,
           CAST(round(l_quantity, 0) AS DOUBLE) AS x
    FROM (SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS source,
                 l_quantity
          FROM lineitem)
),
s AS (
    SELECT source, count(*) AS n,
           CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS s1,
           CAST(sum(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6)))
                AS DOUBLE) AS s2
    FROM q GROUP BY source
),
m AS (
    SELECT source, n, s1 / n AS mean,
           (s2 - s1 * s1 / n) / (n - 1) AS var
    FROM s
)
SELECT a.n AS n_a, b.n AS n_b,
       round(a.mean - b.mean, 6) AS mean_diff,
       round((a.mean - b.mean)
             / sqrt(a.var / a.n + b.var / b.n), 6) AS t_stat,
       abs((a.mean - b.mean) / sqrt(a.var / a.n + b.var / b.n)) > 1.96
           AS significant_5pct
FROM m a JOIN m b ON a.source = 'A' AND b.source = 'B'
""",
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-statistic (round 5): does cohort A's mean
    differ from cohort B's — THE experiment-analysis primitive
    (here: even- vs odd-keyed orders' quantities, a null split that
    should hover near t=0).  Means and variances derive from DECIMAL
    power sums (exact, order-independent: Σx and Σx² in decimal,
    moments assembled in double with a fixed operation order), so the
    t-statistic is bit-identical cross-engine — sqrt is IEEE-exact,
    no other transcendental appears.

    Scale shape: one partial-aggregated pass builds both cohorts'
    power sums (the moment-sketch property: mergeable, constant
    state); the t assembly is a 2-row join."""
    li = _t(spark, sf_dir, "lineitem")
    q = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, "A").otherwise("B").alias("source"),
        F.round("l_quantity", 0).cast("double").alias("x"),
    )
    xd = F.col("x").cast("decimal(18,6)")
    s = q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("s1"),
        F.sum(xd * xd).cast("double").alias("s2"),
    )
    # nullif guards (round-7 review): n=1 makes the variance divisor
    # zero, and two zero-variance cohorts zero the sqrt divisor — ANSI
    # Spark THROWS on both where the DuckDB oracle yields NULL
    m = s.select(
        "source",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / F.nullif((F.col("n") - 1).cast("double"), F.lit(0.0))
        ).alias("var"),
    ).localCheckpoint(eager=True)
    a = m.filter(F.col("source") == "A").select(
        F.col("n").alias("n_a"), F.col("mean").alias("mean_a"), F.col("var").alias("var_a")
    )
    b = m.filter(F.col("source") == "B").select(
        F.col("n").alias("n_b"), F.col("mean").alias("mean_b"), F.col("var").alias("var_b")
    )
    t = (F.col("mean_a") - F.col("mean_b")) / F.nullif(
        F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")),
        F.lit(0.0),
    )
    return a.join(F.broadcast(b)).select(
        "n_a",
        "n_b",
        F.round(F.col("mean_a") - F.col("mean_b"), 6).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        (F.abs(t) > 1.96).alias("significant_5pct"),
    )


# --------------------------------------------------------------------------
@query(
    "orders_cohort_revenue",
    oracle="""
WITH first_year AS (
    SELECT o_custkey,
           CAST(extract(year FROM min(o_orderdate)) AS BIGINT) AS cohort_year
    FROM orders GROUP BY o_custkey
)
SELECT f.cohort_year,
       CAST(extract(year FROM o.o_orderdate) AS BIGINT) - f.cohort_year
           AS years_since_first,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS revenue
FROM orders o JOIN first_year f ON o.o_custkey = f.o_custkey
GROUP BY cohort_year, years_since_first
""",
)
def orders_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-cohort revenue matrix (round 5): acquisition year ×
    years-since-first-order, with order counts and decimal-exact
    revenue — the LTV decay panel (ev_cohort_retention's revenue
    sibling on the sales schema).

    Scale shape: the per-customer first-order aggregate is one
    partial-aggregated shuffle; it joins back keyed on custkey (hash
    join co-partitioned with the cohort rollup's eventual key), and
    the output is bounded by years² cells."""
    o = _t(spark, sf_dir, "orders")
    first_year = o.groupBy("o_custkey").agg(
        F.year(F.min("o_orderdate")).cast("bigint").alias("cohort_year")
    )
    return (
        o.join(first_year, "o_custkey")
        .groupBy(
            "cohort_year",
            (F.year("o_orderdate").cast("bigint") - F.col("cohort_year")).alias(
                "years_since_first"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "ev_first_touch_attribution",
    oracle="""
WITH p AS (
    SELECT event_id, user_id, ts, value FROM events
    WHERE event_type = 'purchase'
),
v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id, p.ts,
       round(p.value, 4) AS purchase_value,
       min(v.ts) AS first_view_ts,
       CAST(min(v.event_id) FILTER (
           WHERE v.ts = (SELECT min(v2.ts) FROM v v2
                         WHERE v2.user_id = p.user_id
                           AND v2.ts <= p.ts
                           AND v2.ts > p.ts - INTERVAL 7 DAY)
       ) AS BIGINT) AS first_view_event_id
FROM p JOIN v ON v.user_id = p.user_id
              AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 7 DAY
GROUP BY p.event_id, p.user_id, p.ts, p.value
""",
)
def ev_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-touch attribution (round 5): each purchase credited to
    the EARLIEST view in the preceding 7 days — the complement of
    asof_purchase_last_view's last-touch model (marketing teams run
    both and argue).  Ties on the first-view timestamp resolve to
    min event_id on both engines.

    Scale shape: equi-join on user with the time range as residual
    (per-key bounded, the range_join_view_purchases shape), then a
    min_by aggregate per purchase — one shuffle each."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_event_id"),
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("ts"))
        & (F.col("v_ts") > F.col("ts") - F.expr("INTERVAL 7 DAY")),
    )
    return joined.groupBy("event_id", "user_id", "ts", "value").agg(
        F.min("v_ts").alias("first_view_ts"),
        F.min_by(
            "v_event_id", F.struct(F.col("v_ts"), F.col("v_event_id"))
        )
        .cast("bigint")
        .alias("first_view_event_id"),
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 4).alias("purchase_value"),
        "first_view_ts",
        "first_view_event_id",
    )


# --------------------------------------------------------------------------
@query(
    "orders_repeat_intervals",
    oracle="""
WITH g AS (
    SELECT o_custkey,
           datediff('day',
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS gap_days
    FROM orders
)
SELECT o_custkey AS custkey,
       count(*) AS n_orders,
       count(gap_days) AS n_repeat,
       CAST(min(gap_days) AS BIGINT) AS min_gap_days,
       CAST(max(gap_days) AS BIGINT) AS max_gap_days,
       round(CAST(sum(gap_days) AS DOUBLE) / count(gap_days), 4)
           AS mean_gap_days
FROM g
GROUP BY o_custkey
HAVING count(gap_days) >= 1
""",
)
def orders_repeat_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence per customer: day gaps between
    consecutive orders (lag over the per-customer order stream), then
    count/min/max/mean of the gaps — the survival-analysis input for
    churn models, and the batch twin of ev_inter_event_times on the
    transactional table.

    Scale shape: ONE shuffle on o_custkey feeding a partitioned
    window (per-customer order counts are bounded — TPC-H ~10), then
    the aggregate reuses the same partitioning.  Integer day gaps sum
    exactly; the mean is a single integer/integer IEEE division
    rounded identically on both engines.  Ties on order date resolve
    by o_orderkey in the lag ordering on both sides."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = orders.select(
        "o_custkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("gap_days"),
    )
    return (
        g.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("gap_days").alias("n_repeat"),
            F.min("gap_days").alias("min_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
            F.round(
                F.sum("gap_days").cast("double") / F.count("gap_days"), 4
            ).alias("mean_gap_days"),
        )
        .filter(F.col("n_repeat") >= 1)
        .withColumnRenamed("o_custkey", "custkey")
    )


# --------------------------------------------------------------------------
@query(
    "orders_market_basket",
    oracle="""
WITH basket AS (
    SELECT DISTINCT l_orderkey, p_brand AS brand
    FROM lineitem JOIN part ON l_partkey = p_partkey
),
tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM basket),
bc AS (SELECT brand, count(*) AS c FROM basket GROUP BY brand),
pairs AS (
    SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS pair_n
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
    GROUP BY 1, 2
)
SELECT brand_a, brand_b, pair_n, ca.c AS c_a, cb.c AS c_b,
       round(CAST(pair_n AS DOUBLE) / n_orders, 6) AS support,
       round(CAST(pair_n AS DOUBLE) / ca.c, 6) AS confidence,
       round(CAST(pair_n AS DOUBLE) * n_orders / (ca.c * cb.c), 6) AS lift
FROM pairs
JOIN bc ca ON pairs.brand_a = ca.brand
JOIN bc cb ON pairs.brand_b = cb.brand
CROSS JOIN tot
WHERE pair_n >= 2
""",
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules at brand granularity:
    support / confidence / lift for every brand pair co-occurring in
    ≥2 orders — the classic co-purchase affinity panel (Agrawal-style
    frequent itemsets, restricted to 2-itemsets which cover the bulk
    of production recommender rules).

    Scale shape: the basket (order, brand) set derives from ONE
    lineitem scan (broadcast part dim for the brand lookup) and is
    localCheckpoint-ed so the three consumers — pair self-join, brand
    marginals, order total — reuse the materialized copy instead of
    re-scanning the fact table.  The pair join is keyed on
    l_orderkey: per-order distinct brands are bounded by lines per
    order (≤7 in TPC-H), so candidate pairs stay LINEAR in orders —
    never a brand-keyed quadratic.  Marginals and the 1-row total
    attach as broadcast joins; every ratio is an integer/integer IEEE
    division rounded identically on both engines."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    basket = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    tot = basket.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    bc = basket.groupBy("brand").agg(F.count(F.lit(1)).alias("c"))
    a = basket.select(F.col("l_orderkey"), F.col("brand").alias("brand_a"))
    b = basket.select(
        F.col("l_orderkey").alias("bk"), F.col("brand").alias("brand_b")
    )
    pairs = (
        a.join(b, (F.col("l_orderkey") == F.col("bk"))
               & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= 2)
    )
    ca = bc.select(F.col("brand").alias("brand_a"), F.col("c").alias("c_a"))
    cb = bc.select(F.col("brand").alias("brand_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .join(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "pair_n",
            "c_a",
            "c_b",
            F.round(F.col("pair_n").cast("double") / F.col("n_orders"), 6)
            .alias("support"),
            F.round(F.col("pair_n").cast("double") / F.col("c_a"), 6)
            .alias("confidence"),
            F.round(
                F.col("pair_n").cast("double")
                * F.col("n_orders")
                / (F.col("c_a") * F.col("c_b")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "orders_priority_drift",
    oracle="""
WITH panel AS (
    SELECT date_trunc('month', o_orderdate) AS month,
           o_orderpriority AS prio, count(*) AS n
    FROM orders GROUP BY 1, 2
),
m AS (SELECT month, sum(n) AS m_tot FROM panel GROUP BY month),
g AS (SELECT prio, sum(n) AS gn FROM panel GROUP BY prio),
t AS (SELECT sum(n) AS tot FROM panel),
d AS (
    SELECT panel.month, m.m_tot, panel.prio,
           round(abs(CAST(panel.n AS DOUBLE) / m.m_tot
                     - CAST(g.gn AS DOUBLE) / t.tot), 6) AS delta
    FROM panel JOIN m USING (month) JOIN g USING (prio) CROSS JOIN t
),
agg AS (
    SELECT month, CAST(m_tot AS BIGINT) AS n_orders,
           CAST(sum(CAST(delta AS DECIMAL(18,6))) AS DOUBLE)
               AS l1_distance,
           max(delta) AS max_abs_delta
    FROM d GROUP BY month, m_tot
),
top AS (
    SELECT month, prio AS top_priority FROM (
        SELECT month, prio,
               row_number() OVER (PARTITION BY month
                                  ORDER BY delta DESC, prio DESC) AS rk
        FROM d) t WHERE rk = 1
)
SELECT agg.month, n_orders, l1_distance, max_abs_delta, top_priority
FROM agg JOIN top USING (month)
""",
)
def orders_priority_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order-priority mix-shift monitor: per month, the L1
    distance (= 2x total variation) between that month's priority
    distribution and the all-time mix, plus the most-drifted priority —
    the input-drift alarm every production pipeline wants BEFORE a
    model retrains on a skewed month.

    Determinism: each |share_month − share_global| is an
    integer/integer IEEE division pair rounded to 6 decimals BEFORE
    the L1 sum, which runs in DECIMAL and converts to double exactly
    (halving to TV would force a second double-round, which differs
    across engines at .5 boundaries — report L1, halve downstream);
    the arg-max
    priority ties break to the lexicographically larger priority on
    both engines (max_by struct ↔ row_number DESC, DESC).

    Scale shape: ONE orders scan collapses to the (month × priority)
    panel (partial-aggregated, cardinality = months × 5), which is
    localCheckpoint-ed; month totals, global mix, and the grand total
    all derive from the panel and re-attach as broadcast joins —
    nothing after the first shuffle is data-sized."""
    orders = _t(spark, sf_dir, "orders")
    panel = (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    m = panel.groupBy("month").agg(F.sum("n").alias("m_tot"))
    g = panel.groupBy("prio").agg(F.sum("n").alias("gn"))
    t = panel.agg(F.sum("n").alias("tot"))
    d = (
        panel.join(m, "month")
        .join(F.broadcast(g), "prio")
        .join(F.broadcast(t))
        .withColumn(
            "delta",
            F.round(
                F.abs(
                    F.col("n").cast("double") / F.col("m_tot")
                    - F.col("gn").cast("double") / F.col("tot")
                ),
                6,
            ),
        )
    )
    return (
        d.groupBy("month", "m_tot")
        .agg(
            F.sum(F.col("delta").cast("decimal(18,6)"))
            .cast("double")
            .alias("l1_distance"),
            F.max("delta").alias("max_abs_delta"),
            F.max_by(
                "prio", F.struct(F.col("delta"), F.col("prio"))
            ).alias("top_priority"),
        )
        .select(
            "month",
            F.col("m_tot").alias("n_orders"),
            "l1_distance",
            "max_abs_delta",
            "top_priority",
        )
    )


# --------------------------------------------------------------------------
@query(
    "orders_abc_class",
    oracle="""
WITH spend AS (
    SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,6))) AS sp
    FROM orders GROUP BY o_custkey
),
cum AS (
    SELECT o_custkey, sp,
           sum(sp) OVER (ORDER BY sp DESC, o_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
    FROM spend
),
t AS (SELECT sum(sp) AS tot FROM spend),
classed AS (
    SELECT o_custkey, sp,
           CASE WHEN c * 100 <= tot * 80 THEN 'A'
                WHEN c * 100 <= tot * 95 THEN 'B'
                ELSE 'C' END AS abc
    FROM cum CROSS JOIN t
)
SELECT abc, count(*) AS n_customers,
       CAST(round(sum(sp), 2) AS DOUBLE) AS class_revenue,
       round(CAST(sum(sp) AS DOUBLE) / (SELECT CAST(tot AS DOUBLE) FROM t), 6)
           AS revenue_share
FROM classed GROUP BY abc
""",
)
def orders_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC revenue classification: customers ranked by lifetime spend,
    class A = the head covering 80% of cumulative revenue, B = next
    15%, C = the tail — inventory/CRM's standard concentration cut
    (orders_pareto_deciles buckets by COUNT; ABC cuts by cumulative
    SHARE, which is what account teams actually staff against).

    Determinism: spend, the running total, and the grand total are
    all exact DECIMAL sums; class boundaries compare c·100 ≤ tot·80
    IN DECIMAL — no float ever touches the classification.

    Scale shape: the global spend-ordered running total uses
    operators/ranks.grouped_cumsum under a constant group (range
    buckets on broadcast quantile bounds — no partition-less window);
    the grand total broadcasts; the class rollup partial-aggregates."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    orders = _t(spark, sf_dir, "orders")
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("sp"))
        .withColumn("spd", F.col("sp").cast("double"))
        .withColumn("__g", F.lit(1))
    )
    cum = grouped_cumsum(
        spend, ["__g"], [("spd", "desc"), ("o_custkey", "asc")],
        val="sp", out="c",
    )
    t = cum.agg(F.sum("sp").alias("tot"))
    classed = cum.join(F.broadcast(t)).withColumn(
        "abc",
        F.when(F.col("c") * 100 <= F.col("tot") * 80, "A")
        .when(F.col("c") * 100 <= F.col("tot") * 95, "B")
        .otherwise("C"),
    )
    tot_d = classed.select(F.col("tot").cast("double").alias("totd")).limit(1)
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("sp"), 2).cast("double").alias("class_revenue"),
            F.sum("sp").alias("__sp_sum"),
        )
        .join(F.broadcast(tot_d))
        .select(
            "abc",
            "n_customers",
            "class_revenue",
            F.round(
                F.col("__sp_sum").cast("double") / F.col("totd"), 6
            ).alias("revenue_share"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "orders_monthly_growth",
    oracle="""
WITH m AS (
    SELECT date_trunc('month', o_orderdate) AS month,
           count(*) AS n_orders,
           sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
    FROM orders GROUP BY 1
)
SELECT a.month,
       a.n_orders,
       CAST(round(a.rev, 2) AS DOUBLE) AS revenue,
       CAST(round(b.rev, 2) AS DOUBLE) AS prev_revenue,
       round((CAST(a.rev AS DOUBLE) - CAST(b.rev AS DOUBLE))
             / CAST(b.rev AS DOUBLE) * 100, 4) AS growth_pct
FROM m a LEFT JOIN m b ON b.month = a.month - INTERVAL 1 MONTH
""",
)
def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the top line of every
    business review.  The previous month attaches by a JOIN on
    month−1 (not a partition-less lag window over the global month
    ordering, which would be a single-task funnel and is banned
    repo-wide); first month reports NULL growth honestly.

    Determinism: monthly revenue is an exact DECIMAL sum; the growth
    ratio divides the exact-decimal-derived doubles in the same
    association order on both engines and rounds once.

    Scale shape: one partial-aggregated scan to the month panel, then
    a panel self-join at month grain (calendar-sized)."""
    orders = _t(spark, sf_dir, "orders")
    m = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev"),
        )
        .localCheckpoint(eager=True)
    )
    b = m.select(
        (F.col("month") + F.expr("INTERVAL 1 MONTH")).alias("nm"),
        F.col("rev").alias("prev_rev"),
    )
    return (
        m.join(F.broadcast(b), m.month == b.nm, "left")
        .select(
            "month",
            "n_orders",
            F.round("rev", 2).cast("double").alias("revenue"),
            F.round("prev_rev", 2).cast("double").alias("prev_revenue"),
            F.round(
                (F.col("rev").cast("double") - F.col("prev_rev").cast("double"))
                / F.col("prev_rev").cast("double")
                * 100,
                4,
            ).alias("growth_pct"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "orders_segment_migration",
    oracle="""
WITH p1 AS (
    SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,6))) AS sp
    FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY o_custkey
),
p2 AS (
    SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,6))) AS sp
    FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_custkey
),
t1 AS (
    SELECT o_custkey,
           ntile(4) OVER (ORDER BY sp DESC, o_custkey) AS tile
    FROM p1
),
t2 AS (
    SELECT o_custkey,
           ntile(4) OVER (ORDER BY sp DESC, o_custkey) AS tile
    FROM p2
)
SELECT coalesce(t1.tile, 0) AS tile_before,
       coalesce(t2.tile, 0) AS tile_after,
       count(*) AS n_customers
FROM t1 FULL OUTER JOIN t2 USING (o_custkey)
GROUP BY 1, 2
""",
)
def orders_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment-MIGRATION matrix: spend quartile before vs
    after the 1996 split (tile 0 = absent from that period) — the
    lifecycle panel behind churn/win-back programs (a heavy
    1→absent flow is churn of the best customers; 4→1 is successful
    activation).  Both period quartiles use the two-phase distributed
    ntile, then a full outer join on customer aligns the eras.

    Scale shape: two filtered partial-aggregated scans to per-period
    spend, distributed ntile per period (no global window), one
    customer-keyed full outer join, calendar-free 5×5 output."""
    from duckdb_hdfs_spark.operators.ranks import distributed_ntile

    orders = _t(spark, sf_dir, "orders")
    split = F.lit("1996-01-01").cast("timestamp")

    def tiles(df, name):
        spend = (
            df.groupBy("o_custkey")
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("sp")
            )
            .withColumn("spd", F.col("sp").cast("double"))
        )
        t = distributed_ntile(
            spend, [("spd", "desc"), ("o_custkey", "asc")],
            out="tile", n_buckets=4,
        )
        return t.select("o_custkey", F.col("tile").alias(name))

    t1 = tiles(orders.filter(F.col("o_orderdate") < split), "tile_before")
    t2 = tiles(orders.filter(F.col("o_orderdate") >= split), "tile_after")
    return (
        t1.join(t2, "o_custkey", "full_outer")
        .select(
            F.coalesce("tile_before", F.lit(0)).cast("long").alias(
                "tile_before"
            ),
            F.coalesce("tile_after", F.lit(0)).cast("long").alias(
                "tile_after"
            ),
        )
        .groupBy("tile_before", "tile_after")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
@query(
    "supplier_concentration_hhi",
    oracle="""
WITH rev AS (
    SELECT s_nationkey, l_suppkey,
           sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS r
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey, l_suppkey
),
tot AS (SELECT s_nationkey, sum(r) AS t FROM rev GROUP BY s_nationkey)
SELECT rev.s_nationkey AS nationkey,
       count(*) AS n_suppliers,
       round(CAST(sum(CAST(
           round(round(CAST(rev.r AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
                 * round(CAST(rev.r AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
                 * 10000, 8) AS DECIMAL(18,8))) AS DOUBLE), 4) AS hhi
FROM rev JOIN tot USING (s_nationkey)
GROUP BY rev.s_nationkey
""",
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-revenue concentration per nation — the
    Herfindahl-Hirschman index (Σ shareᵢ², ×10,000 on the antitrust
    scale): >2,500 = the nation's supply rides on few suppliers, the
    procurement-risk number sourcing teams track.

    Determinism: each share is an exact-decimal-derived double
    division rounded to 6 BEFORE squaring; the squared terms round to
    8 and sum in DECIMAL — reducer order cannot move the index.

    Scale shape: one lineitem scan with the supplier dim broadcast,
    two chained partial-aggregated group-bys (supplier grain →
    nation grain), nation totals re-attached by a 25-row join."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("r")
        )
    )
    tot = rev.groupBy("s_nationkey").agg(F.sum("r").alias("t"))
    share = F.round(
        F.col("r").cast("double") / F.col("t").cast("double"), 6
    )
    term = F.round(share * share * 10000, 8).cast("decimal(18,8)")
    return (
        rev.join(F.broadcast(tot), "s_nationkey")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(term).cast("double"), 4).alias("hhi"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "orders_seasonality_index",
    oracle="""
WITH m AS (
    SELECT CAST(extract(month FROM o_orderdate) AS INT) AS moy,
           date_trunc('month', o_orderdate) AS month,
           sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
    FROM orders GROUP BY 1, 2
),
per_moy AS (
    SELECT moy, count(*) AS n_months,
           sum(rev) AS moy_rev
    FROM m GROUP BY moy
),
base AS (
    SELECT sum(moy_rev) AS tot, sum(n_months) AS n_tot FROM per_moy
)
SELECT moy, n_months,
       CAST(round(moy_rev, 2) AS DOUBLE) AS moy_revenue,
       round((CAST(moy_rev AS DOUBLE) / n_months)
             / (CAST(tot AS DOUBLE) / n_tot), 6) AS seasonal_index
FROM per_moy CROSS JOIN base
""",
)
def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year SEASONALITY index: each calendar month's average
    revenue relative to the all-months average (1.0 = neutral,
    1.3 = a 30%-hot month) — the classical multiplicative
    decomposition's seasonal factor, and the deseasonalization input
    for any forecast or anomaly baseline on the revenue series
    (ev_anomaly_ewma et al. track level; this isolates the calendar
    shape).

    Determinism: revenue is exact DECIMAL; the index is a ratio of
    two exact-derived averages in identical association order,
    rounded once.

    Scale shape: one partial-aggregated scan to (month-of-year ×
    month) grain, a 12-row rollup, and a broadcast 1-row base."""
    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.month("o_orderdate").alias("moy"),
        F.date_trunc("month", "o_orderdate").alias("month"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev"))
    per_moy = m.groupBy("moy").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("rev").alias("moy_rev"),
    )
    base = per_moy.agg(
        F.sum("moy_rev").alias("tot"), F.sum("n_months").alias("n_tot")
    )
    return (
        per_moy.join(F.broadcast(base))
        .select(
            "moy",
            "n_months",
            F.round("moy_rev", 2).cast("double").alias("moy_revenue"),
            F.round(
                (F.col("moy_rev").cast("double") / F.col("n_months"))
                / (F.col("tot").cast("double") / F.col("n_tot")),
                6,
            ).alias("seasonal_index"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "stats_linear_regression",
    oracle="""
WITH pts AS (
    SELECT event_type,
           CAST(extract(hour FROM ts) AS BIGINT) AS x,
           CAST(round(value, 4) AS DECIMAL(18,6)) AS y
    FROM events
),
mo AS (
    SELECT event_type,
           count(*) AS n,
           sum(x) AS sx,
           sum(x * x) AS sxx,
           sum(y) AS sy,
           sum(CAST(x AS DECIMAL(18,6)) * y) AS sxy
    FROM pts GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             6) AS slope,
       round((CAST(sy AS DOUBLE)
              - ((n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE)) / n, 6) AS intercept
FROM mo
""",
)
def stats_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares regression per event type — value vs
    hour-of-day slope and intercept, the trend-line primitive
    (completes the statistics family: stats_moments = dispersion,
    stats_welch_ttest = comparison, stats_quantiles = distribution,
    this = trend).  Built from EXACT moment sums, not the engines'
    ``regr_*`` aggregates, whose internal float accumulation is
    reducer-order-dependent and can never hash-match: x is integer,
    y rounds to DECIMAL, so n, Σx, Σx², Σy, Σxy are all exact and
    order-independent; slope/intercept assemble in double with
    identical association order and round once.

    Scale shape: one partial-aggregated shuffle at type grain —
    the same single-pass shape the Welch t-test uses."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        F.round("value", 4).cast("decimal(18,6)").alias("y"),
    )
    mo = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,6)") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    # nullif guard: a type whose x has zero variance (all events in
    # one hour) zeroes the denominator — under Spark 4's ANSI default
    # that THROWS, while the DuckDB oracle returns NULL; nullif makes
    # both sides NULL (round-7 review finding)
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return mo.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


# --------------------------------------------------------------------------
def _seg_priority_cells(spark: SparkSession, sf_dir: str):
    """Shared segment × priority contingency machinery for
    stats_chi2_independence and stats_cramers_v (one place for the
    full-marginal-grid recipe — a zero-observation cell still
    contributes E to χ²).  Returns ``(cells, rt, ct, tot)``: the
    full r×c grid with observed counts and row/col/grand marginals
    attached (row_n, col_n, n), plus the three marginal frames.
    The fact group-by is checkpointed once; everything downstream is
    panel-sized broadcast joins."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    obs0 = (
        orders.join(
            cust.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("segment"),
            ),
            "o_custkey",
        )
        .groupBy("segment", F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("observed"))
        # 25-row panel feeds four aggregate branches: materialize once
        # (DataFrame reuse is plan reuse — each branch would re-run
        # the fact join otherwise)
        .localCheckpoint(eager=True)
    )
    rt = obs0.groupBy("segment").agg(F.sum("observed").alias("row_n"))
    ct = obs0.groupBy("priority").agg(F.sum("observed").alias("col_n"))
    tot = obs0.agg(F.sum("observed").alias("n"))
    # full marginal grid (tiny broadcast cross): an unobserved
    # (segment, priority) combination still contributes E to chi2 —
    # cells from observed combos alone would silently understate it
    cells = (
        rt.select("segment")
        .crossJoin(F.broadcast(ct.select("priority")))
        .join(F.broadcast(obs0), ["segment", "priority"], "left")
        .select(
            "segment",
            "priority",
            F.coalesce(F.col("observed"), F.lit(0)).alias("observed"),
        )
        .join(F.broadcast(rt), "segment")
        .join(F.broadcast(ct), "priority")
        .join(F.broadcast(tot))
    )
    return cells, rt, ct, tot


def _cell_expected():
    """Expected-under-independence count for a marginal-grid cell."""
    return (
        F.col("row_n").cast("double")
        * F.col("col_n").cast("double")
        / F.col("n").cast("double")
    )


@query(
    "stats_chi2_independence",
    oracle="""
WITH obs0 AS (
    SELECT c_mktsegment AS segment, o_orderpriority AS priority,
           count(*) AS observed
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
),
rt AS (SELECT segment, sum(observed) AS row_n FROM obs0 GROUP BY segment),
ct AS (SELECT priority, sum(observed) AS col_n FROM obs0 GROUP BY priority),
tot AS (SELECT sum(observed) AS n FROM obs0),
-- full marginal grid: a (segment, priority) combination with ZERO
-- observations still contributes E to the statistic (textbook chi2);
-- building cells from observed combos alone would silently drop it
obs AS (
    SELECT rt.segment, ct.priority, coalesce(o.observed, 0) AS observed
    FROM rt CROSS JOIN ct
    LEFT JOIN obs0 o ON o.segment = rt.segment AND o.priority = ct.priority
),
cell AS (
    SELECT segment, priority, observed,
           CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE)
               AS e
    FROM obs JOIN rt USING (segment) JOIN ct USING (priority) CROSS JOIN tot
),
panel AS (
    SELECT segment, priority, CAST(observed AS BIGINT) AS observed,
           round(e, 6) AS expected,
           round((observed - e) * (observed - e) / e, 6) AS contrib
    FROM cell
),
total AS (
    SELECT CAST(sum(CAST(contrib AS DECIMAL(24,6))) AS DOUBLE) AS chi2,
           (count(DISTINCT segment) - 1) * (count(DISTINCT priority) - 1)
               AS dof
    FROM panel
)
SELECT segment, priority, observed, expected, contrib,
       round(chi2, 6) AS chi2_total, CAST(dof AS BIGINT) AS dof
FROM panel CROSS JOIN total
""",
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns (customer market segment x order priority) — the
    categorical-association primitive beside the numeric comparison
    (stats_welch_ttest) and trend (stats_linear_regression) tests:
    per-cell observed vs expected-under-independence counts, each
    cell's (O-E)^2/E contribution, and the table-level statistic with
    its degrees of freedom (here 4x4=16; chi2 beyond ~26.3 rejects at
    5%).  The per-cell panel is the diagnostic half: the largest
    contributions point at WHICH segment/priority pairing drives any
    dependence.

    Determinism: E assembles in double with a fixed operation order
    from exact integer marginals; contributions round to 6 decimals
    then sum in DECIMAL (order-independent), so the statistic is
    engine-identical — no transcendental appears (the p-value needs
    the incomplete gamma; the fixed-dof critical-value comparison is
    the portable form).

    Scale shape: ONE fact-scan group-by to segment x priority grain
    (25 cells; partial-aggregated shuffle on the customer join key
    before it — AQE broadcasts the customer side while it fits),
    then every marginal (5-row row/col totals, 1-row grand total,
    1-row chi2) derives from the 25-row cell panel — broadcast
    joins only, no second fact scan."""
    cells, rt, ct, tot = _seg_priority_cells(spark, sf_dir)
    e = _cell_expected()
    panel = (
        cells.select(
            "segment",
            "priority",
            F.col("observed").cast("bigint").alias("observed"),
            F.round(e, 6).alias("expected"),
            F.round(
                (F.col("observed") - e) * (F.col("observed") - e) / e, 6
            ).alias("contrib"),
        )
        .localCheckpoint(eager=True)
    )
    total = panel.agg(
        F.sum(F.col("contrib").cast("decimal(24,6)"))
        .cast("double")
        .alias("chi2"),
        (
            (F.count_distinct(F.col("segment")) - 1)
            * (F.count_distinct(F.col("priority")) - 1)
        ).alias("dof"),
    )
    return panel.join(F.broadcast(total)).select(
        "segment",
        "priority",
        "observed",
        "expected",
        "contrib",
        F.round(F.col("chi2"), 6).alias("chi2_total"),
        F.col("dof").cast("bigint").alias("dof"),
    )


# --------------------------------------------------------------------------
@query(
    "stats_mann_whitney",
    oracle="""
WITH q AS (
    SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS src,
           CAST(l_quantity AS DOUBLE) AS x
    FROM lineitem WHERE l_quantity IS NOT NULL
),
pv AS (
    SELECT x, sum(CASE WHEN src = 'A' THEN 1 ELSE 0 END) AS c_a,
           count(*) AS c
    FROM q GROUP BY x
),
cum AS (
    SELECT x, c_a, c, sum(c) OVER (ORDER BY x) AS cumc FROM pv
),
s AS (
    SELECT CAST(sum(CAST(c_a AS DECIMAL(38,0))
                    * CAST(2 * cumc - c + 1 AS DECIMAL(38,0)))
                AS DOUBLE) AS r2_a,
           CAST(sum(c_a) AS DOUBLE) AS n_a,
           CAST(sum(c - c_a) AS DOUBLE) AS n_b,
           CAST(sum(CAST(c AS DECIMAL(38,0)) * c * c - c) AS DOUBLE)
               AS tie3
    FROM cum
),
u AS (
    SELECT n_a, n_b, (r2_a - n_a * (n_a + 1)) / 2 AS u_a,
           n_a * n_b - (r2_a - n_a * (n_a + 1)) / 2 AS u_b, tie3,
           n_a + n_b AS n
    FROM s
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(u_a, 1) AS u_a, round(u_b, 1) AS u_b,
       -- nullif mirrors the Spark side's zero-variance guard: a
       -- degenerate single-value panel (tie3 == n^3 - n) yields NULL
       -- on BOTH engines instead of NULL-vs-inf divergence
       round((u_a - n_a * n_b / 2)
             / nullif(sqrt(n_a * n_b / 12
                           * ((n + 1) - tie3 / nullif(n * (n - 1), 0))), 0), 6)
           AS z_stat,
       abs((u_a - n_a * n_b / 2)
           / nullif(sqrt(n_a * n_b / 12
                         * ((n + 1) - tie3 / nullif(n * (n - 1), 0))), 0)) > 1.96
           AS significant_5pct
FROM u
""",
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) two-sample test with the
    tie-corrected normal approximation — the NONPARAMETRIC companion
    to stats_welch_ttest (same even/odd null split of lineitem
    quantities): rank-based, so heavy-tailed or ordinal metrics that
    break the t-test's moment assumptions still test cleanly.  The
    integer quantity domain (1..50) is maximally tied, exercising the
    average-rank and tie-variance machinery for real.

    Determinism: ranks never materialize per row — the value-grain
    panel carries (value, cohort counts, cumulative count), and the
    DOUBLED average rank 2*cum - c + 1 is an exact INTEGER, so the
    rank-sum accumulates in DECIMAL(38,0) with zero float error in
    any reducer order; U, the tie term sum(c^3 - c), and the z
    assembly then run in double with one fixed association order and
    a single IEEE sqrt — bit-identical cross-engine (the Welch
    recipe).

    Scale shape: one partial-aggregated shuffle to VALUE grain (the
    panel is bounded by the value domain, 50 rows here — never the
    row count for discrete metrics), then the global cumulative count
    runs through operators/ranks.grouped_cumsum under a constant
    group (range-bucketed two-phase cumsum — no partition-less
    window even for continuous domains), and the test statistic is a
    1-row fold of the panel."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    li = _t(spark, sf_dir, "lineitem")
    # NULL values excluded symmetrically (NULL-injection audit r9):
    # rank machinery must never see NULL x
    q = li.filter(F.col("l_quantity").isNotNull()).select(
        F.when(F.col("l_orderkey") % 2 == 0, "A").otherwise("B").alias("src"),
        F.col("l_quantity").cast("double").alias("x"),
    )
    pv = (
        q.groupBy("x")
        .agg(
            F.sum(F.when(F.col("src") == "A", 1).otherwise(0)).alias("c_a"),
            F.count(F.lit(1)).alias("c"),
        )
        .withColumn("__g", F.lit(1))
    )
    cum = grouped_cumsum(pv, ["__g"], [("x", "asc")], val="c", out="cumc")
    s = cum.agg(
        F.sum(
            F.col("c_a").cast("decimal(38,0)")
            * (2 * F.col("cumc") - F.col("c") + 1).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("r2_a"),
        F.sum("c_a").cast("double").alias("n_a"),
        F.sum(F.col("c") - F.col("c_a")).cast("double").alias("n_b"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
            - F.col("c")
        )
        .cast("double")
        .alias("tie3"),
    )
    n_a, n_b, tie3 = F.col("n_a"), F.col("n_b"), F.col("tie3")
    u_a = (F.col("r2_a") - n_a * (n_a + 1)) / 2
    n = n_a + n_b
    # nullif guards: a single-value panel (tie3 == n^3 - n) zeroes the
    # variance and ANSI Spark would throw where DuckDB yields NULL
    z = (u_a - n_a * n_b / 2) / F.nullif(
        F.sqrt(
            n_a * n_b / 12
            * ((n + 1) - tie3 / F.nullif(n * (n - 1), F.lit(0.0)))
        ),
        F.lit(0.0),
    )
    return s.select(
        n_a.cast("bigint").alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
        F.round(u_a, 1).alias("u_a"),
        F.round(n_a * n_b - u_a, 1).alias("u_b"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_5pct"),
    )


# --------------------------------------------------------------------------
@query(
    "stats_ks_test",
    oracle="""
WITH q AS (
    SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS src,
           CAST(l_extendedprice AS DOUBLE) AS x
    FROM lineitem WHERE l_extendedprice IS NOT NULL
),
pv AS (
    SELECT x, sum(CASE WHEN src = 'A' THEN 1 ELSE 0 END) AS c_a,
           count(*) AS c
    FROM q GROUP BY x
),
cum AS (
    SELECT x, sum(c_a) OVER (ORDER BY x) AS cum_a,
           sum(c - c_a) OVER (ORDER BY x) AS cum_b
    FROM pv
),
tot AS (
    SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
           CAST(sum(c - c_a) AS BIGINT) AS n_b
    FROM pv
),
d AS (
    SELECT x, abs(cum_a * n_b - cum_b * n_a) AS d_num
    FROM cum CROSS JOIN tot
),
mx AS (SELECT max(d_num) AS max_num FROM d)
SELECT n_a, n_b,
       round(CAST(max_num AS DOUBLE) / nullif(CAST(n_a AS DOUBLE) * n_b, 0), 6)
           AS d_stat,
       round(min(x), 2) AS ks_at_value,
       CAST(max_num AS DOUBLE) / nullif(CAST(n_a AS DOUBLE) * n_b, 0)
           > 1.358 * sqrt((n_a + CAST(n_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) * n_b))
           AS significant_5pct
FROM d CROSS JOIN mx CROSS JOIN tot
WHERE d_num = max_num
GROUP BY n_a, n_b, max_num
""",
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test — the DISTRIBUTION-shape
    member of the comparison family (Welch = means, Mann-Whitney =
    stochastic order, KS = the whole CDF): D = sup|F_A - F_B| between
    even- and odd-keyed cohorts' price distributions, with the value
    where the gap peaks (ks_at_value localizes WHERE the
    distributions diverge) and the 5% large-sample decision.

    Determinism: the supremum never touches floats — the gap
    numerator |cum_a*n_b - cum_b*n_a| is an exact INTEGER per value
    (common denominator n_a*n_b), so max and the argmin-value
    tie-break are exact on both engines; only the final D and the
    1.358*sqrt critical value assemble in double (fixed order, one
    IEEE sqrt — the Welch recipe).

    Scale shape: one partial-aggregated shuffle to VALUE grain, the
    two cumulative counts share ONE constant-group distributed
    cumsum pass (multi-column grouped_cumsum — range-bucketed, no
    partition-less window), and the sup is a 1-row fold with a
    broadcast-back argmin join.  The checkpointed gap panel is
    VALUE-grain: bounded by distinct values, not rows — for a truly
    continuous key at extreme scale, pre-round the metric to the
    resolution the decision needs before testing (the statistic is
    CDF-level, so quantization below the reporting precision is
    harmless)."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    li = _t(spark, sf_dir, "lineitem")
    # NULL values excluded symmetrically (NULL-injection audit r9)
    q = li.filter(F.col("l_extendedprice").isNotNull()).select(
        F.when(F.col("l_orderkey") % 2 == 0, "A").otherwise("B").alias("src"),
        F.col("l_extendedprice").cast("double").alias("x"),
    )
    pv = (
        q.groupBy("x")
        .agg(
            F.sum(F.when(F.col("src") == "A", 1).otherwise(0)).alias("c_a"),
            F.count(F.lit(1)).alias("c"),
        )
        .withColumn("c_b", F.col("c") - F.col("c_a"))
        .withColumn("__g", F.lit(1))
    )
    cum = grouped_cumsum(
        pv,
        ["__g"],
        [("x", "asc")],
        val=["c_a", "c_b"],
        out=["cum_a", "cum_b"],
    )
    tot = pv.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_b").cast("bigint").alias("n_b"),
    )
    d = (
        cum.join(F.broadcast(tot))
        .select(
            "x",
            "n_a",
            "n_b",
            F.abs(
                F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
            ).alias("d_num"),
        )
        # the max fold and the argmin-value join both read the gap
        # panel: materialize once
        .localCheckpoint(eager=True)
    )
    mx = d.agg(F.max("d_num").alias("max_num"))
    n_a_d = F.col("n_a").cast("double")
    # one-sample-empty degenerate (one-row audit r10): NULL, not ANSI raise
    d_stat = F.col("max_num").cast("double") / F.nullif(
        n_a_d * F.col("n_b"), F.lit(0.0)
    )
    return (
        d.join(F.broadcast(mx))
        .filter(F.col("d_num") == F.col("max_num"))
        .groupBy("n_a", "n_b", "max_num")
        .agg(F.round(F.min("x"), 2).alias("ks_at_value"))
        .select(
            "n_a",
            "n_b",
            F.round(d_stat, 6).alias("d_stat"),
            "ks_at_value",
            (
                d_stat
                > 1.358
                * F.sqrt((F.col("n_a") + F.col("n_b").cast("double")) / (n_a_d * F.col("n_b")))
            ).alias("significant_5pct"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "orders_forecast_holt",
    oracle="""
WITH m AS (
    SELECT date_trunc('month', o_orderdate) AS month,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS rev
    FROM orders GROUP BY 1
),
arr AS (
    -- NULL-revenue months (all totals NULL) leave the series
    -- symmetrically on both engines (all-NULL audit, round 10)
    SELECT array_agg(rev ORDER BY month) AS xs, count(*) AS n
    FROM m WHERE rev IS NOT NULL
),
st AS (
    -- accumulator is a 2-element LIST [l, b], not a struct: DuckDB
    -- 1.0 list_reduce evaluates struct-accumulator fields against
    -- INCONSISTENT acc snapshots (probe: step-2 'b' reads a
    -- different acc than step-2 'l'); list construction folds
    -- consistently (probe-verified against the python reference)
    SELECT n,
           list_reduce(
               list_prepend([xs[1], CAST(0.0 AS DOUBLE)],
                            list_transform(xs[2:],
                                x -> [x, CAST(0.0 AS DOUBLE)])),
               (acc, e) -> [0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
                            0.5 * (0.5 * e[1] + 0.5 * (acc[1] + acc[2])
                                   - acc[1]) + 0.5 * acc[2]]) AS s
    FROM arr
)
SELECT CAST(n AS BIGINT) AS n_months,
       round(s[1], 4) AS level,
       round(s[2], 4) AS trend,
       round(s[1] + s[2], 4) AS forecast_next
FROM st
""",
)
def orders_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend) over
    the monthly revenue series, one-step-ahead forecast — the trend
    upgrade of ev_anomaly_ewma's flat EWMA baseline (EWMA lags a
    trending series systematically; Holt's trend state removes that
    lag) and the forecasting capstone of the orders panel family.
    α = β = 1/2: exact binary weights, so every smoothing step is
    plain IEEE add/multiply — no libm pow — and the left-to-right
    fold evaluates bit-identically on both engines (the EWMA/fold
    contract, sqlfuncs list_reduce parity class).

    Recurrence (zero initial trend, documented): l₁ = x₁, b₁ = 0;
    then lₜ = ½xₜ + ½(l+b), bₜ = ½(lₜ − l) + ½b.

    Scale shape: the fact table collapses to the CALENDAR-bounded
    month panel in one partial-aggregated scan (decimal-exact sums);
    only the ~dozens-of-rows panel is collected into the sequential
    fold — per-task state is bounded by the calendar, never the data
    (the pack_context_windows/corpus_shard_planner bounded-collect
    rule).  Sequential dependence is irreducible in exponential
    smoothing; bounding WHAT is sequential is the design."""
    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("rev")
    ).filter(
        # NULL-revenue months leave the series on both engines
        # (all-NULL audit, round 10)
        F.col("rev").isNotNull()
    )
    arr = m.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("month", "rev"))),
            lambda e: e["rev"],
        ).alias("xs"),
        F.count(F.lit(1)).alias("n"),
    )

    def step(acc, e):
        new_l = 0.5 * e["l"] + 0.5 * (acc["l"] + acc["b"])
        return F.struct(
            new_l.alias("l"),
            (0.5 * (new_l - acc["l"]) + 0.5 * acc["b"]).alias("b"),
        )

    xs = F.col("xs")
    # F.get (0-indexed) is NULL out-of-bounds where ANSI element_at
    # throws — an EMPTY panel (no orders yet) folds to a NULL level
    # exactly like the oracle's xs[1] (zero-row audit, round 10)
    init = F.struct(F.get(xs, 0).alias("l"), F.lit(0.0).alias("b"))
    tail = F.transform(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        lambda x: F.struct(x.alias("l"), F.lit(0.0).alias("b")),
    )
    st = arr.select(
        "n", F.aggregate(tail, init, step).alias("s")
    )
    return st.select(
        F.col("n").cast("bigint").alias("n_months"),
        F.round(F.col("s.l"), 4).alias("level"),
        F.round(F.col("s.b"), 4).alias("trend"),
        F.round(F.col("s.l") + F.col("s.b"), 4).alias("forecast_next"),
    )


# --------------------------------------------------------------------------
#: Poisson-bootstrap replicate count and inverse-CDF ladder for
#: Poisson(1): weight k is the first index whose cumulative
#: probability exceeds the row's deterministic uniform draw.  The
#: 6-decimal cumulative constants are FIXED LITERALS shared by both
#: engines (sum_{i<=k} e^-1/i!), so the resample is bit-reproducible.
BOOT_R = 64
BOOT_POISSON_CDF = (
    0.367879, 0.735759, 0.919699, 0.981012, 0.996340, 0.999406, 0.999917,
)
#: uniform-draw resolution: md5 % 1e6 / 1e6 gives 6 decimal digits,
#: matching the CDF ladder's resolution.
BOOT_U_MOD = 1_000_000


def _boot_weight_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(BOOT_POISSON_CDF)
    )
    return f"CASE {cases} ELSE {len(BOOT_POISSON_CDF)} END"


def _bootstrap_oracle() -> str:
    key = "CAST(o_orderkey AS VARCHAR) || ':' || CAST(r AS VARCHAR)"
    u = f"CAST({md5_int60_sql(key)} % {BOOT_U_MOD} AS DOUBLE) / {BOOT_U_MOD}"
    return f"""
WITH reps AS (
    SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price, r
    FROM orders CROSS JOIN (SELECT unnest(range({BOOT_R})) AS r)
),
w AS (SELECT r, price, {_boot_weight_sql(u)} AS k FROM reps),
means AS (
    SELECT r,
           round(CAST(sum(CAST(k AS DECIMAL(18,0)) * price) AS DOUBLE)
                 / nullif(sum(k), 0), 6) AS m
    FROM w GROUP BY r
),
ranked AS (
    -- NULLS FIRST pins the zero-weight-replicate (NULL mean) rank
    -- placement to Spark's asc default (one-row audit r10): DuckDB
    -- defaults NULLS LAST and the CI picks swapped ends otherwise
    SELECT m, row_number() OVER (ORDER BY m NULLS FIRST, r) AS rk FROM means
),
boot AS (
    SELECT round(CAST(sum(CAST(m AS DECIMAL(20,6))) AS DOUBLE)
                 / {BOOT_R}, 6) AS boot_mean,
           round(sqrt((CAST(sum(CAST(m AS DECIMAL(20,6))
                                * CAST(m AS DECIMAL(20,6))) AS DOUBLE)
                       - CAST(sum(CAST(m AS DECIMAL(20,6))) AS DOUBLE)
                         * CAST(sum(CAST(m AS DECIMAL(20,6))) AS DOUBLE)
                         / {BOOT_R})
                      / ({BOOT_R} - 1)), 6) AS boot_se,
           min(CASE WHEN rk = {max(1, round(0.025 * BOOT_R))} THEN m END)
               AS ci_lo,
           min(CASE WHEN rk = {round(0.975 * BOOT_R)} THEN m END) AS ci_hi
    FROM ranked
),
pt AS (
    SELECT count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS point_mean
    FROM orders
)
SELECT n_orders, point_mean, boot_mean, boot_se, ci_lo, ci_hi,
       point_mean >= ci_lo AND point_mean <= ci_hi AS point_in_ci
FROM pt CROSS JOIN boot
"""


@query("stats_bootstrap_ci", oracle=_bootstrap_oracle())
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for the mean order value
    (Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
    Streams" — the resampling scheme built for one-pass distributed
    data): each of BOOT_R replicates reweights every order by a
    DETERMINISTIC Poisson(1) draw (md5 of (orderkey, replicate) →
    uniform → inverse-CDF ladder), so the full bootstrap needs ONE
    scan, no per-replicate shuffling of the data, and reruns
    bit-identically on both engines.

    Determinism: weights are exact integers from fixed 6-decimal CDF
    literals; replicate sums accumulate in DECIMAL (order-free); each
    replicate mean is one rounded division; the SE assembles from
    exact decimal Σm / Σm² with a single sqrt; the percentile CI picks
    ranked replicate means (rank 2 / 62 of 64) — no float folds
    anywhere.

    Scale shape: the replicate dimension explodes MAP-SIDE (×64 rows
    feeding partial aggregation, so the shuffle carries at most
    64 partials per map task, never 64× the data); the replicate
    panel is 64 rows — the rank, SE, and CI are driver-trivial
    folds over it.  At 100 TB this is scan-bound with a 64-row
    reduction state."""
    from duckdb_hdfs_spark.operators.rebalance import rebalance_cpu_heavy

    od = _t(spark, sf_dir, "orders")
    # the ×BOOT_R replicate explode + per-row md5 is the one CPU-dense
    # map phase of this query; on a single-row-group input it would
    # otherwise run serially in the lone scan task (guide §2.5 input
    # parallelism; with the single-md5 projection below, 31.8s → 4.0s
    # at sf0.1/32, round 13)
    reps = rebalance_cpu_heavy(
        od.select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
    ).select(
        "o_orderkey",
        "price",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_R - 1))).alias("r"),
    )
    u_expr = (
        md5_int60(
            F.concat_ws(
                ":",
                F.col("o_orderkey").cast("string"),
                F.col("r").cast("string"),
            )
        )
        % BOOT_U_MOD
    ).cast("double") / BOOT_U_MOD
    # materialize u as its own projected column BEFORE the CDF ladder:
    # every `when` rung references u, and conditional branches defeat
    # codegen subexpression elimination, so an inlined u re-runs the
    # md5+conv up to |CDF|+1 times per row (profiled: 727s of task
    # time at sf0.1).  CollapseProject keeps a non-cheap multi-
    # referenced alias in its own Project (SPARK-36718), pinning ONE
    # md5 per (order, replicate).
    u = F.col("_u")
    k = F.lit(len(BOOT_POISSON_CDF))
    for i, c in reversed(list(enumerate(BOOT_POISSON_CDF))):
        k = F.when(u < c, F.lit(i)).otherwise(k)
    means = (
        reps.select("r", "price", u_expr.alias("_u"))
        .select("r", "price", k.alias("k"))
        .groupBy("r")
        .agg(
            F.round(
                F.sum(F.col("k").cast("decimal(18,0)") * F.col("price"))
                .cast("double")
                / F.nullif(F.sum("k"), F.lit(0)),
                6,
            ).alias("m")
        )
    )
    md = F.col("m").cast("decimal(20,6)")
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    # replicate-mean ranks via the range-bucketed two-phase cumsum
    # (64-row panel, but the no-global-window rule holds repo-wide)
    ranked = grouped_cumsum(
        means.withColumn("one", F.lit(1)),
        ["one"],
        [("m", "asc"), ("r", "asc")],
        val="one",
        out="rk",
    )
    lo_rk = max(1, round(0.025 * BOOT_R))
    hi_rk = round(0.975 * BOOT_R)
    boot = ranked.agg(
        F.round(F.sum(md).cast("double") / BOOT_R, 6).alias("boot_mean"),
        F.round(
            F.sqrt(
                (
                    F.sum(md * md).cast("double")
                    - F.sum(md).cast("double")
                    * F.sum(md).cast("double")
                    / BOOT_R
                )
                / (BOOT_R - 1)
            ),
            6,
        ).alias("boot_se"),
        F.min(F.when(F.col("rk") == lo_rk, F.col("m"))).alias("ci_lo"),
        F.min(F.when(F.col("rk") == hi_rk, F.col("m"))).alias("ci_hi"),
    )
    pt = od.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("point_mean"),
    )
    return pt.join(F.broadcast(boot)).select(
        "n_orders",
        "point_mean",
        "boot_mean",
        "boot_se",
        "ci_lo",
        "ci_hi",
        (
            (F.col("point_mean") >= F.col("ci_lo"))
            & (F.col("point_mean") <= F.col("ci_hi"))
        ).alias("point_in_ci"),
    )


# --------------------------------------------------------------------------
#: chi-square 5% critical values by dof — fixed literals both engines.
KW_CHI2_CRIT = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070, 6: 12.592}


def _kw_crit_sql(dof: str) -> str:
    cases = " ".join(
        f"WHEN {dof} = {d} THEN {c!r}" for d, c in KW_CHI2_CRIT.items()
    )
    return f"CASE {cases} END"


def _kruskal_oracle() -> str:
    return f"""
WITH q AS (
    SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS x
    FROM lineitem WHERE l_quantity IS NOT NULL
),
pvg AS (SELECT x, grp, count(*) AS c_g FROM q GROUP BY x, grp),
pv AS (SELECT x, sum(c_g) AS c FROM pvg GROUP BY x),
cum AS (SELECT x, c, sum(c) OVER (ORDER BY x) AS cumc FROM pv),
rg AS (
    SELECT grp,
           sum(CAST(c_g AS DECIMAL(38,0))
               * CAST(2 * cumc - c + 1 AS DECIMAL(38,0))) AS r2_g,
           CAST(sum(c_g) AS DOUBLE) AS n_g
    FROM pvg JOIN cum USING (x) GROUP BY grp
),
tie AS (
    SELECT CAST(sum(CAST(c AS DECIMAL(38,0)) * c * c - c) AS DOUBLE) AS tie3,
           CAST(sum(c) AS DOUBLE) AS n
    FROM pv
),
terms AS (
    SELECT grp, n_g,
           CAST(r2_g AS DOUBLE) / 2 / n_g AS mean_rank,
           CAST(round((CAST(r2_g AS DOUBLE) / 2)
                      * (CAST(r2_g AS DOUBLE) / 2) / n_g, 4)
                AS DECIMAL(38,4)) AS term
    FROM rg
),
h AS (
    SELECT 12 / (n * (n + 1)) * CAST(sum(term) AS DOUBLE) - 3 * (n + 1)
               AS h_raw,
           count(*) - 1 AS dof, tie3, n
    FROM terms CROSS JOIN tie
    GROUP BY tie3, n
)
SELECT t.grp, CAST(t.n_g AS BIGINT) AS n_g,
       round(t.mean_rank, 4) AS mean_rank,
       round(h.h_raw / nullif(1 - h.tie3 / nullif(h.n * h.n * h.n - h.n, 0), 0), 6)
           AS h_stat,
       CAST(h.dof AS BIGINT) AS dof,
       h.h_raw / nullif(1 - h.tie3 / nullif(h.n * h.n * h.n - h.n, 0), 0)
           > {_kw_crit_sql("h.dof")} AS significant_5pct
FROM terms t CROSS JOIN h
"""


@query("stats_kruskal_wallis", oracle=_kruskal_oracle())
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test (the k-group extension of
    stats_mann_whitney): are the l_quantity distributions of the
    return-flag cohorts shifted?  Rank-based one-way ANOVA with the
    tie-corrected statistic H' = H / (1 − Σ(c³−c)/(n³−n)) — the
    nonparametric gate before pairwise rank tests.

    Determinism: the Mann-Whitney recipe generalized — value-grain
    panel, DOUBLED average ranks (2·cum − c + 1) as exact integers,
    per-group rank sums in DECIMAL(38,0); each group's squared-rank
    term rounds to 4dp then sums in DECIMAL (reducer-order-free);
    the final H assembly is one fixed-order double expression.

    Scale shape: one partial-aggregated shuffle to (value, group)
    grain (bounded by the 50-value quantity domain × 3 flags), the
    global cumulative count through operators/ranks.grouped_cumsum
    under a constant group, and a 3-row fold — never per-row ranks."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    li = _t(spark, sf_dir, "lineitem")
    # NULL values excluded symmetrically (NULL-injection audit r9)
    q = li.filter(F.col("l_quantity").isNotNull()).select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("double").alias("x"),
    )
    # checkpoint the (value, group) panel: it feeds BOTH the total-count
    # cumsum and the per-group rank sums — without the pin each branch
    # re-executes the lineitem scan (2 scans measured)
    pvg = (
        q.groupBy("x", "grp")
        .agg(F.count(F.lit(1)).alias("c_g"))
        .localCheckpoint(eager=True)
    )
    pv = pvg.groupBy("x").agg(F.sum("c_g").alias("c")).withColumn(
        "__g", F.lit(1)
    )
    cum = grouped_cumsum(pv, ["__g"], [("x", "asc")], val="c", out="cumc")
    rg = (
        pvg.join(cum.select("x", "c", "cumc"), "x")
        .groupBy("grp")
        .agg(
            F.sum(
                F.col("c_g").cast("decimal(38,0)")
                * (2 * F.col("cumc") - F.col("c") + 1).cast("decimal(38,0)")
            ).alias("r2_g"),
            F.sum("c_g").cast("double").alias("n_g"),
        )
    )
    tie = cum.agg(
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
            - F.col("c")
        )
        .cast("double")
        .alias("tie3"),
        F.sum("c").cast("double").alias("n"),
    )
    half_r = F.col("r2_g").cast("double") / 2
    terms = rg.select(
        "grp",
        "n_g",
        (half_r / F.col("n_g")).alias("mean_rank"),
        F.round(half_r * half_r / F.col("n_g"), 4)
        .cast("decimal(38,4)")
        .alias("term"),
    )
    h = (
        terms.join(F.broadcast(tie))
        .groupBy("tie3", "n")
        .agg(
            (
                12 / (F.col("n") * (F.col("n") + 1))
                * F.sum("term").cast("double")
                - 3 * (F.col("n") + 1)
            ).alias("h_raw"),
            (F.count(F.lit(1)) - 1).alias("dof"),
        )
    )
    # mirrored nullif guards (constant-data audit, round 10): an
    # all-ties stream makes tie3 == n^3 - n (denominator 0), and a
    # 1-row stream zeroes n^3 - n itself — Spark's ANSI division
    # raises on either; both engines NULL out instead
    corr = F.col("h_raw") / F.nullif(
        1
        - F.col("tie3")
        / F.nullif(
            F.col("n") * F.col("n") * F.col("n") - F.col("n"), F.lit(0.0)
        ),
        F.lit(0.0),
    )
    crit = F.lit(None).cast("double")
    for d, c in KW_CHI2_CRIT.items():
        crit = F.when(F.col("dof") == d, F.lit(c)).otherwise(crit)
    return terms.join(F.broadcast(h)).select(
        "grp",
        F.col("n_g").cast("bigint").alias("n_g"),
        F.round("mean_rank", 4).alias("mean_rank"),
        F.round(corr, 6).alias("h_stat"),
        F.col("dof").cast("bigint").alias("dof"),
        (corr > crit).alias("significant_5pct"),
    )


# --------------------------------------------------------------------------
def _theil_sen_oracle() -> str:
    return """
WITH m AS (
    SELECT (year(o_orderdate) - 1990) * 12 + month(o_orderdate) AS t,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
    FROM orders GROUP BY t
),
pairs AS (
    SELECT CAST(round((b.y - a.y) / (b.t - a.t), 6) AS DECIMAL(28,6)) AS s
    FROM m a JOIN m b ON a.t < b.t
),
pv AS (SELECT s, count(*) AS c FROM pairs GROUP BY s),
cum AS (SELECT s, sum(c) OVER (ORDER BY s) AS cumc FROM pv),
np AS (SELECT count(*) AS n_pairs FROM pairs),
med AS (
    SELECT (min(CASE WHEN cumc >= (n_pairs + 1) // 2 THEN s END)
            + min(CASE WHEN cumc >= n_pairs // 2 + 1 THEN s END)) / 2
               AS ts_slope
    FROM cum CROSS JOIN np
),
ols AS (
    SELECT count(*) AS n_months,
           (count(*) * CAST(sum(CAST(t AS DECIMAL(28,6))
                                * CAST(y AS DECIMAL(28,6))) AS DOUBLE)
            - CAST(sum(CAST(t AS DECIMAL(28,0))) AS DOUBLE)
              * CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE))
           / nullif(count(*) * CAST(sum(CAST(t AS DECIMAL(28,0)) * t)
                                     AS DOUBLE)
                    - CAST(sum(CAST(t AS DECIMAL(28,0))) AS DOUBLE)
                      * CAST(sum(CAST(t AS DECIMAL(28,0))) AS DOUBLE), 0)
               AS ols
    FROM m
)
SELECT CAST(n_months AS BIGINT) AS n_months,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       round(CAST(ts_slope AS DOUBLE), 6) AS ts_slope,
       round(ols, 6) AS ols_slope,
       round(CAST(ts_slope AS DOUBLE) - ols, 6) AS robust_minus_ols
FROM med CROSS JOIN ols CROSS JOIN np
"""


@query("stats_theil_sen_slope", oracle=_theil_sen_oracle())
def stats_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend: the median of all pairwise slopes of
    the monthly-revenue panel, beside the OLS slope
    (stats_linear_regression's estimator) — 29% outlier breakdown vs
    OLS's zero; the difference column is the outlier-influence
    diagnostic.

    Determinism: the panel aggregates in DECIMAL; each pairwise slope
    is one double division rounded to 6dp then DECIMAL-grained, so the
    median picks exact ranked values through the range-bucketed
    cumsum; even pair counts average the two middles in decimal.

    Scale shape: the O(d²) pair set is CALENDAR-BOUNDED (d = months,
    so ~84 rows → 3.5k pairs regardless of order volume) and builds
    via a broadcast nested-loop join of the tiny panel against
    itself; the raw orders scan collapses to month grain through one
    partial-aggregated shuffle.  The median never sorts globally —
    value-grain counts + grouped_cumsum, the Mann-Whitney recipe."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    od = _t(spark, sf_dir, "orders")
    m = (
        od.groupBy(
            (
                (F.year("o_orderdate") - 1990) * 12 + F.month("o_orderdate")
            ).alias("t")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
        .localCheckpoint(eager=True)
    )
    a = m.select(F.col("t").alias("t1"), F.col("y").alias("y1"))
    b = m.select(F.col("t").alias("t2"), F.col("y").alias("y2"))
    pairs = F.broadcast(a).join(b, F.col("t1") < F.col("t2")).select(
        F.round(
            (F.col("y2") - F.col("y1")) / (F.col("t2") - F.col("t1")), 6
        )
        .cast("decimal(28,6)")
        .alias("s")
    )
    pv = (
        pairs.groupBy("s")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("__g", F.lit(1))
    )
    cum = grouped_cumsum(pv, ["__g"], [("s", "asc")], val="c", out="cumc")
    np_ = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    lo_rank = F.floor((F.col("n_pairs") + 1) / 2)
    hi_rank = F.floor(F.col("n_pairs") / 2) + 1
    med = (
        cum.join(F.broadcast(np_))
        .agg(
            (
                (
                    F.min(F.when(F.col("cumc") >= lo_rank, F.col("s")))
                    + F.min(F.when(F.col("cumc") >= hi_rank, F.col("s")))
                )
                / 2
            ).alias("ts_slope"),
        )
        # n_pairs joins back from the 1-row count aggregate: on an
        # EMPTY panel first(n_pairs) over the empty cum×np join gave
        # NULL where the oracle's np CTE gives 0 (zero-row audit,
        # round 10) — the count row itself always exists
        .join(F.broadcast(np_))
    )
    td = F.col("t").cast("decimal(28,0)")
    yd = F.col("y").cast("decimal(28,6)")
    ols = m.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum(td).alias("st"),
        F.sum(yd).alias("sy"),
        F.sum(td * F.col("t")).alias("stt"),
        F.sum(td.cast("decimal(28,6)") * yd).alias("sty"),
    ).select(
        "n_months",
        (
            (
                F.col("n_months") * F.col("sty").cast("double")
                - F.col("st").cast("double") * F.col("sy").cast("double")
            )
            / F.nullif(
                F.col("n_months") * F.col("stt").cast("double")
                - F.col("st").cast("double") * F.col("st").cast("double"),
                F.lit(0.0),
            )
        ).alias("ols"),
    )
    return med.join(F.broadcast(ols)).select(
        F.col("n_months").cast("bigint").alias("n_months"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.round(F.col("ts_slope").cast("double"), 6).alias("ts_slope"),
        F.round("ols", 6).alias("ols_slope"),
        F.round(
            F.col("ts_slope").cast("double") - F.col("ols"), 6
        ).alias("robust_minus_ols"),
    )


# --------------------------------------------------------------------------
def _anova_oracle() -> str:
    return f"""
WITH g AS (
    SELECT l_returnflag AS grp, count(*) AS n_j,
           sum(CAST(l_quantity AS DECIMAL(20,2))) AS s_j,
           sum(CAST(l_quantity AS DECIMAL(20,2)) * l_quantity) AS ss_j
    FROM lineitem GROUP BY grp
),
t AS (
    SELECT CAST(sum(n_j) AS DOUBLE) AS n,
           CAST(sum(s_j) AS DOUBLE) AS s,
           CAST(sum(ss_j) AS DOUBLE) AS ss,
           count(*) AS k,
           CAST(sum(CAST(round(CAST(s_j AS DOUBLE) * CAST(s_j AS DOUBLE)
                                / n_j, 4) AS DECIMAL(38,4))) AS DOUBLE)
               AS sum_sq_over_n
    FROM g
),
f AS (
    SELECT k, n,
           ((sum_sq_over_n - s * s / n) / nullif(k - 1, 0))
           / nullif((ss - sum_sq_over_n) / nullif(n - k, 0), 0) AS f_stat
    FROM t
)
SELECT g.grp, CAST(g.n_j AS BIGINT) AS n_j,
       round(CAST(g.s_j AS DOUBLE) / g.n_j, 6) AS mean_j,
       round(f.f_stat, 6) AS f_stat,
       CAST(f.k - 1 AS BIGINT) AS df1,
       CAST(f.n - f.k AS BIGINT) AS df2,
       f.f_stat > {_kw_crit_sql("(f.k - 1)")} / nullif(f.k - 1, 0) AS significant_5pct
FROM g CROSS JOIN f
"""


@query("stats_anova_oneway", oracle=_anova_oracle())
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F test — the PARAMETRIC sibling of
    stats_kruskal_wallis on the same panel (l_quantity by return
    flag): between/within mean squares from exact decimal power sums
    (the Welch-t recipe extended to k groups).  Significance gates on
    F(k−1, ∞) = χ²(k−1)/(k−1) — exact to 3+ decimals at these n,
    shared literal ladder with the KW test.

    Determinism: per-group Σx and Σx² accumulate in DECIMAL; each
    group's s²/n term rounds to 4dp then DECIMAL-sums (reducer-order-
    free); the F assembly is one fixed-order double expression with a
    nullif zero-variance guard on both engines.

    Scale shape: ONE partial-aggregated shuffle to the 3-row group
    panel; everything after is a 3-row fold with a broadcast 1-row
    statistic — the cheapest possible distributed ANOVA."""
    li = _t(spark, sf_dir, "lineitem")
    # checkpoint the 3-row group panel: it feeds both the F fold and
    # the output join — without the pin each branch re-executes the
    # lineitem scan
    g = (
        li.groupBy(F.col("l_returnflag").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_j"),
            F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("s_j"),
            F.sum(
                F.col("l_quantity").cast("decimal(20,2)") * F.col("l_quantity")
            ).alias("ss_j"),
        )
        .localCheckpoint(eager=True)
    )
    t = g.agg(
        F.sum("n_j").cast("double").alias("n"),
        F.sum("s_j").cast("double").alias("s"),
        F.sum("ss_j").cast("double").alias("ss"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.round(
                F.col("s_j").cast("double")
                * F.col("s_j").cast("double")
                / F.col("n_j"),
                4,
            ).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("sum_sq_over_n"),
    )
    f_stat = (
        (F.col("sum_sq_over_n") - F.col("s") * F.col("s") / F.col("n"))
        / F.nullif(F.col("k") - 1, F.lit(0))
    ) / F.nullif(
        (F.col("ss") - F.col("sum_sq_over_n"))
        / F.nullif(F.col("n") - F.col("k"), F.lit(0)),
        F.lit(0.0),
    )
    ft = t.select("k", "n", f_stat.alias("f_stat"))
    crit = F.lit(None).cast("double")
    for d, c in KW_CHI2_CRIT.items():
        crit = F.when(F.col("k") - 1 == d, F.lit(c)).otherwise(crit)
    return g.join(F.broadcast(ft)).select(
        "grp",
        F.col("n_j").cast("bigint").alias("n_j"),
        F.round(F.col("s_j").cast("double") / F.col("n_j"), 6).alias("mean_j"),
        F.round("f_stat", 6).alias("f_stat"),
        (F.col("k") - 1).cast("bigint").alias("df1"),
        (F.col("n") - F.col("k")).cast("bigint").alias("df2"),
        (F.col("f_stat") > crit / F.nullif(F.col("k") - 1, F.lit(0))).alias("significant_5pct"),
    )


# --------------------------------------------------------------------------
def _prop_ztest_oracle() -> str:
    from duckdb_hdfs_spark.functions.hashing import md5_int60_sql

    b = f"{md5_int60_sql('CAST(user_id AS VARCHAR)')} % 2"
    return f"""
WITH assign AS (
    SELECT user_id, CASE WHEN {b} = 0 THEN 'A' ELSE 'B' END AS arm,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY user_id, arm
),
arms AS (
    SELECT CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS DOUBLE) AS n_a,
           CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS DOUBLE) AS n_b,
           CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS DOUBLE)
               AS c_a,
           CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS DOUBLE)
               AS c_b
    FROM assign
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(c_a / nullif(n_a, 0), 6) AS rate_a, round(c_b / nullif(n_b, 0), 6) AS rate_b,
       round(c_a / nullif(n_a, 0) - c_b / nullif(n_b, 0), 6) AS rate_diff,
       round((c_a / nullif(n_a, 0) - c_b / nullif(n_b, 0))
             / nullif(sqrt((c_a + c_b) / (n_a + n_b)
                           * (1 - (c_a + c_b) / (n_a + n_b))
                           * (1 / nullif(n_a, 0) + 1 / nullif(n_b, 0))), 0),
             6) AS z_stat,
       abs((c_a / nullif(n_a, 0) - c_b / nullif(n_b, 0))
           / nullif(sqrt((c_a + c_b) / (n_a + n_b)
                         * (1 - (c_a + c_b) / (n_a + n_b))
                         * (1 / nullif(n_a, 0) + 1 / nullif(n_b, 0))), 0))
           > 1.96
           AS significant_5pct
FROM arms
"""


@query("stats_proportions_ztest", oracle=_prop_ztest_oracle())
def stats_proportions_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion pooled z-test on the A/B conversion rates — the
    experiment READ that ev_abtest_srm's health check gates: same md5
    50/50 assignment, per-user conversion flags, pooled-variance z
    with the 5% two-sided bar.  Completes the experimentation pair
    (assignment health → effect significance).

    Determinism: all counts are exact integers; the z assembles in
    one fixed-order double expression with a single IEEE √ and a
    nullif guard (degenerate all-convert / none-convert panels yield
    NULL on both engines).

    Scale shape: one partial-aggregated shuffle to user grain, then a
    1-row fold — no joins, no windows."""
    from duckdb_hdfs_spark.functions.hashing import md5_int60

    ev = _t(spark, sf_dir, "events")
    assign = ev.groupBy(
        "user_id",
        F.when(md5_int60(F.col("user_id").cast("string")) % 2 == 0, "A")
        .otherwise("B")
        .alias("arm"),
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    arms = assign.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("double")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("double")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("conv")).otherwise(0))
        .cast("double")
        .alias("c_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("conv")).otherwise(0))
        .cast("double")
        .alias("c_b"),
    )
    # an EMPTY arm (every user hashed to one side — the one-row audit
    # degenerate) NULLs its rate and the z on both engines, never an
    # ANSI raise (guards mirrored in the oracle)
    n_a = F.nullif(F.col("n_a"), F.lit(0.0))
    n_b = F.nullif(F.col("n_b"), F.lit(0.0))
    c_a, c_b = F.col("c_a"), F.col("c_b")
    pooled = (c_a + c_b) / (F.col("n_a") + F.col("n_b"))
    z = (c_a / n_a - c_b / n_b) / F.nullif(
        F.sqrt(pooled * (1 - pooled) * (1 / n_a + 1 / n_b)), F.lit(0.0)
    )
    return arms.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(c_a / n_a, 6).alias("rate_a"),
        F.round(c_b / n_b, 6).alias("rate_b"),
        F.round(c_a / n_a - c_b / n_b, 6).alias("rate_diff"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_5pct"),
    )


# --------------------------------------------------------------------------
def _spearman_oracle() -> str:
    return """
WITH r AS (
    SELECT l_returnflag AS flag,
           CAST(round(l_quantity, 0) AS BIGINT) AS x,
           l_extendedprice AS y
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
pg AS (SELECT flag, x, y, count(*) AS cnt FROM r GROUP BY 1, 2, 3),
rk AS (
    -- average-rank of a VALUE counting underlying ROWS: default
    -- RANGE frame includes all peers, so cum_before = cum_incl -
    -- ties; doubled avg rank = 2*cum_before + ties + 1 (integer)
    SELECT flag, cnt,
           2 * (sum(cnt) OVER (PARTITION BY flag ORDER BY x)
                - sum(cnt) OVER (PARTITION BY flag, x))
               + sum(cnt) OVER (PARTITION BY flag, x) + 1 AS rx,
           2 * (sum(cnt) OVER (PARTITION BY flag ORDER BY y)
                - sum(cnt) OVER (PARTITION BY flag, y))
               + sum(cnt) OVER (PARTITION BY flag, y) + 1 AS ry
    FROM pg
),
s AS (
    SELECT flag, CAST(sum(cnt) AS DOUBLE) AS n,
           CAST(sum(CAST(cnt AS DECIMAL(10,0))
                    * CAST(rx AS DECIMAL(14,0))) AS DOUBLE) AS sx,
           CAST(sum(CAST(cnt AS DECIMAL(10,0))
                    * CAST(ry AS DECIMAL(14,0))) AS DOUBLE) AS sy,
           CAST(sum(CAST(cnt AS DECIMAL(10,0))
                    * CAST(rx AS DECIMAL(14,0))
                    * CAST(ry AS DECIMAL(14,0))) AS DOUBLE) AS sxy,
           CAST(sum(CAST(cnt AS DECIMAL(10,0))
                    * CAST(rx AS DECIMAL(14,0))
                    * CAST(rx AS DECIMAL(14,0))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(cnt AS DECIMAL(10,0))
                    * CAST(ry AS DECIMAL(14,0))
                    * CAST(ry AS DECIMAL(14,0))) AS DOUBLE) AS syy
    FROM rk GROUP BY flag
),
g AS (
    SELECT flag, n,
           (n * sxy - sx * sy)
           / nullif(sqrt(greatest(n * sxx - sx * sx, 0)
                         * greatest(n * syy - sy * sy, 0)), 0) AS rho
    FROM s
)
SELECT flag, CAST(n AS BIGINT) AS n_rows,
       round(rho, 6) AS spearman_rho,
       round(rho * sqrt((n - 2) / nullif(greatest(1 - rho * rho, 0), 0)), 6)
           AS t_stat,
       abs(rho * sqrt((n - 2) / nullif(greatest(1 - rho * rho, 0), 0))) > 1.96
           AS significant_5pct
FROM g
"""


# headline: the most shuffle-heavy stats key (9 exchanges) — keeps the
# bench representative of the round-9 registry widening (r9 verdict
# task 6); DuckDB baseline re-measured at sf0.1 in README
@query("stats_spearman_corr", oracle=_spearman_oracle(), headline=True)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation per return-flag panel
    (quantity vs extended price) — the MONOTONE-association sibling of
    stats_moments' Pearson: rank-transform both variables with
    average ranks (the tie correction), then Pearson over the ranks.
    Completes the robust-stats family (stats_mann_whitney = location,
    stats_theil_sen_slope = robust trend, this = robust association).

    Determinism: average ranks are half-integers, so DOUBLE ranks
    (2x avg rank = 2*cum_before + tie_count + 1) are exact INTEGERS;
    all five power sums accumulate as exact DECIMAL tie-weighted
    products cnt*r (and cnt*r*r; order-independent, 38-digit-safe to
    ~1e12 rows/group), and the rho/t assembly is one fixed-order
    double expression with IEEE sqrt only — bit-identical
    cross-engine.  Degenerate zero-variance panels NULL out via
    mirrored greatest/nullif guards on BOTH engines (guard-parity
    rule, round-8 advice).

    Scale shape (round-10 restructure — the original pair-grain
    formulation paid a row-grain checkpoint, a second grouped_cumsum
    for x, and a row-grain join-back; ~2× faster now, identical
    values): x's value grain is domain-bounded (~50 quantities per
    flag at ANY volume), so its average ranks come from a broadcast
    theta-join over the tiny (flag, x) panel — no cumsum machinery.
    The broadcast rx then rides the ROW SCAN into ONE (flag, y)
    aggregation that carries the x-side cross terms as weights
    (sxr = Σ rx, sxr2 = Σ rx² per distinct y) — after y's ranks
    arrive from operators.ranks.grouped_cumsum (the two-phase
    range-bucketed cumulative count; NO per-flag window — 3 flags
    would funnel 1/3 of a 100 TB table through single window tasks),
    ALL six power sums fold from the distinct-y grain directly:
    Σrows rx·ry = Σ_y ry·(Σ_{rows at y} rx).  No row-grain
    checkpoint, no row-grain join-back; lineitem is scanned twice
    (tiny x-panel pass + the row pass), both projection-pruned to
    2-3 columns.  Every sum is an exact integer in the decimal
    domain, so the regrouped association is bit-identical."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    li = _t(spark, sf_dir, "lineitem").filter(
        # NULL x/y excluded symmetrically (NULL-injection audit r9)
        F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    )
    rows = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round("l_quantity", 0).cast("bigint").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    # x ranks: ~50-value domain per flag → broadcast theta-join panel
    # (2·cum_before + cx + 1 = twice the average rank, an exact int)
    px = rows.groupBy("flag", "x").agg(F.count(F.lit(1)).alias("cx"))
    other = px.select(
        F.col("flag").alias("f2"), F.col("x").alias("x2"),
        F.col("cx").alias("cx2"),
    )
    vx = (
        px.join(
            F.broadcast(other),
            (F.col("f2") == F.col("flag")) & (F.col("x2") < F.col("x")),
            "left",
        )
        .groupBy("flag", "x", "cx")
        .agg(F.coalesce(F.sum("cx2"), F.lit(0)).alias("cumb"))
        .select(
            "flag", "x",
            (2 * F.col("cumb") + F.col("cx") + 1).alias("rx"),
        )
    )
    rxd = F.col("rx").cast("decimal(14,0)")
    # one row pass: attach broadcast rx, collapse to distinct-y grain
    # carrying the x-side cross-term weights.  The explicit
    # repartition on the agg keys (round 11, stage-profiled): y is
    # near-unique within flag (~1.003 rows per distinct
    # extendedprice), so map-side partial aggregation builds a
    # ~600k-entry hash table for no reduction — and the scan side is
    # as parallel as the FILE layout allows (testdata sf0.1 is one
    # 600k-row row group → ONE effective scan task; the profiler
    # measured that scan+join+partial-agg task at ~1.0s, the single
    # largest stage).  Repartitioning on exactly the groupBy keys
    # adds no exchange (the agg reuses it) but moves the hash-agg
    # work BEHIND the shuffle onto all cores and strips the useless
    # partial build from the scan task (interleaved A/B: 3.76 →
    # 3.37s median).  At 100 TB the same argument holds wherever the
    # agg grain is ~1:1 with the input — partial agg is pure
    # overhead at any file layout.  Negative result (round 11, do
    # not re-attempt): fusing the two lineitem scans behind a
    # repartition(32).localCheckpoint of the projected rows measured
    # a FULL SECOND SLOWER (4.10 vs 3.11s interleaved) — the eager
    # materialization barrier + checkpoint write/read of 600k rows
    # costs ~4x the 0.25s second scan it saves.
    g = (
        rows.join(F.broadcast(vx), ["flag", "x"])
        .repartition("flag", "y")
        .groupBy("flag", "y")
        .agg(
            F.count(F.lit(1)).alias("cy"),
            F.sum(rxd).alias("sxr"),
            F.sum(rxd * rxd).alias("sxr2"),
        )
    )
    vy = grouped_cumsum(
        g, ["flag"], [("y", "asc")], "cy", "cumy",
    ).withColumn("ry", 2 * F.col("cumy") - F.col("cy") + 1)
    cyd = F.col("cy").cast("decimal(10,0)")
    ryd = F.col("ry").cast("decimal(14,0)")
    s = vy.groupBy("flag").agg(
        F.sum("cy").cast("double").alias("n"),
        F.sum("sxr").cast("double").alias("sx"),
        F.sum(cyd * ryd).cast("double").alias("sy"),
        F.sum(F.col("sxr") * ryd).cast("double").alias("sxy"),
        F.sum("sxr2").cast("double").alias("sxx"),
        F.sum(cyd * ryd * ryd).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    rho = (n * sxy - sx * sy) / F.nullif(
        F.sqrt(
            F.greatest(n * sxx - sx * sx, F.lit(0.0))
            * F.greatest(n * syy - sy * sy, F.lit(0.0))
        ),
        F.lit(0.0),
    )
    t = rho * F.sqrt(
        (n - 2) / F.nullif(F.greatest(1 - rho * rho, F.lit(0.0)), F.lit(0.0))
    )
    return s.select(
        "flag",
        n.cast("bigint").alias("n_rows"),
        F.round(rho, 6).alias("spearman_rho"),
        F.round(t, 6).alias("t_stat"),
        (F.abs(t) > 1.96).alias("significant_5pct"),
    )


# --------------------------------------------------------------------------
def _bh_fdr_oracle() -> str:
    return """
WITH hp AS (
    SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hr,
           count(*) AS n,
           sum(CAST(value AS DECIMAL(18,6))) AS s1d,
           sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
               AS s2d
    FROM events GROUP BY 1
),
g AS (
    SELECT CAST(sum(n) AS BIGINT) AS gn, sum(s1d) AS gs1d, sum(s2d) AS gs2d,
           count(*) AS m
    FROM hp
),
z AS (
    -- nullif guards mirror the Spark side exactly: on DuckDB >= 1.1
    -- (ieee_floating_point_ops=true) float x/0 yields Inf/NaN rather
    -- than NULL, so parity on 1-row-hour / whole-stream-hour
    -- degenerates must not depend on engine-version division
    -- semantics (round-9 advice)
    SELECT hr, n,
           round((CAST(s1d AS DOUBLE) / n
                  - CAST(gs1d - s1d AS DOUBLE) / nullif(gn - n, 0))
                 / nullif(sqrt(
                       ((CAST(s2d AS DOUBLE)
                         - CAST(s1d AS DOUBLE) * CAST(s1d AS DOUBLE) / n)
                        / nullif(n - 1, 0)) / n
                       + ((CAST(gs2d - s2d AS DOUBLE)
                           - CAST(gs1d - s1d AS DOUBLE)
                             * CAST(gs1d - s1d AS DOUBLE) / nullif(gn - n, 0))
                          / nullif(gn - n - 1, 0)) / nullif(gn - n, 0)),
                   0), 6) AS zs,
           round(CAST(s1d AS DOUBLE) / n, 6) AS mean_value,
           m
    FROM hp CROSS JOIN g
),
p AS (
    SELECT hr, n, mean_value, zs, m,
           CAST(coalesce(round(2 / (1 + exp(1.702 * abs(zs))), 9), 1.0)
                AS DECIMAL(11,9)) AS pv
    FROM z
),
rk AS (
    SELECT hr, n, mean_value, zs, m, pv,
           row_number() OVER (ORDER BY pv, hr) AS i
    FROM p
),
adj AS (
    SELECT *,
           least(min(CAST(pv AS DOUBLE) * m / i)
                     OVER (ORDER BY i
                           ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING), 1.0) AS pa
    FROM rk
)
SELECT hr, CAST(n AS BIGINT) AS n_events, mean_value,
       zs AS z_stat,
       CAST(pv AS DOUBLE) AS p_value,
       CAST(i AS BIGINT) AS p_rank,
       round(pa, 6) AS p_adj,
       pa <= 0.05 AS rejected_fdr_5pct
FROM adj
"""


@query("stats_bh_fdr", oracle=_bh_fdr_oracle())
def stats_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction over a 24-hypothesis panel
    (does hour-of-day h shift mean event value vs the rest?) — the
    MULTIPLE-TESTING layer the per-test family (welch/z/ANOVA/KW)
    needs before anyone reads 24 p-values at once: at alpha=0.05,
    ~1.2 raw rejections happen by chance alone; BH's step-up
    adjusted p (min over j>=i of p_(j)*m/j, capped at 1) controls
    the false-discovery rate.

    Determinism: hour power sums are exact DECIMALs; the rest-of-
    population terms subtract in the decimal domain BEFORE the one
    double cast (summing 24 per-hour doubles would be association-
    order-sensitive cross-engine); z rounds to 6dp; p = the logistic
    normal-tail approximation 2/(1+exp(1.702|z|)) of the ROUNDED z,
    itself rounded to a 9dp DECIMAL grain so ranking and the BH
    min-fold see identical values on both engines.

    Scale shape: one partial-aggregated shuffle to the 24-row hour
    panel; global moments via one broadcast 1-row decimal fold (the
    scalar-threshold crossJoin shape, exchange-reused); rank and the
    step-up min are two broadcast theta-joins over the 24-row panel
    — no partition-less windows anywhere."""
    from duckdb_hdfs_spark.operators.ranks import panel_rank

    ev = _t(spark, sf_dir, "events")
    vd = F.col("value").cast("decimal(18,6)")
    hp = ev.groupBy(
        F.hour("ts").cast("bigint").alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vd).alias("s1d"),
        F.sum(vd * vd).alias("s2d"),
    )
    g = hp.agg(
        F.sum("n").cast("bigint").alias("gn"),
        F.sum("s1d").alias("gs1d"),
        F.sum("s2d").alias("gs2d"),
        F.count(F.lit(1)).alias("m"),
    )
    n, gn = F.col("n"), F.col("gn")
    s1, s2 = F.col("s1d").cast("double"), F.col("s2d").cast("double")
    r1 = (F.col("gs1d") - F.col("s1d")).cast("double")
    r2 = (F.col("gs2d") - F.col("s2d")).cast("double")
    # every zero-able denominator NULLs instead of throwing: a 1-row
    # hour (n=1) or an hour holding the whole stream (gn=n) is an
    # ANSI ArithmeticException Spark-side while DuckDB's x/0 yields
    # NULL — the mirrored nullifs make BOTH engines emit NULL z →
    # p=1 "no evidence" (tiny-data audit, round 9)
    nm1 = F.nullif((n - 1).cast("double"), F.lit(0.0))
    rest = F.nullif((gn - n).cast("double"), F.lit(0.0))
    rest1 = F.nullif((gn - n - 1).cast("double"), F.lit(0.0))
    var_h = (s2 - s1 * s1 / n) / nm1
    var_r = (r2 - r1 * r1 / rest) / rest1
    zs = F.round(
        (s1 / n - r1 / rest)
        / F.nullif(F.sqrt(var_h / n + var_r / rest), F.lit(0.0)),
        6,
    )
    z = hp.join(F.broadcast(g)).select(
        "hr",
        "n",
        zs.alias("zs"),
        F.round(s1 / n, 6).alias("mean_value"),
        "m",
    )
    # a degenerate constant stream NULLs z (the mirrored nullif);
    # p coalesces to 1.0 on BOTH engines — "no evidence" — so the BH
    # rank stays total and NULL never reaches the ordering (round-9
    # review: a NULL p ranked 1 under the theta-join but NULLS-LAST
    # under the oracle's row_number)
    pv = F.coalesce(
        F.round(2 / (1 + F.exp(1.702 * F.abs(F.col("zs")))), 9),
        F.lit(1.0),
    ).cast("decimal(11,9)")
    # rank + step-up min over the 24-row panel: two broadcast
    # theta-joins — shared small-panel rank (operators/ranks.
    # panel_rank), then the min-fold over the materialized ranks
    p = z.select("hr", "n", "mean_value", "zs", "m", pv.alias("pv"))
    rk = panel_rank(p, [("pv", "asc"), ("hr", "asc")], "i").localCheckpoint(
        eager=True
    )
    o2 = rk.select(
        F.col("i").alias("j"),
        (F.col("pv").cast("double") * F.col("m") / F.col("i")).alias("term"),
    )
    adj = (
        rk.join(F.broadcast(o2), F.col("j") >= F.col("i"))
        .groupBy("hr", "n", "mean_value", "zs", "m", "pv", "i")
        .agg(F.least(F.min("term"), F.lit(1.0)).alias("pa"))
    )
    return adj.select(
        "hr",
        F.col("n").cast("bigint").alias("n_events"),
        "mean_value",
        F.col("zs").alias("z_stat"),
        F.col("pv").cast("double").alias("p_value"),
        F.col("i").cast("bigint").alias("p_rank"),
        F.round("pa", 6).alias("p_adj"),
        (F.col("pa") <= 0.05).alias("rejected_fdr_5pct"),
    )


# --------------------------------------------------------------------------
def _cohens_d_oracle() -> str:
    return """
WITH q AS (
    SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS source,
           CAST(round(l_quantity, 0) AS DOUBLE) AS x
    FROM lineitem
),
s AS (
    SELECT source, count(*) AS n,
           CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS s1,
           CAST(sum(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6)))
                AS DOUBLE) AS s2
    FROM q GROUP BY source
),
m AS (
    SELECT source, n, s1 / n AS mean,
           (s2 - s1 * s1 / n) / (n - 1) AS var
    FROM s
),
d AS (
    SELECT a.n AS n_a, b.n AS n_b,
           a.mean - b.mean AS diff,
           (a.mean - b.mean)
           / nullif(sqrt(((a.n - 1) * a.var + (b.n - 1) * b.var)
                         / (a.n + b.n - 2)), 0) AS cd
    FROM m a JOIN m b ON a.source = 'A' AND b.source = 'B'
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(diff, 6) AS mean_diff,
       round(cd, 6) AS cohens_d,
       round(cd * (1 - 3.0 / (4 * (n_a + n_b) - 9)), 6) AS hedges_g,
       round(cd - 1.96 * sqrt(1.0 / n_a + 1.0 / n_b
                              + cd * cd / (2 * (n_a + n_b - 2))), 6)
           AS ci95_lo,
       round(cd + 1.96 * sqrt(1.0 / n_a + 1.0 / n_b
                              + cd * cd / (2 * (n_a + n_b - 2))), 6)
           AS ci95_hi,
       CASE WHEN abs(cd) < 0.2 THEN 'negligible'
            WHEN abs(cd) < 0.5 THEN 'small'
            WHEN abs(cd) < 0.8 THEN 'medium'
            ELSE 'large' END AS magnitude
FROM d
"""


@query("stats_cohens_d", oracle=_cohens_d_oracle())
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d effect size with Hedges' small-sample correction and
    the 95% CI — the MAGNITUDE read the significance family omits:
    stats_welch_ttest says whether the cohorts differ, this says by
    how many pooled standard deviations (at 100 TB scale everything
    is 'significant'; effect size is what decides if anyone should
    care).  Same md5-free even/odd cohort split as the t-test so the
    two panels read side by side; Cohen's conventional
    negligible/small/medium/large bands label the magnitude.

    Determinism: the same exact DECIMAL power sums as the Welch
    panel; d, Hedges' g = d·(1 − 3/(4N−9)), and the CI assemble in
    fixed-order double arithmetic with IEEE sqrt only and a mirrored
    pooled-variance nullif guard.

    Scale shape: one partial-aggregated pass to the 2-cohort power
    sums, then a 2-row join — the Welch shape."""
    li = _t(spark, sf_dir, "lineitem")
    q = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, "A").otherwise("B").alias("source"),
        F.round("l_quantity", 0).cast("double").alias("x"),
    )
    xd = F.col("x").cast("decimal(18,6)")
    s = q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("s1"),
        F.sum(xd * xd).cast("double").alias("s2"),
    )
    m = s.select(
        "source",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("var"),
    )
    a = m.filter(F.col("source") == "A").select(
        F.col("n").alias("n_a"), F.col("mean").alias("m_a"), F.col("var").alias("v_a")
    )
    b = m.filter(F.col("source") == "B").select(
        F.col("n").alias("n_b"), F.col("mean").alias("m_b"), F.col("var").alias("v_b")
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    diff = F.col("m_a") - F.col("m_b")
    cd = diff / F.nullif(
        F.sqrt(
            ((n_a - 1) * F.col("v_a") + (n_b - 1) * F.col("v_b"))
            / (n_a + n_b - 2)
        ),
        F.lit(0.0),
    )
    # 1/n_a + 1/n_b, never (n_a+n_b)/(n_a*n_b): the bigint product
    # wraps silently past ~3e9 rows per cohort (round-9 review) —
    # the algebraically equal reciprocal form never overflows
    se = F.sqrt(
        1.0 / n_a + 1.0 / n_b + cd * cd / (2 * (n_a + n_b - 2))
    )
    return a.join(F.broadcast(b)).select(
        n_a.cast("bigint").alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
        F.round(diff, 6).alias("mean_diff"),
        F.round(cd, 6).alias("cohens_d"),
        F.round(cd * (1 - 3.0 / (4 * (n_a + n_b) - 9)), 6).alias("hedges_g"),
        F.round(cd - 1.96 * se, 6).alias("ci95_lo"),
        F.round(cd + 1.96 * se, 6).alias("ci95_hi"),
        F.when(F.abs(cd) < 0.2, "negligible")
        .when(F.abs(cd) < 0.5, "small")
        .when(F.abs(cd) < 0.8, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


# --------------------------------------------------------------------------
def _kendall_tau_oracle() -> str:
    return """
WITH panel AS (
    SELECT c.c_nationkey AS nk,
           sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS x,
           count(DISTINCT o.o_custkey) AS y
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
),
pairs AS (
    SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
    FROM panel a JOIN panel b ON a.nk < b.nk
),
cnt AS (
    SELECT count(*) AS n_pairs,
           sum(CASE WHEN (xa - xb) * (ya - yb) > 0 THEN 1 ELSE 0 END)
               AS concordant,
           sum(CASE WHEN (xa - xb) * (ya - yb) < 0 THEN 1 ELSE 0 END)
               AS discordant,
           sum(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS ties_x,
           sum(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS ties_y,
           (SELECT count(*) FROM panel) AS n_groups
    FROM pairs
)
SELECT CAST(n_groups AS BIGINT) AS n_groups,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(concordant AS BIGINT) AS concordant,
       CAST(discordant AS BIGINT) AS discordant,
       CAST(ties_x AS BIGINT) AS ties_x,
       CAST(ties_y AS BIGINT) AS ties_y,
       round(CAST(concordant - discordant AS DOUBLE)
             / nullif(sqrt(CAST(n_pairs - ties_x AS DOUBLE)
                           * CAST(n_pairs - ties_y AS DOUBLE)), 0), 6)
           AS tau_b,
       round(3.0 * (CAST(concordant - discordant AS DOUBLE) / nullif(
                 sqrt(CAST(n_pairs - ties_x AS DOUBLE)
                      * CAST(n_pairs - ties_y AS DOUBLE)), 0))
             * sqrt(CAST(n_groups * (n_groups - 1) AS DOUBLE))
             / sqrt(2.0 * (2 * n_groups + 5)), 6) AS z_stat
FROM cnt
"""


@query("stats_kendall_tau", oracle=_kendall_tau_oracle())
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b rank correlation (round 9) between per-nation
    revenue and per-nation active-customer count — the robust
    monotone-association read beside stats_spearman_corr: τ counts
    concordant vs discordant PAIRS, so one whale nation cannot drag
    the statistic the way it drags Pearson, and the tie-corrected
    τ-b denominator √((n₀−t_x)(n₀−t_y)) stays honest when counts
    collide.  z = 3τ√(n(n−1))/√(2(2n+5)) is the standard normal
    approximation for the no-association null.

    Determinism: x is an exact DECIMAL revenue sum and y an exact
    distinct count, so every pairwise comparison is exact; C, D and
    the tie counts are integers; τ-b and z assemble in fixed-order
    double arithmetic with IEEE sqrt and a mirrored zero-variance
    nullif guard.

    Scale shape: the nation panel is ONE partial-aggregated shuffle
    of the orders⋈customer join (customer side broadcast); the
    pairwise stage is a 25×25 broadcast self-join of the checkpointed
    panel — O(groups²) on a domain-bounded panel, never on rows."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    panel = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("x"),
            F.countDistinct("o_custkey").alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    other = panel.select(
        F.col("nk").alias("nk_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    prod = (F.col("x") - F.col("xb")) * (F.col("y") - F.col("yb"))
    cnt = (
        panel.join(F.broadcast(other), F.col("nk") < F.col("nk_b"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(prod > 0, 1).otherwise(0)).alias("concordant"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).alias("discordant"),
            F.sum(F.when(F.col("x") == F.col("xb"), 1).otherwise(0)).alias(
                "ties_x"
            ),
            F.sum(F.when(F.col("y") == F.col("yb"), 1).otherwise(0)).alias(
                "ties_y"
            ),
        )
    )
    ng = panel.agg(F.count(F.lit(1)).alias("n_groups"))
    j = cnt.join(F.broadcast(ng))
    tau = (F.col("concordant") - F.col("discordant")).cast("double") / F.nullif(
        F.sqrt(
            (F.col("n_pairs") - F.col("ties_x")).cast("double")
            * (F.col("n_pairs") - F.col("ties_y")).cast("double")
        ),
        F.lit(0.0),
    )
    n = F.col("n_groups")
    return j.select(
        n.cast("bigint").alias("n_groups"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("concordant").cast("bigint").alias("concordant"),
        F.col("discordant").cast("bigint").alias("discordant"),
        F.col("ties_x").cast("bigint").alias("ties_x"),
        F.col("ties_y").cast("bigint").alias("ties_y"),
        F.round(tau, 6).alias("tau_b"),
        F.round(
            3.0
            * tau
            * F.sqrt((n * (n - 1)).cast("double"))
            / F.sqrt(2.0 * (2 * n + 5)),
            6,
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------------
def _brown_forsythe_oracle() -> str:
    return f"""
WITH med AS (
    SELECT l_returnflag AS grp, quantile_cont(l_quantity, 0.5) AS med
    FROM lineitem GROUP BY grp
),
z AS (
    SELECT li.l_returnflag AS grp,
           round(abs(li.l_quantity - med.med), 4) AS z
    FROM lineitem li JOIN med ON li.l_returnflag = med.grp
),
g AS (
    SELECT grp, count(*) AS n_j,
           sum(CAST(z AS DECIMAL(20,4))) AS s_j,
           sum(CAST(z AS DECIMAL(20,4)) * z) AS ss_j
    FROM z GROUP BY grp
),
t AS (
    SELECT CAST(sum(n_j) AS DOUBLE) AS n,
           CAST(sum(s_j) AS DOUBLE) AS s,
           CAST(sum(ss_j) AS DOUBLE) AS ss,
           count(*) AS k,
           CAST(sum(CAST(round(CAST(s_j AS DOUBLE) * CAST(s_j AS DOUBLE)
                                / n_j, 4) AS DECIMAL(38,4))) AS DOUBLE)
               AS sum_sq_over_n
    FROM g
),
f AS (
    SELECT k, n,
           ((sum_sq_over_n - s * s / n) / nullif(k - 1, 0))
           / nullif((ss - sum_sq_over_n) / nullif(n - k, 0), 0) AS w_stat
    FROM t
)
SELECT g.grp, CAST(g.n_j AS BIGINT) AS n_j,
       round(CAST(g.s_j AS DOUBLE) / g.n_j, 6) AS mean_abs_dev,
       round(f.w_stat, 6) AS w_stat,
       CAST(f.k - 1 AS BIGINT) AS df1,
       CAST(f.n - f.k AS BIGINT) AS df2,
       f.w_stat > {_kw_crit_sql("(f.k - 1)")} / nullif(f.k - 1, 0)
           AS variances_differ_5pct
FROM g CROSS JOIN f
"""


@query("stats_brown_forsythe", oracle=_brown_forsythe_oracle())
def stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (round 9; Levene's
    test with MEDIAN centers) on the ANOVA panel (l_quantity by
    return flag) — the PRECONDITION check the parametric family
    quietly assumes: one-way ANOVA pools a common within-group
    variance, and when spreads differ its F is anticonservative.
    The statistic is ANOVA's own F applied to z = |x − median_g|
    (median centers make it robust to the heavy tails that break
    mean-centered Levene), so the two panels share machinery and
    read side by side.

    Determinism: group medians via percentile == quantile_cont
    bit-parity (the ev_anomaly_mad probe); z rounds to 4 dp before
    the exact DECIMAL power sums; the F assembly, 4 dp s²/n fold and
    χ²(k−1)/(k−1) significance ladder are byte-shared with
    stats_anova_oneway.

    Scale shape: one partial-aggregated pass to the 3-row median
    panel (broadcast back — the fact table never shuffles), one
    partial-aggregated pass to the 3-row power-sum panel, then
    3-row folds."""
    li = _t(spark, sf_dir, "lineitem")
    med = (
        li.groupBy(F.col("l_returnflag").alias("grp"))
        .agg(F.expr("percentile(l_quantity, 0.5)").alias("med"))
        .localCheckpoint(eager=True)
    )
    z = li.join(
        F.broadcast(med), li.l_returnflag == med.grp
    ).select("grp", F.round(F.abs(F.col("l_quantity") - F.col("med")), 4).alias("z"))
    zd = F.col("z").cast("decimal(20,4)")
    g = (
        z.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_j"),
            F.sum(zd).alias("s_j"),
            F.sum(zd * F.col("z")).alias("ss_j"),
        )
        .localCheckpoint(eager=True)
    )
    t = g.agg(
        F.sum("n_j").cast("double").alias("n"),
        F.sum("s_j").cast("double").alias("s"),
        F.sum("ss_j").cast("double").alias("ss"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.round(
                F.col("s_j").cast("double")
                * F.col("s_j").cast("double")
                / F.col("n_j"),
                4,
            ).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("sum_sq_over_n"),
    )
    w_stat = (
        (F.col("sum_sq_over_n") - F.col("s") * F.col("s") / F.col("n"))
        / F.nullif(F.col("k") - 1, F.lit(0))
    ) / F.nullif(
        (F.col("ss") - F.col("sum_sq_over_n"))
        / F.nullif(F.col("n") - F.col("k"), F.lit(0)),
        F.lit(0.0),
    )
    ft = t.select("k", "n", w_stat.alias("w_stat"))
    crit = F.lit(None).cast("double")
    for d, c in KW_CHI2_CRIT.items():
        crit = F.when(F.col("k") - 1 == d, F.lit(c)).otherwise(crit)
    return g.join(F.broadcast(ft)).select(
        "grp",
        F.col("n_j").cast("bigint").alias("n_j"),
        F.round(F.col("s_j").cast("double") / F.col("n_j"), 6).alias(
            "mean_abs_dev"
        ),
        F.round("w_stat", 6).alias("w_stat"),
        (F.col("k") - 1).cast("bigint").alias("df1"),
        (F.col("n") - F.col("k")).cast("bigint").alias("df2"),
        (F.col("w_stat") > crit / F.nullif(F.col("k") - 1, F.lit(0))).alias(
            "variances_differ_5pct"
        ),
    )


# --------------------------------------------------------------------------
# Daily-revenue diagnostics trio (round 9): Jarque-Bera (are the
# daily totals normal?), Ljung-Box (are they autocorrelated?), and
# the Wald-Wolfowitz runs test (are the up/down moves random?).
# All three read the same (day, revenue) panel: one partial-agged
# shuffle of orders to ~2,500 rows, checkpointed, then panel-sized
# arithmetic — the fact table never feeds a window.
_DAILY_REV_SQL = """
    SELECT date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
               AS day_no,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS rev
    FROM orders GROUP BY 1
"""


def _daily_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).alias("day_no")
        )
        .agg(_dsum(F.col("o_totalprice")).alias("rev"))
        .localCheckpoint(eager=True)
    )


def _jarque_bera_oracle() -> str:
    return f"""
WITH d AS ({_DAILY_REV_SQL}),
m AS (
    SELECT count(*) AS n,
           CAST(sum(CAST(rev AS DECIMAL(24,2))) AS DOUBLE) / count(*)
               AS mean
    FROM d
),
c AS (
    SELECT m.n, m.mean,
           CAST(sum(CAST(round((rev - mean) * (rev - mean), 4)
                         AS DECIMAL(38,4))) AS DOUBLE) / m.n AS m2,
           CAST(sum(CAST(round((rev - mean) * (rev - mean) * (rev - mean),
                               4) AS DECIMAL(38,4))) AS DOUBLE) / m.n AS m3,
           CAST(sum(CAST(round((rev - mean) * (rev - mean) * (rev - mean)
                               * (rev - mean), 4)
                         AS DECIMAL(38,4))) AS DOUBLE) / m.n AS m4
    FROM d, m GROUP BY m.n, m.mean
)
SELECT CAST(n AS BIGINT) AS n_days,
       round(mean, 2) AS mean_rev,
       round(sqrt(m2), 2) AS std_rev,
       round(m3 / nullif(m2 * sqrt(m2), 0), 6) AS skewness,
       round(m4 / nullif(m2 * m2, 0), 6) AS kurtosis,
       round(n / 6.0 * ((m3 / nullif(m2 * sqrt(m2), 0))
                        * (m3 / nullif(m2 * sqrt(m2), 0))
                        + (m4 / nullif(m2 * m2, 0) - 3)
                          * (m4 / nullif(m2 * m2, 0) - 3) / 4), 4)
           AS jb_stat,
       (n / 6.0 * ((m3 / nullif(m2 * sqrt(m2), 0))
                   * (m3 / nullif(m2 * sqrt(m2), 0))
                   + (m4 / nullif(m2 * m2, 0) - 3)
                     * (m4 / nullif(m2 * m2, 0) - 3) / 4)) <= 5.991
           AS normal_5pct
FROM c
"""


@query("stats_jarque_bera", oracle=_jarque_bera_oracle())
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on daily revenue (round 9):
    JB = n/6·(S² + (K−3)²/4) from the panel's skewness and excess
    kurtosis, gated on χ²(2) = 5.991 — the assumption audit for
    every Gaussian-flavored monitor downstream (z-score and EWMA
    anomaly gates, CUSUM's N(0,1) increments, the t-family): if the
    daily totals are skewed or fat-tailed, those thresholds don't
    mean 5%.  First leg of the daily-revenue diagnostics trio
    (normality / autocorrelation / randomness).

    Determinism: the day panel is exact-DECIMAL revenue rounded to
    2 dp; the mean is an exact-DECIMAL ratio; centered d², d³, d⁴
    round to 4 dp then sum as DECIMAL(38,4) (order-free — deviations
    ~10⁸ at a 100 TB sf keep 4 dp inside 38 digits); S, K and JB
    assemble in fixed-order doubles with mirrored zero-variance
    guards.

    Scale shape: one partial-agged shuffle of orders to the
    checkpointed ~2,500-row day panel; the mean and moment passes
    are panel-sized folds with a broadcast 1-row join."""
    d = _daily_rev(spark, sf_dir)
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("rev").cast("decimal(24,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean"),
    )
    dev = F.col("rev") - F.col("mean")
    c = (
        d.join(F.broadcast(m))
        .groupBy("n", "mean")
        .agg(
            (
                F.sum(F.round(dev * dev, 4).cast("decimal(38,4)")).cast(
                    "double"
                )
                / F.col("n")
            ).alias("m2"),
            (
                F.sum(
                    F.round(dev * dev * dev, 4).cast("decimal(38,4)")
                ).cast("double")
                / F.col("n")
            ).alias("m3"),
            (
                F.sum(
                    F.round(dev * dev * dev * dev, 4).cast("decimal(38,4)")
                ).cast("double")
                / F.col("n")
            ).alias("m4"),
        )
    )
    m2, m3, m4 = F.col("m2"), F.col("m3"), F.col("m4")
    skew = m3 / F.nullif(m2 * F.sqrt(m2), F.lit(0.0))
    kurt = m4 / F.nullif(m2 * m2, F.lit(0.0))
    jb = F.col("n") / 6.0 * (skew * skew + (kurt - 3) * (kurt - 3) / 4)
    return c.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round("mean", 2).alias("mean_rev"),
        F.round(F.sqrt(m2), 2).alias("std_rev"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis"),
        F.round(jb, 4).alias("jb_stat"),
        (jb <= 5.991).alias("normal_5pct"),
    )


# --------------------------------------------------------------------------
LB_MAX_LAG = 7
#: chi-square 5% critical value at LB_MAX_LAG dof.
LB_CHI2_CRIT = 14.067


def _ljung_box_oracle() -> str:
    return f"""
WITH d AS ({_DAILY_REV_SQL}),
m AS (
    SELECT count(*) AS n,
           CAST(sum(CAST(rev AS DECIMAL(24,2))) AS DOUBLE) / count(*)
               AS mean
    FROM d
),
den AS (
    SELECT m.n, m.mean,
           CAST(sum(CAST(round((rev - mean) * (rev - mean), 6)
                         AS DECIMAL(38,6))) AS DOUBLE) AS s0
    FROM d, m GROUP BY m.n, m.mean
),
lags AS (SELECT unnest(generate_series(1, {LB_MAX_LAG})) AS lag),
num AS (
    SELECT l.lag,
           count(*) AS n_pairs,
           CAST(sum(CAST(round((a.rev - den.mean) * (b.rev - den.mean), 6)
                         AS DECIMAL(38,6))) AS DOUBLE) AS sk
    FROM lags l
    JOIN d a ON TRUE
    JOIN d b ON b.day_no = a.day_no + l.lag
    CROSS JOIN den
    GROUP BY l.lag
),
r AS (
    SELECT num.lag, num.n_pairs,
           round(num.sk / nullif(den.s0, 0), 9) AS r_k,
           den.n
    FROM num CROSS JOIN den
),
q AS (
    SELECT CAST(sum(CAST(round(r_k * r_k / (n - lag), 12)
                         AS DECIMAL(24,12))) AS DOUBLE)
               * max(n) * (max(n) + 2) AS q_stat
    FROM r
)
SELECT CAST(r.lag AS BIGINT) AS lag,
       CAST(r.n_pairs AS BIGINT) AS n_pairs,
       r.r_k AS acf,
       round(q.q_stat, 4) AS lb_q_stat,
       q.q_stat <= {LB_CHI2_CRIT!r} AS white_noise_5pct
FROM r CROSS JOIN q
"""


@query("stats_ljung_box", oracle=_ljung_box_oracle())
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau autocorrelation test on daily revenue
    (round 9): calendar-lag ACF at lags 1..7 plus
    Q = n(n+2)·Σ r_k²/(n−k), gated on χ²(7) = 14.067 — the
    independence audit of the diagnostics trio (a revenue stream
    with weekly autocorrelation invalidates every iid-based
    control-limit downstream, and lag-7 is where retail seasonality
    shows).  ACF here is the calendar-lag form: products are taken
    over day pairs (t, t+k) where BOTH calendar days exist — gap
    semantics identical on both engines by construction.

    Determinism: the mean and Σ(x−x̄)² come from exact DECIMAL folds;
    every lagged product rounds to 6 dp then DECIMAL-sums
    (order-free); r_k rounds to 9 dp; the Q fold re-rounds each
    r_k²/(n−k) term to 12 dp into DECIMAL before the final double
    assembly.

    Scale shape: the checkpointed day panel self-joins through a
    broadcast (7-row lag spine × panel) — the fact table shuffles
    once to day grain and never again; at 100 TB the panel is still
    just one row per calendar day."""
    d = _daily_rev(spark, sf_dir)
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("rev").cast("decimal(24,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean"),
    )
    dev = F.col("rev") - F.col("mean")
    den = (
        d.join(F.broadcast(m))
        .groupBy("n", "mean")
        .agg(
            F.sum(F.round(dev * dev, 6).cast("decimal(38,6)"))
            .cast("double")
            .alias("s0")
        )
        .localCheckpoint(eager=True)
    )
    lags = spark.range(1, LB_MAX_LAG + 1).select(F.col("id").alias("lag"))
    b = d.select(F.col("day_no").alias("day_b"), F.col("rev").alias("rev_b"))
    num = (
        d.join(F.broadcast(lags))
        .join(b, F.col("day_b") == F.col("day_no") + F.col("lag"))
        .join(F.broadcast(den))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.round(
                    (F.col("rev") - F.col("mean"))
                    * (F.col("rev_b") - F.col("mean")),
                    6,
                ).cast("decimal(38,6)")
            )
            .cast("double")
            .alias("sk"),
        )
    )
    r = (
        num.join(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            F.round(
                F.col("sk") / F.nullif(F.col("s0"), F.lit(0.0)), 9
            ).alias("acf"),
            "n",
        )
        .localCheckpoint(eager=True)
    )
    q = r.agg(
        (
            F.sum(
                F.round(
                    F.col("acf") * F.col("acf") / (F.col("n") - F.col("lag")),
                    12,
                ).cast("decimal(24,12)")
            ).cast("double")
            * F.max("n")
            * (F.max("n") + 2)
        ).alias("q_stat")
    )
    return r.join(F.broadcast(q)).select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        "acf",
        F.round("q_stat", 4).alias("lb_q_stat"),
        (F.col("q_stat") <= LB_CHI2_CRIT).alias("white_noise_5pct"),
    )


# --------------------------------------------------------------------------
def _runs_test_oracle() -> str:
    return f"""
WITH d AS ({_DAILY_REV_SQL}),
y AS (
    SELECT day_no, rev,
           1995 + CAST(floor(day_no / 365.25) AS INTEGER) AS yr
    FROM d
),
med AS (SELECT yr, quantile_cont(rev, 0.5) AS med FROM y GROUP BY yr),
s AS (
    SELECT y.yr, y.day_no,
           CASE WHEN y.rev > med.med THEN 1 ELSE 0 END AS above
    FROM y JOIN med ON y.yr = med.yr
    WHERE y.rev <> med.med
),
flips AS (
    SELECT yr, day_no, above,
           CASE WHEN lag(above) OVER (PARTITION BY yr ORDER BY day_no)
                     IS DISTINCT FROM above THEN 1 ELSE 0 END AS new_run
    FROM s
),
g AS (
    SELECT yr, count(*) AS n,
           sum(above) AS n1,
           count(*) - sum(above) AS n2,
           sum(new_run) AS runs
    FROM flips GROUP BY yr
)
SELECT CAST(yr AS BIGINT) AS yr,
       CAST(n AS BIGINT) AS n_days,
       CAST(n1 AS BIGINT) AS n_above,
       CAST(n2 AS BIGINT) AS n_below,
       CAST(runs AS BIGINT) AS runs,
       round(2.0 * n1 * n2 / n + 1, 6) AS expected_runs,
       round((runs - (2.0 * n1 * n2 / n + 1))
             / nullif(sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                           / (CAST(n AS DOUBLE) * n * (n - 1))), 0), 6)
           AS z_stat,
       abs((runs - (2.0 * n1 * n2 / n + 1))
           / nullif(sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                         / (CAST(n AS DOUBLE) * n * (n - 1))), 0)) > 1.96
           AS nonrandom_5pct
FROM g
"""


@query("stats_runs_test", oracle=_runs_test_oracle())
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per year on daily revenue (round 9):
    dichotomize each year's days around that year's median, count
    maximal runs of above/below, and compare to the exact null
    E[R] = 2n₁n₂/n + 1 with its variance — too FEW runs means
    clustering (regimes, level shifts), too MANY means oscillation
    (negative autocorrelation).  The randomness leg of the
    diagnostics trio: Ljung-Box sees linear autocorrelation; runs
    see any monotone departure, distribution-free.  Per-year
    framing keeps the test window-partitioned AND is the honest
    grain — pooling years would let the trend masquerade as
    clustering.

    Determinism: medians via the percentile ↔ quantile_cont
    bit-parity probe; exactly-median days are excluded on both
    engines (the classical treatment); run counting is integer lag
    comparison; E[R], Var[R] and z assemble in fixed-order doubles
    with a mirrored degenerate guard (a year entirely on one side
    NULLs its z).

    Scale shape: one partial-agged shuffle of orders to the day
    panel; the lag window partitions by YEAR (bounded rows per
    partition, never partition-less); per-year medians broadcast
    back onto the panel."""
    d = _daily_rev(spark, sf_dir)
    y = d.select(
        "day_no",
        "rev",
        (1995 + F.floor(F.col("day_no") / 365.25)).cast("int").alias("yr"),
    )
    med = (
        y.groupBy("yr")
        .agg(F.expr("percentile(rev, 0.5)").alias("med"))
        .localCheckpoint(eager=True)
    )
    s = (
        y.join(F.broadcast(med), "yr")
        .filter(F.col("rev") != F.col("med"))
        .select(
            "yr",
            "day_no",
            F.when(F.col("rev") > F.col("med"), 1).otherwise(0).alias("above"),
        )
    )
    w = Window.partitionBy("yr").orderBy("day_no")
    flips = s.select(
        "yr",
        "above",
        F.when(
            ~F.lag("above").over(w).eqNullSafe(F.col("above")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    g = flips.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("above").alias("n1"),
        (F.count(F.lit(1)) - F.sum("above")).alias("n2"),
        F.sum("new_run").alias("runs"),
    )
    n, n1, n2 = F.col("n"), F.col("n1"), F.col("n2")
    e_runs = 2.0 * n1 * n2 / n + 1
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (
        n.cast("double") * n * (n - 1)
    )
    z = (F.col("runs") - e_runs) / F.nullif(F.sqrt(var), F.lit(0.0))
    return g.select(
        F.col("yr").cast("bigint").alias("yr"),
        n.cast("bigint").alias("n_days"),
        n1.cast("bigint").alias("n_above"),
        n2.cast("bigint").alias("n_below"),
        F.col("runs").cast("bigint").alias("runs"),
        F.round(e_runs, 6).alias("expected_runs"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > 1.96).alias("nonrandom_5pct"),
    )


# --------------------------------------------------------------------------
def _cramers_v_oracle() -> str:
    return """
WITH obs0 AS (
    SELECT c_mktsegment AS segment, o_orderpriority AS priority,
           count(*) AS observed
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
),
rt AS (SELECT segment, sum(observed) AS row_n FROM obs0 GROUP BY segment),
ct AS (SELECT priority, sum(observed) AS col_n FROM obs0 GROUP BY priority),
tot AS (SELECT sum(observed) AS n FROM obs0),
obs AS (
    SELECT rt.segment, ct.priority, coalesce(o.observed, 0) AS observed
    FROM rt CROSS JOIN ct
    LEFT JOIN obs0 o ON o.segment = rt.segment AND o.priority = ct.priority
),
cell AS (
    SELECT observed,
           CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE)
               AS e
    FROM obs JOIN rt USING (segment) JOIN ct USING (priority) CROSS JOIN tot
),
chi AS (
    SELECT CAST(sum(CAST(round((observed - e) * (observed - e) / e, 6)
                         AS DECIMAL(24,6))) AS DOUBLE) AS chi2
    FROM cell
),
dims AS (
    SELECT (SELECT count(*) FROM rt) AS r,
           (SELECT count(*) FROM ct) AS c,
           (SELECT n FROM tot) AS n
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(r AS BIGINT) AS n_rows_cat,
       CAST(c AS BIGINT) AS n_cols_cat,
       round(chi2, 6) AS chi2,
       round(sqrt(chi2 / nullif(n * least(r - 1, c - 1), 0)), 6) AS cramers_v,
       round(sqrt(greatest(chi2 / n - CAST((r - 1) * (c - 1) AS DOUBLE)
                           / nullif(n - 1, 0), 0)
                  / nullif(least(r - CAST((r - 1) * (r - 1) AS DOUBLE)
                                 / nullif(n - 1, 0),
                                 c - CAST((c - 1) * (c - 1) AS DOUBLE)
                                 / nullif(n - 1, 0)) - 1, 0)), 6)
           AS cramers_v_corrected,
       CASE WHEN sqrt(chi2 / nullif(n * least(r - 1, c - 1), 0)) < 0.1
                 THEN 'negligible'
            WHEN sqrt(chi2 / nullif(n * least(r - 1, c - 1), 0)) < 0.3 THEN 'weak'
            WHEN sqrt(chi2 / nullif(n * least(r - 1, c - 1), 0)) < 0.5
                 THEN 'moderate'
            ELSE 'strong' END AS association
FROM chi CROSS JOIN dims
"""


@query("stats_cramers_v", oracle=_cramers_v_oracle())
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the segment × priority table
    (round 9) — the MAGNITUDE read for stats_chi2_independence,
    exactly as stats_cohens_d is for the t-test: at 100 TB the χ²
    statistic rejects independence for associations no one should
    act on; V = √(χ²/(n·min(r−1,c−1))) ∈ [0,1] says how strong the
    dependence actually is.  Emits both the classical V and the
    Bergsma bias-corrected variant (the correction matters exactly
    in the large-n/weak-effect regime this op exists for), plus the
    conventional strength band.

    Determinism: the χ² fold reuses the independence test's recipe
    byte-for-byte (full marginal grid incl. zero cells, per-cell
    contributions rounded to 6 dp then DECIMAL-summed); V and its
    correction assemble in fixed-order doubles with mirrored
    greatest/nullif guards.

    Scale shape: identical to stats_chi2_independence — one fact
    group-by to the 25-cell panel (checkpointed), then
    marginal/statistic folds over panel-sized broadcasts."""
    cells, rt, ct, tot = _seg_priority_cells(spark, sf_dir)
    e = _cell_expected()
    chi = cells.agg(
        F.sum(
            F.round(
                (F.col("observed") - e) * (F.col("observed") - e) / e, 6
            ).cast("decimal(24,6)")
        )
        .cast("double")
        .alias("chi2")
    )
    r_ = rt.agg(F.count(F.lit(1)).alias("r"))
    c_ = ct.agg(F.count(F.lit(1)).alias("c"))
    j = chi.join(F.broadcast(r_)).join(F.broadcast(c_)).join(F.broadcast(tot))
    n, r, c = (
        F.col("n").cast("double"),
        F.col("r").cast("double"),
        F.col("c").cast("double"),
    )
    # 1x1 contingency table / n = 1 (one-row audit r10): every
    # denominator NULLs on both engines instead of an ANSI raise;
    # the association CASE then falls through to 'strong' identically
    nm1 = F.nullif(n - 1, F.lit(0.0))
    v = F.sqrt(
        F.col("chi2") / F.nullif(n * F.least(r - 1, c - 1), F.lit(0.0))
    )
    phi2c = F.greatest(
        F.col("chi2") / n - (r - 1) * (c - 1) / nm1, F.lit(0.0)
    )
    vc = F.sqrt(
        phi2c
        / F.nullif(
            F.least(
                r - (r - 1) * (r - 1) / nm1, c - (c - 1) * (c - 1) / nm1
            )
            - 1,
            F.lit(0.0),
        )
    )
    return j.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("r").cast("bigint").alias("n_rows_cat"),
        F.col("c").cast("bigint").alias("n_cols_cat"),
        F.round("chi2", 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
        F.round(vc, 6).alias("cramers_v_corrected"),
        F.when(v < 0.1, "negligible")
        .when(v < 0.3, "weak")
        .when(v < 0.5, "moderate")
        .otherwise("strong")
        .alias("association"),
    )


# --------------------------------------------------------------------------
def _pack_efficiency_oracle() -> str:
    return f"""
WITH toks AS (
    SELECT doc_id, lang,
           len(string_split_regex(lower(translate(text, chr(11), chr(9))), '\\s+')) AS n_tokens
    FROM documents
),
cum AS (
    SELECT lang, doc_id, n_tokens,
           sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS c
    FROM toks
),
binned AS (
    SELECT lang, n_tokens, (c - n_tokens) // {PACK_BUDGET} AS bin_id
    FROM cum
),
bins AS (
    SELECT lang, bin_id, count(*) AS n_docs, sum(n_tokens) AS bin_tokens
    FROM binned GROUP BY lang, bin_id
)
SELECT b.lang,
       CAST(count(*) AS BIGINT) AS bins_used,
       CAST(sum(b.n_docs) AS BIGINT) AS n_docs,
       CAST(sum(b.bin_tokens) AS BIGINT) AS total_tokens,
       CAST(ceil(CAST(sum(b.bin_tokens) AS DOUBLE) / {PACK_BUDGET})
            AS BIGINT) AS bin_lower_bound,
       CAST(max(b.bin_tokens) AS BIGINT) AS max_bin_tokens,
       CAST(sum(CASE WHEN b.bin_tokens > {PACK_BUDGET} THEN 1 ELSE 0 END)
            AS BIGINT) AS bins_over_budget,
       round(CAST(sum(b.bin_tokens) AS DOUBLE)
             / (count(*) * {PACK_BUDGET}), 6) AS utilization,
       CAST((SELECT count(*) FROM toks t
             WHERE t.lang = b.lang AND t.n_tokens > {PACK_BUDGET})
            AS BIGINT) AS oversize_docs
FROM bins b GROUP BY b.lang
"""


@query("pack_efficiency_audit", oracle=_pack_efficiency_oracle())
def pack_efficiency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit per language shard (round 9): the
    summary a data-loader team reads before shipping
    pack_context_windows' bins — bins used vs the ceil(Σtokens/B)
    lower bound, utilization of the paid B-token slots, how many
    bins straddle past the budget (the sequential packer lets a doc
    start in the bin its prefix lands in), and how many single docs
    exceed the budget outright (those need truncation or chunking
    BEFORE packing, text_chunk_windows' job).  Uses the exact
    binning pack_context_windows emits, so the audit can never
    disagree with the packer.

    Determinism: token counts, bin ids and every column but
    utilization are exact integers off the same grouped_cumsum; the
    one ratio is a single rounded division.

    Scale shape: the grouped_cumsum shape (range-bucketed local
    cumsums + broadcast shard offsets — no per-lang window
    serialization), then two partial-aggregated rollups (bin grain →
    lang grain) plus a lang-grain oversize count that shares the
    token projection."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.lower(ws_fold(F.col("text"))), r"\s+")).alias("n_tokens"),
    ).localCheckpoint(eager=True)
    cum = grouped_cumsum(
        toks, ["lang"], [("doc_id", "asc")], "n_tokens", "cum_tokens"
    )
    binned = cum.withColumn(
        "bin_id", F.expr(f"(cum_tokens - n_tokens) div {PACK_BUDGET}")
    )
    bins = binned.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )
    osz = toks.filter(F.col("n_tokens") > PACK_BUDGET).groupBy("lang").agg(
        F.count(F.lit(1)).alias("oversize_docs")
    )
    agg = bins.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("bins_used"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("bin_tokens").cast("bigint").alias("total_tokens"),
        F.ceil(
            F.sum("bin_tokens").cast("double") / PACK_BUDGET
        )
        .cast("bigint")
        .alias("bin_lower_bound"),
        F.max("bin_tokens").cast("bigint").alias("max_bin_tokens"),
        F.sum(F.when(F.col("bin_tokens") > PACK_BUDGET, 1).otherwise(0))
        .cast("bigint")
        .alias("bins_over_budget"),
        F.round(
            F.sum("bin_tokens").cast("double")
            / (F.count(F.lit(1)) * PACK_BUDGET),
            6,
        ).alias("utilization"),
    )
    return agg.join(F.broadcast(osz), "lang", "left").select(
        "lang",
        "bins_used",
        "n_docs",
        "total_tokens",
        "bin_lower_bound",
        "max_bin_tokens",
        "bins_over_budget",
        "utilization",
        F.coalesce(F.col("oversize_docs"), F.lit(0))
        .cast("bigint")
        .alias("oversize_docs"),
    )
