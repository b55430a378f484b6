"""Data-quality audit battery (SURVEY.md §2.13): the checks a
production lake runs before trusting a day's partition — referential
integrity between fact tables, and rule-based value-bound violations
(the dbt-test / Deequ-style pack) — expressed as single-pass
aggregates and broadcast anti-joins so a 100 TB audit costs one scan
per table, not one scan per rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _t


# --------------------------------------------------------------------------
@query(
    "dq_referential_audit",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey FROM lineitem),
o AS (SELECT o_orderkey, o_custkey FROM orders),
c AS (SELECT c_custkey FROM customer)
SELECT 'lineitem_orphan_orderkeys' AS check_name,
       CAST((SELECT count(*) FROM li
             WHERE l_orderkey NOT IN (SELECT o_orderkey FROM o))
            AS BIGINT) AS n_violations
UNION ALL
SELECT 'orders_without_lineitems' AS check_name,
       CAST((SELECT count(*) FROM o
             WHERE o_orderkey NOT IN (SELECT l_orderkey FROM li))
            AS BIGINT) AS n_violations
UNION ALL
SELECT 'orders_orphan_custkeys' AS check_name,
       CAST((SELECT count(*) FROM o
             WHERE o_custkey NOT IN (SELECT c_custkey FROM c))
            AS BIGINT) AS n_violations
UNION ALL
SELECT 'orders_duplicate_keys' AS check_name,
       CAST((SELECT count(*) FROM (
            SELECT o_orderkey FROM o GROUP BY o_orderkey HAVING count(*) > 1))
            AS BIGINT) AS n_violations
""",
)
def dq_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the fact chain: lineitems
    whose order is missing, orders with no lineitems, orders whose
    customer is missing, and duplicated order keys — the four checks
    that catch a partial ingest or a double-loaded partition before
    any query silently inner-joins the evidence away.

    Scale shape: each check is an anti-join (left_anti — hash
    semi-join machinery, broadcast where the key side is small) or a
    keyed group-HAVING, collapsed to a 1-row count; the distinct
    lineitem key set AND the two-column orders projection are each
    computed once and checkpointed for their multiple consumers — the
    whole 4-check audit costs one scan per table."""
    li_keys = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .localCheckpoint(eager=True)
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    orphan_li = (
        li_keys.join(
            o.select("o_orderkey"),
            li_keys.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        ).agg(
            F.lit("lineitem_orphan_orderkeys").alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )
    )
    childless_o = (
        o.join(li_keys, o.o_orderkey == li_keys.l_orderkey, "left_anti").agg(
            F.lit("orders_without_lineitems").alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )
    )
    orphan_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti").agg(
            F.lit("orders_orphan_custkeys").alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )
    )
    dup_keys = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(
            F.lit("orders_duplicate_keys").alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )
    )
    return (
        orphan_li.unionByName(childless_o)
        .unionByName(orphan_cust)
        .unionByName(dup_keys)
    )


# --------------------------------------------------------------------------
@query(
    "dq_rule_violations",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                     THEN 1 ELSE 0 END) AS BIGINT) AS bad_quantity,
       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                     THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
       CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS bad_price,
       CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END)
            AS BIGINT) AS bad_tax,
       CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01'
                       OR l_shipdate > TIMESTAMP '2000-12-31'
                     THEN 1 ELSE 0 END) AS BIGINT) AS bad_shipdate,
       CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                     THEN 1 ELSE 0 END) AS BIGINT) AS bad_returnflag,
       CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                       OR l_discount < 0 OR l_discount > 0.1
                       OR l_extendedprice <= 0
                       OR l_tax < 0 OR l_tax > 0.08
                       OR l_shipdate < TIMESTAMP '1992-01-01'
                       OR l_shipdate > TIMESTAMP '2000-12-31'
                       OR l_returnflag NOT IN ('A', 'N', 'R')
                     THEN 1 ELSE 0 END) AS BIGINT) AS any_violation
FROM lineitem
""",
)
def dq_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based value-bound audit over lineitem (the Deequ/dbt-test
    pack): six domain rules — quantity/discount/price/tax ranges,
    ship-date sanity window, returnflag enum — each counted
    independently PLUS the any-violation rollup, ALL from one scan
    (one conditional sum per rule; adding a rule adds an expression,
    never a pass).  The per-rule counts tell you which constraint
    broke; the rollup is the gate a pipeline blocks on.

    Scale shape: map-side CASE expressions into a single partial-
    aggregated global sum — embarrassingly parallel, no shuffle
    beyond the 1-row combine."""
    li = _t(spark, sf_dir, "lineitem")
    bad_q = (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
    bad_d = (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
    bad_p = F.col("l_extendedprice") <= 0
    bad_t = (F.col("l_tax") < 0) | (F.col("l_tax") > 0.08)
    bad_s = (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp")) | (
        F.col("l_shipdate") > F.lit("2000-12-31").cast("timestamp")
    )
    bad_f = ~F.col("l_returnflag").isin("A", "N", "R")
    any_bad = bad_q | bad_d | bad_p | bad_t | bad_s | bad_f

    def cnt(cond, name):
        return (
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        )

    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        cnt(bad_q, "bad_quantity"),
        cnt(bad_d, "bad_discount"),
        cnt(bad_p, "bad_price"),
        cnt(bad_t, "bad_tax"),
        cnt(bad_s, "bad_shipdate"),
        cnt(bad_f, "bad_returnflag"),
        cnt(any_bad, "any_violation"),
    )


# --------------------------------------------------------------------------
def _psi_oracle() -> str:
    return """
WITH base AS (
    SELECT CASE WHEN o_orderdate < DATE '1995-01-01' THEN 'A' ELSE 'B' END
               AS era,
           CAST(least(CAST(floor(o_totalprice / 20000) AS BIGINT), 9)
                AS VARCHAR) AS b_price,
           o_orderpriority, o_orderstatus
    FROM orders
),
stacked AS (
    SELECT era, 'totalprice_band' AS col_name, b_price AS bin FROM base
    UNION ALL SELECT era, 'orderpriority', o_orderpriority FROM base
    UNION ALL SELECT era, 'orderstatus', o_orderstatus FROM base
),
pb AS (
    SELECT col_name, bin,
           sum(CASE WHEN era = 'A' THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN era = 'B' THEN 1 ELSE 0 END) AS cb
    FROM stacked GROUP BY 1, 2
),
nb AS (SELECT col_name, count(*) AS n_bins FROM pb GROUP BY 1),
tot AS (
    SELECT sum(CASE WHEN era = 'A' THEN 1 ELSE 0 END) AS na,
           sum(CASE WHEN era = 'B' THEN 1 ELSE 0 END) AS nb_
    FROM base
),
terms AS (
    SELECT pb.col_name, nb.n_bins,
           (CAST(ca + 1 AS DOUBLE) / (na + n_bins)
            - CAST(cb + 1 AS DOUBLE) / (nb_ + n_bins))
           * round(ln((CAST(ca + 1 AS DOUBLE) / (na + n_bins))
                      / (CAST(cb + 1 AS DOUBLE) / (nb_ + n_bins))), 9)
               AS term
    FROM pb JOIN nb USING (col_name) CROSS JOIN tot
)
SELECT col_name, CAST(n_bins AS BIGINT) AS n_bins,
       CAST(round(sum(CAST(round(term, 12) AS DECIMAL(24,12))), 6) AS DOUBLE)
           AS psi,
       CAST(sum(CAST(round(term, 12) AS DECIMAL(24,12))) AS DOUBLE) > 0.1
           AS drifted
FROM terms GROUP BY 1, 2
"""


@query("dq_psi_drift", oracle=_psi_oracle())
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift audit between two eras of the
    orders stream (the standard ML-monitoring drift metric: PSI =
    sum over bins of (share_A - share_B) * ln(share_A / share_B),
    alarm at the industry 0.1 threshold) across one numeric banding
    and two categorical columns — the DISTRIBUTION check beside
    dq_referential_audit's integrity and dq_rule_violations' bounds:
    a partition can pass both and still have silently drifted.

    Determinism: bin counts are exact integers; shares are
    Laplace-smoothed ((c+1)/(n+bins) — no ln(0) on a bin one era
    lacks); each bin's term rounds to 12dp then DECIMAL-sums, so the
    fold is order-independent; ln follows the rounded-ln discipline.

    Scale shape: ONE orders scan — the three audited columns stack
    through a map-side explode into a single (column, bin, era)
    partial-aggregated group-by (the dq-battery rule: one scan per
    table, not per rule); era totals are a broadcast 1-row fold off
    the stacked panel's price branch and the per-column bin
    cardinalities a 3-row broadcast."""
    od = _t(spark, sf_dir, "orders")
    era = F.when(
        F.col("o_orderdate") < F.lit("1995-01-01").cast("date"), "A"
    ).otherwise("B")
    b_price = F.least(
        F.floor(F.col("o_totalprice") / 20000).cast("bigint"), F.lit(9)
    ).cast("string")
    stacked = (
        od.select(
            era.alias("era"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("totalprice_band").alias("col_name"),
                        b_price.alias("bin"),
                    ),
                    F.struct(
                        F.lit("orderpriority").alias("col_name"),
                        F.col("o_orderpriority").alias("bin"),
                    ),
                    F.struct(
                        F.lit("orderstatus").alias("col_name"),
                        F.col("o_orderstatus").alias("bin"),
                    ),
                )
            ).alias("cb"),
        )
        .select("era", "cb.col_name", "cb.bin")
    )
    pb = (
        stacked.groupBy("col_name", "bin")
        .agg(
            F.sum(F.when(F.col("era") == "A", 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("era") == "B", 1).otherwise(0)).alias("cb"),
        )
        # the ≤20-row bin panel feeds three consumers (terms, era
        # totals, bin cardinalities): pin ONE evaluation so orders
        # is scanned exactly once
        .localCheckpoint(eager=True)
    )
    # every row emits every column once, so era totals = the bin-count
    # sums of any single column's branch — folded off the
    # materialized panel, never a second orders scan
    tot = pb.filter(F.col("col_name") == "totalprice_band").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb_")
    )
    nb = pb.groupBy("col_name").agg(F.count(F.lit(1)).alias("n_bins"))
    sa = (F.col("ca") + 1).cast("double") / (F.col("na") + F.col("n_bins"))
    sb = (F.col("cb") + 1).cast("double") / (F.col("nb_") + F.col("n_bins"))
    term = (sa - sb) * F.round(F.log(sa / sb), 9)
    terms = (
        pb.join(F.broadcast(nb), "col_name")
        .join(F.broadcast(tot))
        .select("col_name", "n_bins", term.alias("term"))
    )
    # round the DECIMAL sum before the double cast: the 12-dp decimal
    # sum is exact, so a group landing exactly on a 6-dp half boundary
    # would otherwise round by binary-representation luck (the
    # text_dsir_weights round-13 fix, applied to its one sibling site)
    tsum_dec = F.sum(F.round(F.col("term"), 12).cast("decimal(24,12)"))
    return terms.groupBy("col_name", F.col("n_bins").cast("bigint").alias("n_bins")).agg(
        F.round(tsum_dec, 6).cast("double").alias("psi"),
        (tsum_dec.cast("double") > 0.1).alias("drifted"),
    )


# --------------------------------------------------------------------------
def _benford_oracle() -> str:
    return """
WITH d AS (
    -- Benford reads the first SIGNIFICANT digit: abs() strips the
    -- sign (a credit entry's '-' crashed the INT cast on both
    -- engines — negative-measures audit, round 10)
    SELECT CAST(substr(CAST(abs(CAST(o_totalprice AS DECIMAL(18,2)))
                            AS VARCHAR), 1, 1) AS INTEGER) AS digit
    FROM orders
    WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) >= 1e-10
),
obs AS (
    -- the explicit 1..9 filter makes the code match the contract
    -- (round-11 advice): a sub-unit magnitude (0 < |x| < 1) renders
    -- leading digit 0 from the '0.xx' string form, and p_expected's
    -- 1/digit would then divide by zero with ENGINE-SPLIT results
    -- (DuckDB decimal/int -> NULL, Spark double -> Infinity)
    SELECT digit, count(*) AS n_orders FROM d
    WHERE digit BETWEEN 1 AND 9 GROUP BY digit
),
tot AS (SELECT sum(n_orders) AS n_total FROM obs),
p AS (
    SELECT digit, n_orders,
           round(CAST(n_orders AS DOUBLE) / n_total, 9) AS p_observed,
           round(log10(1.0 + 1.0 / digit), 9) AS p_expected
    FROM obs, tot
),
chi AS (
    SELECT sum(CAST(round((p_observed - p_expected) * (p_observed - p_expected)
                          / p_expected, 12) AS DECIMAL(24,12))) AS chi_sum,
           sum(CAST(round(abs(p_observed - p_expected), 12)
                    AS DECIMAL(24,12))) AS mad_sum,
           count(*) AS n_digits
    FROM p
)
SELECT CAST(p.digit AS BIGINT) AS digit,
       CAST(p.n_orders AS BIGINT) AS n_orders,
       p.p_observed, p.p_expected,
       round(p.p_observed - p.p_expected, 9) AS deviation,
       round(CAST(chi.chi_sum AS DOUBLE) * tot.n_total, 6) AS chi2_stat,
       round(CAST(chi.mad_sum AS DOUBLE) / chi.n_digits, 9) AS mad,
       (CAST(chi.chi_sum AS DOUBLE) * tot.n_total <= 15.507)
           AS conforms_5pct
FROM p, chi, tot
"""


@query("dq_benford_digits", oracle=_benford_oracle())
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit over order totals
    (round 9; Nigrini's forensic-accounting screen): natural
    multiplicative amounts follow P(d) = log10(1+1/d), and a
    partition whose leading digits drift from that law signals
    synthetic padding, price floors, or unit mix-ups upstream — the
    distribution-shape complement to dq_rule_violations'
    value-bound checks and dq_psi_drift's era drift.  Emits the
    9-row digit panel with the χ² goodness-of-fit statistic
    (8 dof; 15.507 = 5% critical value) and Nigrini's mean absolute
    deviation.

    Determinism: the leading digit comes from the DECIMAL(18,2)
    string form (identical rendering on both engines — never the
    raw double's shortest-repr), p's are one double division rounded
    to 9 dp, and the χ²/MAD terms are rounded to 12 dp then summed
    as DECIMAL(24,12) so the 9-term accumulation is order-free.

    Scale shape: one partial-aggregated scan to a 9-row panel; the
    χ² fold is a broadcast join of that panel against its own 1-row
    aggregate."""
    o = _t(spark, sf_dir, "orders")
    d = o.filter(
        # sign-stripped first significant digit; zero values have none
        # (negative-measures audit, round 10 — mirrored in the oracle)
        F.col("o_totalprice").isNotNull()
        & (F.abs(F.col("o_totalprice")) >= 1e-10)
    ).select(
        F.substring(
            F.abs(F.col("o_totalprice").cast("decimal(18,2)")).cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    # explicit 1..9 significant-digit filter (round-11 advice): a
    # 0<|x|<1 magnitude renders digit 0 and 1/digit then diverges
    # cross-engine (NULL vs Infinity); mirrored in the oracle
    obs = (
        d.filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    obs = obs.localCheckpoint(eager=True)
    tot = obs.agg(F.sum("n_orders").alias("n_total"))
    p = obs.join(F.broadcast(tot)).select(
        "digit",
        "n_orders",
        F.round(F.col("n_orders").cast("double") / F.col("n_total"), 9).alias(
            "p_observed"
        ),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 9).alias("p_expected"),
        "n_total",
    )
    p = p.localCheckpoint(eager=True)
    dev = F.col("p_observed") - F.col("p_expected")
    chi = p.agg(
        F.sum(
            F.round(dev * dev / F.col("p_expected"), 12).cast("decimal(24,12)")
        ).alias("chi_sum"),
        F.sum(F.round(F.abs(dev), 12).cast("decimal(24,12)")).alias("mad_sum"),
        F.count(F.lit(1)).alias("n_digits"),
    )
    chi2 = F.col("chi_sum").cast("double") * F.col("n_total")
    return p.join(F.broadcast(chi)).select(
        F.col("digit").cast("bigint").alias("digit"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        "p_observed",
        "p_expected",
        F.round(dev, 9).alias("deviation"),
        F.round(chi2, 6).alias("chi2_stat"),
        F.round(F.col("mad_sum").cast("double") / F.col("n_digits"), 9).alias(
            "mad"
        ),
        (chi2 <= 15.507).alias("conforms_5pct"),
    )


# --------------------------------------------------------------------------
def _iqr_oracle() -> str:
    return """
WITH q AS (
    SELECT o_orderpriority AS priority,
           quantile_cont(o_totalprice, 0.25) AS q1,
           quantile_cont(o_totalprice, 0.75) AS q3
    FROM orders GROUP BY 1
),
f AS (
    SELECT priority, q1, q3,
           q1 - 1.5 * (q3 - q1) AS lo_fence,
           q3 + 1.5 * (q3 - q1) AS hi_fence
    FROM q
),
c AS (
    SELECT f.priority, f.q1, f.q3, f.lo_fence, f.hi_fence,
           count(*) AS n_orders,
           sum(CASE WHEN o.o_totalprice < f.lo_fence THEN 1 ELSE 0 END)
               AS n_low,
           sum(CASE WHEN o.o_totalprice > f.hi_fence THEN 1 ELSE 0 END)
               AS n_high
    FROM orders o JOIN f ON o.o_orderpriority = f.priority
    GROUP BY 1, 2, 3, 4, 5
)
SELECT priority, CAST(n_orders AS BIGINT) AS n_orders,
       round(q1, 4) AS q1, round(q3, 4) AS q3,
       round(hi_fence, 4) AS hi_fence,
       CAST(n_low AS BIGINT) AS n_low,
       CAST(n_high AS BIGINT) AS n_high,
       round(CAST(n_low + n_high AS DOUBLE) / n_orders, 6)
           AS outlier_share
FROM c
"""


@query("dq_iqr_outliers", oracle=_iqr_oracle())
def dq_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR-fence outlier audit per order priority (round 9;
    the boxplot rule): values beyond q1−1.5·IQR / q3+1.5·IQR are
    flagged and counted per group — the nonparametric value-shape
    check between dq_rule_violations' FIXED bounds (which must be
    chosen) and ev_anomaly_mad's median/MAD z (which scores rows):
    the fences ADAPT to each group's own spread, so a priority class
    whose price tail suddenly fattens raises its share with no
    threshold to maintain.

    Determinism: quartiles via the percentile ↔ quantile_cont
    bit-parity probe; fences assemble in fixed-order doubles; flag
    comparisons are exact; counts are integers and the share is one
    rounded division.

    Scale shape: two partial-aggregated passes (the quantile pass to
    the 5-row fence panel — broadcast back — then the conditional
    count); the fact table never feeds a window or a shuffle join."""
    o = _t(spark, sf_dir, "orders")
    q = (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
            F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
        )
        .localCheckpoint(eager=True)
    )
    f = q.select(
        "priority",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo_fence"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi_fence"),
    )
    c = (
        o.join(
            F.broadcast(f), o.o_orderpriority == f.priority
        )
        .groupBy("priority", "q1", "q3", "lo_fence", "hi_fence")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("o_totalprice") < F.col("lo_fence"), 1).otherwise(
                    0
                )
            ).alias("n_low"),
            F.sum(
                F.when(F.col("o_totalprice") > F.col("hi_fence"), 1).otherwise(
                    0
                )
            ).alias("n_high"),
        )
    )
    return c.select(
        "priority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round("q1", 4).alias("q1"),
        F.round("q3", 4).alias("q3"),
        F.round("hi_fence", 4).alias("hi_fence"),
        F.col("n_low").cast("bigint").alias("n_low"),
        F.col("n_high").cast("bigint").alias("n_high"),
        F.round(
            (F.col("n_low") + F.col("n_high")).cast("double")
            / F.col("n_orders"),
            6,
        ).alias("outlier_share"),
    )


# --------------------------------------------------------------------------
@query(
    "dq_monotonic_id_audit",
    oracle="""
WITH s AS (
    SELECT count(*) AS n_rows,
           count(DISTINCT o_orderkey) AS n_distinct,
           min(o_orderkey) AS min_id,
           max(o_orderkey) AS max_id
    FROM orders
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(n_rows - n_distinct AS BIGINT) AS n_duplicates,
       CAST(min_id AS BIGINT) AS min_id,
       CAST(max_id AS BIGINT) AS max_id,
       CAST(max_id - min_id + 1 AS BIGINT) AS id_span,
       CAST(max_id - min_id + 1 - n_distinct AS BIGINT) AS n_gaps,
       round(CAST(n_distinct AS DOUBLE) / (max_id - min_id + 1), 6)
           AS density,
       (n_rows = n_distinct) AS ids_unique,
       (max_id - min_id + 1 = n_distinct) AS ids_contiguous
FROM s
""",
)
def dq_monotonic_id_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key health audit on the order key (round 9): row vs
    distinct counts (duplicate detection), min/max span vs distinct
    (gap counting), and the uniqueness/contiguity verdicts — the
    primary-key invariants an ingest pipeline silently breaks under
    at-least-once replay (duplicates) or dropped batches (gaps).
    Beside dq_referential_audit's cross-table checks, this is the
    single-table identity check, and the gap COUNT (not just a
    boolean) sizes how much of a backfill is missing.

    Determinism: every column is exact integer arithmetic off one
    aggregate; the one ratio is a single rounded division.

    Scale shape: ONE partial-aggregated scan — count, distinct-count
    partial aggregation, min/max all ride the same pass; no joins,
    no windows, no sort."""
    o = _t(spark, sf_dir, "orders")
    s = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_distinct"),
        F.min("o_orderkey").alias("min_id"),
        F.max("o_orderkey").alias("max_id"),
    )
    span = F.col("max_id") - F.col("min_id") + 1
    return s.select(
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        (F.col("n_rows") - F.col("n_distinct")).cast("bigint").alias(
            "n_duplicates"
        ),
        F.col("min_id").cast("bigint").alias("min_id"),
        F.col("max_id").cast("bigint").alias("max_id"),
        span.cast("bigint").alias("id_span"),
        (span - F.col("n_distinct")).cast("bigint").alias("n_gaps"),
        F.round(F.col("n_distinct").cast("double") / span, 6).alias("density"),
        (F.col("n_rows") == F.col("n_distinct")).alias("ids_unique"),
        (span == F.col("n_distinct")).alias("ids_contiguous"),
    )


# --------------------------------------------------------------------------
@query(
    "pipeline_ingest_hardening",
    # the oracle mirrors the dirtying (plain key-mod CASEs) and all
    # four rules in SQL over the same tables; every count is exact
    # integer arithmetic, the value checksum is a decimal sum, and the
    # ts checksum is integer-DIV epoch seconds (the clamp limit lands
    # exactly on a second boundary, so a float floor would sit on the
    # knife edge — DIV keeps both engines in integer arithmetic).
    oracle="""
WITH base AS (
    SELECT event_id,
           CASE WHEN event_id % 19 = 0 THEN TIMESTAMP '2240-01-01 00:00:00'
                ELSE ts END AS ts,
           user_id, event_type,
           CASE WHEN event_id % 13 = 0 THEN 'NaN'::DOUBLE
                WHEN event_id % 13 = 5 THEN 'Infinity'::DOUBLE
                ELSE value END AS value,
           props
    FROM events
),
dirty AS (
    SELECT * FROM base
    UNION ALL
    SELECT * FROM base WHERE event_id % 10 = 0
),
dedup AS (SELECT DISTINCT * FROM dirty),
hardened AS (
    SELECT event_id,
           (isnan(value) OR isinf(value)) AS bad_val,
           CASE WHEN isnan(value) OR isinf(value) THEN NULL
                ELSE value END AS value,
           ts > TIMESTAMP '2024-01-31 01:00:00' AS clamped,
           CASE WHEN ts > TIMESTAMP '2024-01-31 01:00:00'
                THEN TIMESTAMP '2024-01-31 01:00:00' ELSE ts END AS ts
    FROM dedup
),
ev_m AS (
    SELECT count(*) AS n_out,
           count(*) FILTER (WHERE event_id % 10 = 0) AS replay_flagged,
           count(*) FILTER (WHERE bad_val) AS finite_flagged,
           count(*) FILTER (WHERE clamped) AS clamp_flagged,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
               AS val_sum,
           CAST(sum(epoch_us(ts) // 1000000) AS DOUBLE) AS ts_sum
    FROM hardened
),
emb1 AS (
    SELECT vec_id,
           CASE WHEN vec_id % 7 = 0 THEN embedding[1:63]
                ELSE embedding END AS embedding0
    FROM embeddings
),
emb2 AS (
    SELECT vec_id,
           CASE WHEN vec_id % 11 = 3
                THEN list_concat(['NaN'::FLOAT], embedding0[2:])
                ELSE embedding0 END AS embedding
    FROM emb1
),
dim_ok AS (SELECT * FROM emb2 WHERE len(embedding) = 64),
nf_ok AS (
    SELECT * FROM dim_ok
    WHERE len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0
)
SELECT 'events_replay_dedupe' AS stage,
       n_out + replay_flagged AS n_in,
       replay_flagged AS n_flagged, n_out,
       id_sum, CAST(NULL AS DOUBLE) AS checksum
FROM ev_m
UNION ALL
SELECT 'events_finite_measures', n_out, finite_flagged, n_out,
       id_sum, val_sum
FROM ev_m
UNION ALL
SELECT 'events_time_clamp', n_out, clamp_flagged, n_out, id_sum, ts_sum
FROM ev_m
UNION ALL
SELECT 'emb_dimension_enforce',
       (SELECT count(*) FROM embeddings),
       (SELECT count(*) FROM embeddings) - (SELECT count(*) FROM dim_ok),
       (SELECT count(*) FROM dim_ok),
       (SELECT CAST(sum(vec_id) AS BIGINT) FROM dim_ok),
       CAST((SELECT sum(len(embedding)) FROM dim_ok) AS DOUBLE)
UNION ALL
SELECT 'emb_nonfinite_quarantine',
       (SELECT count(*) FROM dim_ok),
       (SELECT count(*) FROM dim_ok) - (SELECT count(*) FROM nf_ok),
       (SELECT count(*) FROM nf_ok),
       (SELECT CAST(sum(vec_id) AS BIGINT) FROM nf_ok),
       CAST((SELECT sum(len(embedding)) FROM nf_ok) AS DOUBLE)
""",
)
def pipeline_ingest_hardening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four ingest-time contracts (sources/ingest.py — the rules
    rounds 9-11's adversarial audits measured the need for) composed
    into ONE oracle-checked pass over a deliberately dirtied copy,
    with per-rule quarantine accounting — the production gate a
    100 TB lake runs where data ENTERS, so no downstream operator
    ever re-pays the check.

    The dirtying is deterministic key-mod injection, mirrored in the
    oracle: exact replay twins (at-least-once delivery) for every
    10th event; NaN / +Inf values for the 13-mod classes; a
    far-future 2240 timestamp (parser-garbage class) for every 19th
    event; a 63-dim ragged slice for every 7th embedding and a
    NaN-poisoned component for the 11-mod-3 class.  Rules applied in
    ingest order: replay dedupe (deterministic full-payload max_by
    survivor) -> FINITE_MEASURES (non-finite scalars -> NULL lane) ->
    event-time clamp (fixture-end anchor + 1h slack) on events;
    dimension enforcement -> non-finite vector quarantine on
    embeddings.

    Output: one row per rule with rows-in / rows-flagged / rows-out
    plus identity (id-sum) and content (decimal value sum / integer
    epoch-second sum / dimension sum) checksums, so the driver hash
    pins WHICH rows each rule kept, not just how many.

    Scale shape: every rule is a pure projection/filter; the whole
    events arm is ONE hash-aggregate pass after the dedupe's single
    key shuffle (replay accounting is derived from the survivor set
    itself — survivors of the replayed class count the replays, no
    pre-dedupe scan); the embeddings arm is three aggregates over a
    dimension-sized table.  No windows, no joins, no collects."""
    from duckdb_hdfs_spark.sources.ingest import (
        clamp_event_time,
        dedupe_replays,
        enforce_dimension,
        finite_measures,
        quarantine_nonfinite_vectors,
    )

    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    base = ev.withColumn(
        "ts",
        F.when(
            eid % 19 == 0, F.lit("2240-01-01 00:00:00").cast("timestamp")
        ).otherwise(F.col("ts")),
    ).withColumn(
        "value",
        F.when(eid % 13 == 0, F.lit(float("nan")))
        .when(eid % 13 == 5, F.lit(float("inf")))
        .otherwise(F.col("value")),
    )
    dirty = base.unionAll(base.filter(eid % 10 == 0))
    payload = [c for c in dirty.columns if c != "event_id"]
    surv = dedupe_replays(
        dirty, ["event_id"], order_cols=[F.col(c) for c in payload]
    )
    d = F.col("value").cast("double")
    flagged = surv.withColumn(
        "bad_val", F.isnan(d) | (F.abs(d) == float("inf"))
    )
    fin = finite_measures(flagged, ["value"])
    hardened = clamp_event_time(
        fin, ts_col="ts", slack="1 hour",
        now="2024-01-31 00:00:00", flag_col="clamped",
    )
    one = F.count(F.lit(1))
    # coalesce: a sum over ZERO rows is NULL where the oracle's
    # count FILTER is 0 (zero-row audit) — the counts must stay BIGINT
    flag_sum = lambda c: F.coalesce(  # noqa: E731
        F.sum(F.when(F.col(c), 1).otherwise(0)), F.lit(0)
    ).cast("bigint")
    # the four metric frames are 1-row aggregates consumed by SEVERAL
    # stage rows each; eagerly checkpointing them pins
    # compute-once-read-many (without it, every union branch re-runs
    # the whole upstream pipeline — the plan-reuse-as-result-reuse
    # trap tests/test_plan_shape.py::test_scan_budget exists to catch)
    m_ev = hardened.agg(
        one.alias("n_out"),
        F.coalesce(F.sum(F.when(eid % 10 == 0, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("replay_flagged"),
        flag_sum("bad_val").alias("finite_flagged"),
        flag_sum("clamped").alias("clamp_flagged"),
        F.sum("event_id").alias("id_sum"),
        F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
        .cast("double")
        .alias("val_sum"),
        F.sum(F.expr("unix_micros(ts) DIV 1000000"))
        .cast("double")
        .alias("ts_sum"),
    ).localCheckpoint(eager=True)

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vid = F.col("vec_id")
    emb1 = emb.withColumn(
        "embedding",
        F.when(vid % 7 == 0, F.slice("embedding", 1, 63)).otherwise(
            F.col("embedding")
        ),
    )
    emb2 = emb1.withColumn(
        "embedding",
        F.when(
            vid % 11 == 3,
            F.concat(
                F.array(F.lit(float("nan")).cast("float")),
                F.expr("slice(embedding, 2, size(embedding) - 1)"),
            ),
        ).otherwise(F.col("embedding")),
    )
    dim_ok = enforce_dimension(emb2, "embedding", 64)
    nf_ok = quarantine_nonfinite_vectors(dim_ok, "embedding")
    m_in = emb.agg(one.alias("e_n_in")).localCheckpoint(eager=True)
    m1 = dim_ok.agg(
        one.alias("d_n"),
        F.sum("vec_id").alias("d_ids"),
        F.sum(F.size("embedding")).alias("d_dims"),
    ).localCheckpoint(eager=True)
    m2 = nf_ok.agg(
        one.alias("f_n"),
        F.sum("vec_id").alias("f_ids"),
        F.sum(F.size("embedding")).alias("f_dims"),
    ).localCheckpoint(eager=True)

    nulld = F.lit(None).cast("double")
    s1 = m_ev.select(
        F.lit("events_replay_dedupe").alias("stage"),
        (F.col("n_out") + F.col("replay_flagged")).alias("n_in"),
        F.col("replay_flagged").alias("n_flagged"),
        F.col("n_out"),
        F.col("id_sum"),
        nulld.alias("checksum"),
    )
    s2 = m_ev.select(
        F.lit("events_finite_measures").alias("stage"),
        F.col("n_out").alias("n_in"),
        F.col("finite_flagged").alias("n_flagged"),
        F.col("n_out"),
        F.col("id_sum"),
        F.col("val_sum").alias("checksum"),
    )
    s3 = m_ev.select(
        F.lit("events_time_clamp").alias("stage"),
        F.col("n_out").alias("n_in"),
        F.col("clamp_flagged").alias("n_flagged"),
        F.col("n_out"),
        F.col("id_sum"),
        F.col("ts_sum").alias("checksum"),
    )
    s4 = m_in.crossJoin(m1).select(
        F.lit("emb_dimension_enforce").alias("stage"),
        F.col("e_n_in").alias("n_in"),
        (F.col("e_n_in") - F.col("d_n")).alias("n_flagged"),
        F.col("d_n").alias("n_out"),
        F.col("d_ids").alias("id_sum"),
        F.col("d_dims").cast("double").alias("checksum"),
    )
    s5 = m1.crossJoin(m2).select(
        F.lit("emb_nonfinite_quarantine").alias("stage"),
        F.col("d_n").alias("n_in"),
        (F.col("d_n") - F.col("f_n")).alias("n_flagged"),
        F.col("f_n").alias("n_out"),
        F.col("f_ids").alias("id_sum"),
        F.col("f_dims").cast("double").alias("checksum"),
    )
    return s1.unionAll(s2).unionAll(s3).unionAll(s4).unionAll(s5)
