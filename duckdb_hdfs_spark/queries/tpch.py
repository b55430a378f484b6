"""TPC-H-shaped OLAP battery (SURVEY.md §2.2), adapted to the test
schema (no partsupp / commitdate / receiptdate / shipmode /
shippriority columns — each query keeps the *operator shape* of its
TPC-H namesake on the available columns).

This is the query surface the reference enables by mounting HDFS
into DuckDB (docs/README.md: ``select * from 'hdfs://…'``) — here
expressed DataFrame-first so Catalyst plans it: dimension joins are
broadcast, filters sit directly on the parquet scans (pushdown), and
aggregates are partial (map-side) before the shuffle.

Scale notes per query are in each docstring; global rules:
- ``region``/``nation``/``supplier`` joins use ``F.broadcast`` —
  cardinality is fixed or sub-1e6 even at 100 TB scale.
- fact-fact joins (lineitem⋈orders) shuffle on the join key; AQE
  handles skew.  No query collects to the driver.
- double aggregates are rounded identically on the Spark and oracle
  sides: sums → 2 decimals, averages/ratios → 4 (bit-stable compare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import (
    _dsum,
    _dsum_raw,
    _osum,
    _osum_raw,
    _revenue,
    _t,
)


# --------------------------------------------------------------------------
# Q1 — pricing summary report: full-scan aggregation, 8 aggregates.
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                   AS sum_qty,
       round(sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) / 1000000.0, 2) AS sum_base_price,
       round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) / 1000000.0, 2) AS sum_disc_price,
       round(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) / 1000000.0, 2) AS sum_charge,
       round(avg(l_quantity), 4)                                   AS avg_qty,
       round(sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) / 1000000.0 / count(*), 4) AS avg_price,
       round(sum(CAST(round(l_discount * 1000000) AS BIGINT)) / 1000000.0 / count(*), 4) AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: single scan + one shuffle on a 6-value key.

    Money sums use exact integer micro-units in TWO phases: long
    sums per (keys, spark_partition_id) — map-side COMPLETE, safe
    while partition_rows x max|x|*1e6 < 2^63 (~5e17 for 5M-row
    partitions of 1e5-valued prices, 18x margin) — then a decimal
    merge over the groups x partitions partials (hundreds of rows).
    Integer arithmetic is order-independent, so this equals the
    oracle's flat bigint sum exactly, at ~2.5x less aggregation cost
    than per-row decimal accumulation (the generic _dsum path).  The
    final /1e6 division converts the SAME exact integer to double in
    both engines."""
    li = _t(spark, sf_dir, "lineitem")
    micros = lambda c: F.round(c * F.lit(1000000)).cast("bigint")
    stage1 = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy(
            "l_returnflag", "l_linestatus", F.spark_partition_id().alias("__pid")
        )
        .agg(
            F.sum("l_quantity").alias("p_qty"),
            F.sum(micros(F.col("l_extendedprice"))).alias("p_base"),
            F.sum(micros(_revenue())).alias("p_disc_price"),
            F.sum(micros(_revenue() * (1 + F.col("l_tax")))).alias("p_charge"),
            F.sum(micros(F.col("l_discount"))).alias("p_discount"),
            F.count(F.lit(1)).alias("p_n"),
            # avg(l_quantity) divides by the NON-NULL count (SQL avg
            # semantics) — count(*) would diverge under NULL quantities
            # (NULL-injection audit r9)
            F.count("l_quantity").alias("p_qn"),
        )
    )
    dec = lambda c: F.sum(F.col(c).cast("decimal(38,0)")).cast("double") / 1000000.0
    n = F.sum("p_n")
    return stage1.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("p_qty"), 2).alias("sum_qty"),
        F.round(dec("p_base"), 2).alias("sum_base_price"),
        F.round(dec("p_disc_price"), 2).alias("sum_disc_price"),
        F.round(dec("p_charge"), 2).alias("sum_charge"),
        F.round(F.sum("p_qty") / F.sum("p_qn"), 4).alias("avg_qty"),
        F.round(dec("p_base") / n, 4).alias("avg_price"),
        F.round(dec("p_discount") / n, 4).alias("avg_disc"),
        n.alias("count_order"),
    )


# --------------------------------------------------------------------------
# Q2 shape — groupwise-minimum join (TPC-H Q2's correlated min without
# partsupp): cheapest part per (brand, size).
# --------------------------------------------------------------------------
@query(
    "q2_part_supplier_stats",
    oracle="""
SELECT p.p_brand, p.p_size, p.p_partkey, p.p_name,
       round(p.p_retailprice, 2) AS min_price
FROM part p
JOIN (
    SELECT p_brand, p_size, min(p_retailprice) AS mn
    FROM part GROUP BY p_brand, p_size
) m ON p.p_brand = m.p_brand AND p.p_size = m.p_size
   AND p.p_retailprice = m.mn
""",
)
def q2_part_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groupwise-min via aggregate + self-join (not a window: the agg
    side collapses to O(groups) and broadcasts; a window would
    shuffle the full table)."""
    part = _t(spark, sf_dir, "part")
    mins = part.groupBy(
        F.col("p_brand").alias("m_brand"), F.col("p_size").alias("m_size")
    ).agg(F.min("p_retailprice").alias("mn"))
    return part.join(
        F.broadcast(mins),
        on=[
            part.p_brand == mins.m_brand,
            part.p_size == mins.m_size,
            part.p_retailprice == mins.mn,
        ],
    ).select(
        "p_brand",
        "p_size",
        "p_partkey",
        "p_name",
        F.round("p_retailprice", 2).alias("min_price"),
    )


# --------------------------------------------------------------------------
# Q3 — shipping-priority: 3-way join + date-window filters + top-N.
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-01'
  AND l.l_shipdate  > TIMESTAMP '1997-06-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    headline=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: customer filter prunes before the join; orders⋈lineitem
    shuffles on orderkey.  Top-N is a TakeOrderedAndProject (no
    global sort materialization).  Tie-broken on unique l_orderkey so
    LIMIT is deterministic."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dsum(_revenue()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q4 — order-priority checking: EXISTS semi-join.
# --------------------------------------------------------------------------
@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — Spark keeps it a semi (no fan-out dedup
    needed); the extra non-equi predicate rides on the equi-join."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join with broadcast dims.
# --------------------------------------------------------------------------
@query(
    "q5_local_supplier_volume",
    oracle="""
SELECT n.n_name,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
    headline=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: supplier/nation/region broadcast (≤1e6 rows at any SF);
    only orders⋈lineitem and customer⋈orders shuffle.  The
    c_nationkey = s_nationkey local-supplier condition rides the
    supplier broadcast join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(_revenue()).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change: selective scan, full pushdown.
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    headline=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four predicates push to the parquet scan (verified in
    tests/test_plans.py); the agg is a single partial+final sum —
    zero-shuffle apart from the 1-row final combine."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year.
# --------------------------------------------------------------------------
@query(
    "q7_volume_shipping",
    oracle="""
SELECT supp_nation, cust_nation, l_year, CAST(round(sum(CAST(volume AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair OR predicate evaluated after two broadcast nation
    joins; fact joins shuffle on orderkey/custkey only."""
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = F.col("supp_nation") != F.col("cust_nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum(_revenue()).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8 — market share: conditional-aggregate ratio per year.
# --------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle="""
SELECT o_year,
       round(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 4) AS mkt_share
FROM (
    SELECT year(o.o_orderdate) AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           n2.n_name AS supp_nation
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
) allnations
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-way join; everything except lineitem⋈orders⋈customer is a
    broadcast.  The share is one conditional sum over the joined set."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = _revenue()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
        .groupBy("o_year")
        .agg(
            F.round(
                _dsum_raw(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0)
                )
                / _dsum_raw(F.col("volume")),
                4,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by supplier nation and year.
# --------------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation, o_year, CAST(round(sum(CAST(amount AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
FROM (
    SELECT n.n_name, year(o.o_orderdate) AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS amount
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
) profit
GROUP BY n_name, o_year
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE filter prunes part before its broadcast; one fact-fact
    shuffle (lineitem⋈orders)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _revenue().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_dsum(F.col("amount")).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting: top 20 customers by lost revenue.
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       round(c.c_acctbal, 2) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-N (tiebreak on unique custkey) →
    TakeOrderedAndProject, no global sort."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(_revenue()).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q11 shape — groupwise value vs global-threshold scalar subquery.
# --------------------------------------------------------------------------
@query(
    "q11_supplier_value",
    oracle="""
WITH sup_rev AS (
    SELECT l_suppkey, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS value
    FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, round(value, 2) AS value
FROM sup_rev
WHERE value > (SELECT 1.05 * (CAST(sum(CAST(value AS DECIMAL(28,6)))
                                   AS DOUBLE) / count(*))
               FROM sup_rev)
""",
)
def q11_supplier_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global threshold = second-level scalar aggregate over the
    per-supplier aggregate, attached via a broadcast nested-loop join
    (1 row), NOT a partition-less window: the window form funnels all
    O(suppliers) rows through ONE task (≈1e9 at 100 TB).  The two
    branches share the identical groupBy exchange, so the physical
    plan reuses the shuffle (ReusedExchange) — lineitem is scanned
    and aggregated once."""
    li = _t(spark, sf_dir, "lineitem")
    sup_rev = li.groupBy("l_suppkey").agg(_dsum_raw(_revenue()).alias("value"))
    # the threshold avg sums in DECIMAL (exact, order-independent) on
    # BOTH sides — a raw double avg partial-aggregates in
    # engine/partitioning-dependent order, and a supplier between the
    # two ulp-different thresholds would flip membership (round-7
    # review; the registry's 'round identically on both sides' rule)
    thr = sup_rev.agg(
        (
            (
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1))
            )
            * 1.05
        ).alias("threshold")
    )
    return (
        sup_rev.crossJoin(F.broadcast(thr))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_suppkey", F.round("value", 2).alias("value"))
    )


# --------------------------------------------------------------------------
# Q12 shape — conditional (CASE) aggregation over lateness classes.
# --------------------------------------------------------------------------
@query(
    "q12_priority_lateness",
    oracle="""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
           AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
           AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
""",
)
def q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution: outer join + double group.
# --------------------------------------------------------------------------
@query(
    "q13_cust_order_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '5-LOW'
    GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
)
def q13_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer keeps zero-order customers; count(col) skips the
    null rows it produces.  Second group-by is O(distinct counts)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------
# Q14 — promotion revenue share in a month.
# --------------------------------------------------------------------------
@query(
    "q14_promo_revenue",
    oracle="""
SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(0.0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * _dsum_raw(promo) / _dsum_raw(_revenue()), 4).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# Q15 — top supplier(s): agg view + scalar-max join.
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max computed on the rounded revenue so Spark and the oracle
    agree on ties bit-exactly."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        # explicit NOT NULL so BOTH the revenue branch and the scalar
        # max branch carry it: the downstream supplier equi-join pushes
        # isnotnull(l_suppkey) into only one branch otherwise, breaking
        # canonical equality and with it AQE exchange reuse.
        & F.col("l_suppkey").isNotNull()
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(_revenue()).alias("total_revenue")
    )
    supp = _t(spark, sf_dir, "supplier")
    # scalar max via a 1-row aggregate + broadcast NLJ — the window
    # form (max OVER ()) pushes all O(suppliers) rows through one
    # task; both branches share the groupBy exchange (ReusedExchange)
    # so lineitem is still scanned/aggregated once.
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q16 shape — distinct-supplier counts with NOT-IN exclusion.
# --------------------------------------------------------------------------
@query(
    "q16_brand_type_counts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q16_brand_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-nullable key → left-anti broadcast join.
    count(DISTINCT) expands to a two-phase aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue vs per-part average.
# --------------------------------------------------------------------------
@query(
    "q17_small_qty_revenue",
    oracle="""
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
    SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
    FROM lineitem GROUP BY l_partkey
) pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND l.l_quantity < pa.half_avg
""",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part avg as a window over the broadcast-filtered subset:
    the brand filter keeps every lineitem of the selected parts, so
    the window avg equals the full per-part avg — ONE lineitem scan,
    and the window shuffle moves only the selected-parts slice (a
    separate avg-aggregate branch would scan lineitem again).
    avg(l_quantity) is exact (small-integer sums in double), so the
    window/aggregate accumulation order cannot flip the comparison."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    half_avg = F.avg("l_quantity").over(Window.partitionBy("l_partkey")) * 0.5
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("half_avg", half_avg)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(_dsum_raw(F.col("l_extendedprice")) / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers: HAVING semi-join + top-N.
# --------------------------------------------------------------------------
@query(
    "q18_large_volume_cust",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > 250
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
)
def q18_large_volume_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING subquery's per-order sum IS the output sum — one
    lineitem scan + aggregation serves both the filter and the
    projection (the semi-join + re-aggregate formulation scans and
    aggregates lineitem twice).  sum(l_quantity) is an exact
    integer-valued double, so filter and output agree bit-exactly."""
    li = _t(spark, sf_dir, "lineitem")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        # re-group at the oracle's output grain (duplicated-rows audit,
        # round 10): under PK-duplicated orders the oracle's GROUP BY
        # collapses the twin order rows while its lineitem join fan-out
        # DOUBLES sum_qty — sum(sq) over the joined rows reproduces
        # exactly that (a 1-row group on key-unique data, so the
        # single-lineitem-scan plan and clean-data results are
        # unchanged)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum("sq").alias("sum_qty_raw"))
        # cut the top-100 by the RAW price like the oracle's ORDER BY
        # o.o_totalprice — sorting on the rounded alias could select a
        # different 100-row set when raw prices collide post-rounding
        # at the boundary (round-7 review; latent: generated prices
        # are exactly 2-decimal)
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty_raw", 2).alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# Q19 — disjunctive multi-predicate join (OR-of-ANDs).
# --------------------------------------------------------------------------
@query(
    "q19_disjunctive_preds",
    oracle="""
SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 21)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 40)
""",
)
def q19_disjunctive_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    )
    c2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    )
    c3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(c1 | c2 | c3)
        .agg(_dsum(_revenue()).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q20 shape — double semi-join: suppliers who shipped lots of PROMO.
# --------------------------------------------------------------------------
@query(
    "q20_part_supplier_ship",
    oracle="""
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey
    HAVING sum(l.l_quantity) > 100
)
""",
)
def q20_part_supplier_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    promo_parts = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    ship = (
        li.join(F.broadcast(promo_parts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 100)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supp.join(ship, supp.s_suppkey == ship.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
    )


# --------------------------------------------------------------------------
# Q21 shape — exists + not-exists over co-order lineitems.
# --------------------------------------------------------------------------
@query(
    "q21_waiting_orders",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exists/not-exists pair is rewritten as per-order distinct
    supplier sets computed in ONE window pass over the joined rows
    (collect_set over the orderkey partition) — one lineitem+orders
    scan and one shuffle, where a groupBy-branch + join-back would
    re-execute the join per reference."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast(
            "int"
        ),
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        joined.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late") == 1, F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        blamed.join(F.broadcast(supp), blamed.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q22 shape — anti-join + scalar-subquery filter.
# --------------------------------------------------------------------------
@query(
    "q22_acctbal_opportunity",
    oracle="""
SELECT c_nationkey, count(*) AS numcust, CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(28,6)))
                                 AS DOUBLE) / count(*)
                     FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_nationkey
""",
)
def q22_acctbal_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar threshold = 1-row aggregate over positive balances,
    attached with a broadcast nested-loop join.  The previous window
    form (avg OVER ()) funneled the ENTIRE customer scan — raw fact
    rows, not an aggregate — through one task; the second pruned
    customer scan (c_acctbal only, map-side partial avg) is the
    price of staying parallel, and the better trade at any scale."""
    cust = _t(spark, sf_dir, "customer")
    # decimal-sum threshold avg on both sides — see q11 (round-7
    # review: a raw double avg is order-dependent across engines)
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )
