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
