"""Scalar-function surface battery (SURVEY.md §2.10): the reference
exposes DuckDB's whole scalar-function library over HDFS data; these
queries pin the Spark equivalents for each function class to the
DuckDB oracle — string, date/time, conditional, set operations, and
array/list functions.

Engine-alignment notes:
- ``instr``/``strpos`` are 1-based with 0-for-absent in both engines;
- ``add_months`` and ``+ INTERVAL n MONTH`` both clamp to month end;
- day-of-week is deliberately absent (Spark 1=Sunday vs DuckDB
  0=Sunday) — use extract(dow)+arithmetic if ever needed;
- array element floats are rounded before compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _t


# --------------------------------------------------------------------------
@query(
    "sql_string_funcs",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS uname,
       length(c_name) AS name_len,
       substr(c_name, 1, 8) AS prefix,
       replace(c_name, '#', '-') AS dashed,
       reverse(c_mktsegment) AS rseg,
       instr(c_name, '#') AS hash_pos,
       concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_key,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
       regexp_extract(c_name, '([0-9]+)', 1) AS name_digits
FROM customer
""",
)
def sql_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function class: case, length, substring, replace,
    reverse, find, concat, pad, regexp group extraction."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.reverse("c_mktsegment").alias("rseg"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_key"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(extract(year FROM o_orderdate) AS INT) AS oyear,
       CAST(extract(month FROM o_orderdate) AS INT) AS omonth,
       CAST(extract(day FROM o_orderdate) AS INT) AS oday,
       CAST(extract(quarter FROM o_orderdate) AS INT) AS oquarter,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 3 MONTH AS plus3m,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
           AS days_since_95,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
FROM orders
""",
)
def sql_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time-function class: extract fields, truncation, interval
    arithmetic (month-end clamping matches), day difference,
    last_day."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("oyear"),
        F.month("o_orderdate").alias("omonth"),
        F.dayofmonth("o_orderdate").alias("oday"),
        F.quarter("o_orderdate").alias("oquarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus3m"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("bigint").alias("days_since_95"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias(
            "month_end"
        ),
    )


# --------------------------------------------------------------------------
@query(
    "sql_conditional_funcs",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_class,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
       greatest(round(c_acctbal, 2), 0.0) AS floor0,
       least(round(c_acctbal, 2), 1000.0) AS cap1k,
       CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END AS is_null_bal
FROM customer
""",
)
def sql_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional class: CASE ladders, nullif/coalesce,
    greatest/least, IS NULL."""
    c = _t(spark, sf_dir, "customer")
    bal = F.round("c_acctbal", 2)
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_class"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")
        ).alias("seg_or_default"),
        F.greatest(bal, F.lit(0.0)).alias("floor0"),
        F.least(bal, F.lit(1000.0)).alias("cap1k"),
        F.when(F.col("c_acctbal").isNull(), 1).otherwise(0).alias("is_null_bal"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_set_ops",
    oracle="""
SELECT c_custkey, 'both' AS src FROM (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 1000
)
UNION ALL
SELECT c_custkey, 'only_building' AS src FROM (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 1000
)
""",
)
def sql_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation class: INTERSECT / EXCEPT / UNION ALL over
    customer segments (one scan per leg, hash semi/anti under the
    hood)."""
    c = _t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    both = building.intersect(rich).select("c_custkey", F.lit("both").alias("src"))
    only_b = building.exceptAll(rich).distinct().select(
        "c_custkey", F.lit("only_building").alias("src")
    )
    return both.unionByName(only_b)


# --------------------------------------------------------------------------
@query(
    "sql_array_funcs",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 4) AS first_el,
       round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_el,
       round(CAST(list_min(embedding) AS DOUBLE), 4) AS min_el,
       round(CAST(list_sort(embedding)[2] AS DOUBLE), 4) AS second_smallest,
       len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings
""",
)
def sql_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/list-function class: length, index, min/max, sort,
    filter-count — 1-based indexing in both engines."""
    e = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 4).alias("first_el"),
        F.round(F.array_max(emb).cast("double"), 4).alias("max_el"),
        F.round(F.array_min(emb).cast("double"), 4).alias("min_el"),
        F.round(F.element_at(F.sort_array(emb), 2).cast("double"), 4).alias(
            "second_smallest"
        ),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_higher_order_funcs",
    oracle="""
SELECT vec_id,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(embedding, x -> CAST(greatest(x, 0) AS DOUBLE))),
             (acc, x) -> acc + x), 6) AS relu_sum,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_slice(embedding, 1, 3),
                            x -> CAST(x AS DOUBLE))),
             (acc, x) -> acc + x), 6) AS head3_sum,
       len(list_filter(embedding, x -> abs(x) > 2.0)) > 0 AS any_extreme,
       len(list_filter(embedding, x -> NOT (abs(x) < 1e6))) = 0 AS all_finite
FROM embeddings
""",
)
def sql_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function class: transform, filter, aggregate
    (sequential fold), exists, forall over array columns — the lambda
    surface DuckDB expresses as list_transform / list_filter /
    list_reduce.  Folds run left-to-right in double precision on both
    engines (the functions/vectors.py determinism discipline), so
    even the float reductions hash-match."""
    e = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    relu_sum = F.aggregate(
        F.transform(emb, lambda x: F.greatest(x, F.lit(0)).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    head3_sum = F.aggregate(
        F.transform(F.slice(emb, 1, 3), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.round(relu_sum, 6).alias("relu_sum"),
        F.round(head3_sum, 6).alias("head3_sum"),
        F.exists(emb, lambda x: F.abs(x) > 2.0).alias("any_extreme"),
        F.forall(emb, lambda x: F.abs(x) < 1e6).alias("all_finite"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_math_funcs",
    # IEEE-754-exact operations only: abs/sign/floor/ceil/
    # round, sqrt (correctly rounded per IEEE), integer power,
    # modulo, greatest/least — no libm transcendentals (exp/ln/sin
    # differ in the last ulp across libm builds; the repo-wide rule,
    # cf. time_decay_engagement).
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 1000.0) AS abs_diff,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_disc,
       CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS price_bucket,
       CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
       round(sqrt(l_extendedprice), 6) AS sqrt_price,
       round(power(1.0 + l_discount, 3), 10) AS disc_cubed,
       l_orderkey % 97 AS key_mod97,
       greatest(l_quantity, 25.0) AS qty_hi,
       least(l_tax, l_discount) AS tax_disc_lo
FROM lineitem
""",
)
def sql_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric scalar-function class (round 5): abs / sign / floor /
    ceil / round / sqrt / integer power / modulo / greatest /
    least over lineitem measures — the arithmetic surface DuckDB
    serves over HDFS data, pinned per function.  Every op is
    IEEE-exact (sqrt is correctly rounded; power with an integer
    exponent is repeated multiplication on both engines), so results
    hash-match with no tolerance.  Map-only: zero shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_diff"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_disc"),
        F.floor(F.col("l_extendedprice") / 100.0).cast("bigint").alias("price_bucket"),
        F.ceil(F.col("l_quantity") / 7.0).cast("bigint").alias("qty_ceil7"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.pow(F.lit(1.0) + F.col("l_discount"), 3), 10).alias("disc_cubed"),
        (F.col("l_orderkey") % 97).alias("key_mod97"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("tax_disc_lo"),
    )
