"""Scalar-function surface battery (SURVEY.md §2.10): the reference
exposes DuckDB's whole scalar-function library over HDFS data; these
queries pin the Spark equivalents for each function class to the
DuckDB oracle — string, date/time, conditional, set operations, and
array/list functions.

Engine-alignment notes:
- ``instr``/``strpos`` are 1-based with 0-for-absent in both engines;
- ``add_months`` and ``+ INTERVAL n MONTH`` both clamp to month end;
- day-of-week encodings diverge (Spark ``dayofweek`` 1=Sunday..7 vs
  DuckDB ``extract(dow)`` 0=Sunday..6); ``sql_dayofweek_normalized``
  pins the portable ``dayofweek − 1`` lowering;
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
    # subtract() IS distinct EXCEPT; exceptAll().distinct() only
    # coincided because c_custkey is unique per leg — a duplicated
    # left row also present once on the right would survive the
    # multiset form (round-7 review)
    only_b = building.subtract(rich).select(
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
       -- CASE guards NULL-propagate a NULL embedding exactly like
       -- Spark's aggregate() — list_prepend's seed otherwise survives
       -- alone and the fold yields 0.0 (all-NULL audit, round 10)
       CASE WHEN embedding IS NULL THEN NULL ELSE
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(embedding, x -> CAST(greatest(x, 0) AS DOUBLE))),
             (acc, x) -> acc + x), 6) END AS relu_sum,
       CASE WHEN embedding IS NULL THEN NULL ELSE
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_slice(embedding, 1, 3),
                            x -> CAST(x AS DOUBLE))),
             (acc, x) -> acc + x), 6) END AS head3_sum,
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
       -- DuckDB RAISES on sqrt(negative) where Spark yields NaN
       -- (negative-measures audit, round 10): out-of-domain inputs
       -- (credit lines) NULL identically on both engines
       round(sqrt(CASE WHEN l_extendedprice >= 0
                       THEN l_extendedprice END), 6) AS sqrt_price,
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
        F.round(
            F.sqrt(
                F.when(
                    F.col("l_extendedprice") >= 0, F.col("l_extendedprice")
                )
            ),
            6,
        ).alias("sqrt_price"),
        F.round(F.pow(F.lit(1.0) + F.col("l_discount"), 3), 10).alias("disc_cubed"),
        (F.col("l_orderkey") % 97).alias("key_mod97"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("tax_disc_lo"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_filtered_aggs",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_all,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                  FILTER (WHERE o_totalprice > 1000), 2) AS DOUBLE)
           AS big_total,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderstatus = 'P') AS any_pending
FROM orders
GROUP BY o_orderpriority
""",
)
def sql_filtered_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregate class (round 5): conditional count /
    sum plus bool_and / bool_or — DuckDB's ``agg(...) FILTER
    (WHERE ...)`` surface, which Spark expresses as aggregates over
    CASE-null inputs (nulls are skipped by every SQL aggregate, so
    the semantics coincide).  Decimal discipline on the filtered sum
    keeps it order-independent.  One partial-aggregated shuffle."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.round(
            F.sum(
                F.when(
                    F.col("o_totalprice") > 1000,
                    F.col("o_totalprice").cast("decimal(18,6)"),
                )
            ),
            2,
        )
        .cast("double")
        .alias("big_total"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_bit_funcs",
    oracle="""
SELECT e.event_id,
       e.event_id & 255 AS low_byte,
       e.event_id | 4096 AS with_flag,
       xor(e.event_id, e.user_id) AS key_xor,
       e.user_id << 4 AS shifted_up,
       e.event_id >> 2 AS shifted_down,
       CAST(bit_count(e.event_id) AS BIGINT) AS popcount
FROM events e
""",
)
def sql_bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise-operator class (round 5): AND / OR / XOR / shifts /
    popcount over 64-bit keys — integer-exact on both engines (the
    operators behind hash partitioners, bloom probes, and the
    simhash/Z-order ops elsewhere in the repo).  Map-only."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("event_id & 255").alias("low_byte"),
        F.expr("event_id | 4096").alias("with_flag"),
        F.expr("event_id ^ user_id").alias("key_xor"),
        F.expr("shiftleft(user_id, 4)").alias("shifted_up"),
        F.expr("shiftright(event_id, 2)").alias("shifted_down"),
        F.bit_count("event_id").cast("bigint").alias("popcount"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_pattern_match",
    oracle="""
SELECT p_partkey,
       p_name LIKE '%green%' AS has_green,
       lower(p_type) LIKE 'promo%' AS is_promo_ci,
       regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
       starts_with(p_type, 'PROMO') AS starts_promo,
       CASE WHEN p_name LIKE '%red%' THEN 'red'
            WHEN p_name LIKE '%blue%' THEN 'blue'
            ELSE 'other' END AS color_class,
       contains(p_brand, '#3') AS brand_3x
FROM part
""",
)
def sql_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-matching class (round 5): LIKE, case-insensitive LIKE
    (the ILIKE lowering), regexp boolean match, starts_with /
    contains, and a LIKE-driven CASE ladder — the predicate surface
    q9/q14/q16-style queries push into scans.  Map-only."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").like("%green%").alias("has_green"),
        F.lower(F.col("p_type")).like("promo%").alias("is_promo_ci"),
        F.col("p_name").rlike(r"^[a-z]+ ").alias("starts_word"),
        F.startswith(F.col("p_type"), F.lit("PROMO")).alias("starts_promo"),
        F.when(F.col("p_name").like("%red%"), "red")
        .when(F.col("p_name").like("%blue%"), "blue")
        .otherwise("other")
        .alias("color_class"),
        F.contains(F.col("p_brand"), F.lit("#3")).alias("brand_3x"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_string_agg",
    oracle="""
SELECT c_nationkey,
       count(*) AS n_custs,
       string_agg(c_mktsegment, ',' ORDER BY c_mktsegment, c_custkey)
           AS segments_csv,
       string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
           AS distinct_segments
FROM customer
GROUP BY c_nationkey
""",
)
def sql_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-aggregation class (round 5): ordered ``string_agg`` /
    LISTAGG — Spark lowers it to collect_list → sort → array_join
    (ordering makes the concatenation deterministic; an unordered
    string_agg is engine-arbitrary and can never hash-match).
    Ties sort by the unique c_custkey.  One shuffle; the per-group
    string is bounded by group size — at 100 TB cap it with a
    slice() or switch to a sample."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("c_mktsegment", "c_custkey"))
                ),
                lambda s: s["c_mktsegment"],
            ),
            ",",
        ).alias("segments_csv"),
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), "|").alias(
            "distinct_segments"
        ),
    )


# --------------------------------------------------------------------------
@query(
    "sql_nested_types",
    oracle="""
SELECT o_orderkey,
       {'status': o_orderstatus,
        'price': round(CAST(o_totalprice AS DECIMAL(18,6)), 2)}.status
           AS s_status,
       CAST({'status': o_orderstatus,
             'price': round(CAST(o_totalprice AS DECIMAL(18,6)), 2)}.price
            AS DOUBLE) AS s_price,
       map_extract(MAP {'pri': o_orderpriority, 'st': o_orderstatus},
                   'pri')[1] AS m_priority,
       cardinality(MAP {'pri': o_orderpriority, 'st': o_orderstatus}) AS m_size
FROM orders
""",
)
def sql_nested_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type class (round 5): struct construction + field
    access and map construction + key lookup + cardinality — the
    composite-type surface DuckDB serves (STRUCT/MAP literals) next
    to the ARRAY class covered by sql_array_funcs.  Map-only."""
    o = _t(spark, sf_dir, "orders")
    st = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice").cast("decimal(18,6)"), 2).alias("price"),
    )
    mp = F.create_map(
        F.lit("pri"), F.col("o_orderpriority"), F.lit("st"), F.col("o_orderstatus")
    )
    return o.select(
        "o_orderkey",
        st["status"].alias("s_status"),
        st["price"].cast("double").alias("s_price"),
        F.element_at(mp, "pri").alias("m_priority"),
        F.size(mp).cast("bigint").alias("m_size"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_lateral_join",
    oracle="""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice, t.rk
FROM customer c,
LATERAL (
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           row_number() OVER (ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
    FROM orders o WHERE o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
) t
""",
)
def sql_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL (correlated table) subquery parity (round 5): each
    customer's top-2 orders by price through a per-row dependent
    subquery — the DuckDB/Postgres LATERAL surface.  Spark expresses
    the same dependent top-n as a window over the join key (Catalyst
    decorrelates a literal LATERAL into exactly this shape, so the
    window formulation IS the scalable plan: one shuffle on the key,
    bounded per-key heap, no per-customer re-execution)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    # the LATERAL's driving table is CUSTOMER: an order whose custkey
    # has no customer row must not surface (the window-only shape
    # silently assumed referential integrity — tiny-data audit r9),
    # and a DUPLICATED customer row re-runs the dependent subquery —
    # LATERAL is per-driving-ROW, so its top-2 surfaces once per twin
    # (duplicated-rows audit, round 10: the earlier left_semi deduped
    # the driving side).  INNER join against the key column preserves
    # driving-row multiplicity and is identical to the semi-join on
    # key-unique data; the broadcast still ships only the key column.
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .join(F.broadcast(c), "o_custkey")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "sql_distinct_on",
    oracle="""
SELECT DISTINCT ON (user_id) user_id, event_id, event_type, ts
FROM events
ORDER BY user_id, ts DESC, event_id DESC
""",
)
def sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON parity (round 5): each user's latest event —
    DuckDB/Postgres ``DISTINCT ON (key) ... ORDER BY key, ts DESC``.
    Spark's scalable equivalent is ``max_by`` over a struct ordered
    the same way: ONE hash-aggregate shuffle with map-side partials
    (a row_number window would sort; the aggregate doesn't)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_id", "event_type", "ts"),
                F.struct(F.col("ts"), F.col("event_id")),
            ).alias("r")
        )
        .select("user_id", "r.event_id", "r.event_type", "r.ts")
    )


# --------------------------------------------------------------------------
@query(
    "sql_try_cast",
    oracle="""
SELECT event_id,
       -- json_valid mirrors Spark's NULL-on-malformed get_json_object:
       -- DuckDB's extraction RAISES on a truncated payload
       -- (malformed-JSON audit, round 10)
       TRY_CAST(CASE WHEN json_valid(props)
                     THEN json_extract_string(props, '$.plan') END
                AS INTEGER) AS plan_int,
       TRY_CAST(CASE WHEN json_valid(props)
                     THEN json_extract_string(props, '$.score') END
                AS DOUBLE) AS score_num,
       TRY_CAST(substr(event_type, 1, 1) AS BIGINT) AS bad_int,
       coalesce(TRY_CAST(CASE WHEN json_valid(props)
                              THEN json_extract_string(props, '$.score') END
                         AS DOUBLE), -1.0) AS score_or_default
FROM events
""",
)
def sql_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST parity (round 5): NULL-on-failure casts over
    semi-structured props — the ingestion-hardening surface (a plain
    CAST aborts the whole 100 TB job on one malformed record;
    TRY_CAST quarantines it as NULL for the coalesce default).
    Both engines agree: unparseable → NULL, never an error."""
    ev = _t(spark, sf_dir, "events")
    plan_s = F.get_json_object("props", "$.plan")
    score_s = F.get_json_object("props", "$.score")
    return ev.select(
        "event_id",
        plan_s.try_cast("int").alias("plan_int"),
        score_s.try_cast("double").alias("score_num"),
        F.substring("event_type", 1, 1).try_cast("bigint").alias("bad_int"),
        F.coalesce(score_s.try_cast("double"), F.lit(-1.0)).alias(
            "score_or_default"
        ),
    )


# --------------------------------------------------------------------------
@query(
    "sql_json_funcs",
    oracle="""
SELECT event_id,
       -- json_valid + TRY_CAST mirror Spark's NULL-on-malformed /
       -- NULL-on-type-confusion semantics (malformed-JSON audit,
       -- round 10).  prop_keys contract (round-11 advice): an EMPTY
       -- key set maps to NULL on both sides — DuckDB json_keys
       -- returns [] on '{}' AND on non-objects (array_to_string([])
       -- happens to be NULL, '' only for non-empty keys), while
       -- Spark json_object_keys gives [] on '{}' but NULL on
       -- non-objects; the len()>0 / size()>0 guards collapse both
       -- engines' empty-vs-NULL split to one NULL lane.
       CASE WHEN json_valid(props)
            THEN json_extract_string(props, '$.k') END AS k_str,
       TRY_CAST(CASE WHEN json_valid(props)
                     THEN json_extract(props, '$.k') END
                AS BIGINT) AS k_typed,
       CASE WHEN json_valid(props) AND len(json_keys(props)) > 0
            THEN array_to_string(json_keys(props), ',') END AS prop_keys,
       CAST(json_array_length(concat('[', repeat('0,', user_id % 4), '0]'))
            AS BIGINT) AS arr_len,
       json_extract_string(
           concat('{"u":', user_id, ',"tags":["a","b"]}'), '$.tags[1]')
           AS tag1
FROM events
""",
)
def sql_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar-function class (round 5): path extraction
    (``get_json_object`` ↔ ``json_extract_string``), typed extraction
    via ``from_json`` with an explicit schema (↔ CAST of
    ``json_extract``), key enumeration (``json_object_keys`` ↔
    ``json_keys``), array length, and array-index paths — the
    semi-structured surface DuckDB serves over HDFS JSON/NDJSON files
    and the hot path of every props-bearing event pipeline.

    All map-only JVM expressions (Spark's JSON path functions are
    codegen'd, not UDFs) — embarrassingly parallel at any scale."""
    ev = _t(spark, sf_dir, "events")
    nested = F.concat(
        F.lit('{"u":'), F.col("user_id"), F.lit(',"tags":["a","b"]}')
    )
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k BIGINT")["k"].alias("k_typed"),
        # empty key set → NULL (mirrors the oracle's len()>0 guard;
        # size(NULL)=NULL under non-legacy conf, so malformed and
        # non-object payloads fall through to NULL as before)
        F.when(
            F.size(F.json_object_keys("props")) > 0,
            F.array_join(F.json_object_keys("props"), ","),
        ).alias("prop_keys"),
        F.json_array_length(
            F.concat(
                F.lit("["),
                F.repeat(F.lit("0,"), (F.col("user_id") % 4).cast("int")),
                F.lit("0]"),
            )
        )
        .cast("long")
        .alias("arr_len"),
        F.get_json_object(nested, "$.tags[1]").alias("tag1"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_any_all",
    oracle="""
SELECT s_suppkey, s_name,
       CASE WHEN s_acctbal > ALL (SELECT c_acctbal FROM customer c
                                  WHERE c.c_nationkey = s.s_nationkey)
            THEN 1 ELSE 0 END AS beats_all,
       CASE WHEN s_acctbal > ANY (SELECT c_acctbal FROM customer c
                                  WHERE c.c_nationkey = s.s_nationkey)
            THEN 1 ELSE 0 END AS beats_any
FROM supplier s
""",
)
def sql_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified-comparison parity (``> ALL`` / ``> ANY`` correlated
    subqueries): per supplier, does its balance beat ALL (resp. ANY)
    customer balances in its nation?  Spark SQL has no quantified
    comparisons, so the scalable lowering is the textbook one — ALL ⇔
    compare against the per-key MAX, ANY ⇔ against the per-key MIN —
    with SQL's empty-set semantics preserved explicitly: ALL over an
    empty set is TRUE (left join + NULL max ⇒ pass), ANY over empty
    is FALSE.

    Scale shape: the correlated subquery becomes ONE partial-
    aggregated group-by at nation grain broadcast onto the supplier
    scan — no per-row subquery execution, no shuffle of supplier."""
    sup = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    # n_null tracks NULL elements (round-7 review): SQL's `> ALL` is
    # NULL (→ 0 through the oracle's CASE) when any comparison is
    # NULL-valued and none is FALSE, but max() ignores NULLs — so
    # beating the max NON-NULL balance must not count as beats_all
    # when a NULL balance exists.  `> ANY` is symmetric: a NULL
    # element can never make it TRUE, and min() ignoring NULLs is
    # already correct there.
    bounds = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.max("c_acctbal").alias("mx"),
        F.min("c_acctbal").alias("mn"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count("c_acctbal").alias("n_vals"),
    )
    j = sup.join(
        F.broadcast(bounds), sup.s_nationkey == F.col("nk"), "left"
    )
    no_nulls = F.col("n_rows") == F.col("n_vals")
    return j.select(
        "s_suppkey",
        "s_name",
        # empty set (left-join miss: n_rows NULL) ⇒ ALL is TRUE; a
        # NON-empty all-NULL set has mx NULL but n_rows set ⇒ NULL ⇒ 0
        F.when(
            F.col("n_rows").isNull()
            | (no_nulls & (F.col("s_acctbal") > F.col("mx"))),
            1,
        )
        .otherwise(0)
        .alias("beats_all"),
        F.when(
            F.col("mn").isNotNull() & (F.col("s_acctbal") > F.col("mn")), 1
        )
        .otherwise(0)
        .alias("beats_any"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_hash_funcs",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS h_md5,
       sha256(c_name) AS h_sha256,
       length(md5(c_name)) AS md5_len,
       ascii(c_mktsegment) AS first_code,
       bit_length(c_name) AS name_bits,
       left(md5(c_name), 8) AS md5_prefix,
       right(c_name, 3) AS name_tail
FROM customer
""",
)
def sql_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest/byte-function class: md5 and sha256 hex digests (the
    engine-portable hash surface every dedup/split operator in this
    repo builds on — both engines emit identical lowercase hex),
    ascii code of the leading char, bit_length, left/right slicing.
    Map-only, codegen'd."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.sha2(F.col("c_name"), 256).alias("h_sha256"),
        F.length(F.md5("c_name")).alias("md5_len"),
        F.ascii("c_mktsegment").alias("first_code"),
        F.bit_length("c_name").alias("name_bits"),
        F.substring(F.md5("c_name"), 1, 8).alias("md5_prefix"),
        F.substring(F.col("c_name"), -3, 3).alias("name_tail"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_dayofweek_normalized",
    oracle="""
SELECT CAST(extract(dow FROM o_orderdate) AS INT) AS dow_sun0,
       CASE CAST(extract(dow FROM o_orderdate) AS INT)
            WHEN 0 THEN 'Sun' WHEN 1 THEN 'Mon' WHEN 2 THEN 'Tue'
            WHEN 3 THEN 'Wed' WHEN 4 THEN 'Thu' WHEN 5 THEN 'Fri'
            ELSE 'Sat' END AS dow_name,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS revenue
FROM orders GROUP BY 1, 2
""",
)
def sql_dayofweek_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week parity via explicit normalization — the one
    calendar field whose encodings DIVERGE across engines (Spark
    ``dayofweek`` is 1=Sunday..7; DuckDB ``extract(dow)`` is
    0=Sunday..6).  The module docstring used to declare this class
    deliberately absent; the portable lowering is simply
    ``dayofweek − 1`` on the Spark side, pinned here with a name
    mapping and a revenue rollup so the alignment is value-checked
    across all seven encodings.

    Scale: map-side expression + one 7-group partial aggregate."""
    o = _t(spark, sf_dir, "orders")
    dow = (F.dayofweek("o_orderdate") - 1).cast("int")
    names = {0: "Sun", 1: "Mon", 2: "Tue", 3: "Wed", 4: "Thu", 5: "Fri", 6: "Sat"}
    mapped = None
    for k, v in names.items():
        mapped = (
            F.when(F.col("dow_sun0") == k, v)
            if mapped is None
            else mapped.when(F.col("dow_sun0") == k, v)
        )
    return (
        o.select(dow.alias("dow_sun0"), "o_totalprice")
        .groupBy("dow_sun0")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .withColumn("dow_name", mapped)
        .select("dow_sun0", "dow_name", "n_orders", "revenue")
    )


# --------------------------------------------------------------------------
@query(
    "sql_union_by_name",
    oracle="""
SELECT * FROM (
    SELECT o_orderkey AS k, o_totalprice AS price,
           o_orderpriority AS prio, NULL AS seg
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL BY NAME
    SELECT c_custkey AS k, c_mktsegment AS seg,
           CAST(NULL AS DOUBLE) AS price
    FROM customer WHERE c_custkey % 100 = 0
)
""",
)
def sql_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION BY NAME parity: combining two differently-shaped
    relations by COLUMN NAME with NULL-fill for the missing ones —
    DuckDB's ``UNION ALL BY NAME`` ↔ Spark's
    ``unionByName(allowMissingColumns=True)``.  This is the
    schema-evolution append path (yesterday's files lack today's
    column); positional UNION silently mis-aligns it.

    Scale: two filtered scans concatenated — no shuffle at all."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    left = o.filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("prio"),
    )
    right = c.filter(F.col("c_custkey") % 100 == 0).select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
    )
    return left.unionByName(right, allowMissingColumns=True)


# --------------------------------------------------------------------------
@query(
    "sql_paginated_topn",
    oracle="""
SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 10 OFFSET 10
""",
)
def sql_paginated_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination parity — page 2 (rows 11-20) of a
    fully-deterministic ordering (the tiebreaker is what makes
    pagination coherent: without it, page boundaries shuffle between
    requests).  Spark 3.4+ exposes ``offset()`` natively; combined
    with orderBy+limit it plans as a bounded global top-(offset+limit)
    — no full sort — which is the only pagination shape that survives
    at scale (OFFSET 10⁶ is still a 10⁶+10 heap, not a sort).

    Determinism: strict (balance DESC, custkey) total order on both
    engines; the page cut lands identically."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .offset(10)
        .limit(10)
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("bal"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "sql_variant_type",
    oracle="""
SELECT event_id,
       -- json_valid + TRY_CAST mirror try_parse_json/try_variant_get:
       -- a truncated payload NULLs the variant and a type-confused
       -- one NULLs the typed get (malformed-JSON audit, round 10)
       TRY_CAST(CASE WHEN json_valid(props)
                     THEN json_extract(props, '$.k') END
                AS BIGINT) AS k_typed,
       TRY_CAST(CASE WHEN json_valid(props)
                     THEN json_extract(props, '$.k') END
                AS DOUBLE) AS k_num,
       json_extract_string(
           concat('{"u":', user_id, ',"tags":["a","b"]}'), '$.tags[0]')
           AS tag0,
       -- schema introspection is asserted on the well-formed
       -- generator shape and NULL elsewhere on BOTH engines (NULL or
       -- malformed or reshaped payloads — all-NULL + malformed-JSON
       -- audits, round 10)
       CASE WHEN coalesce(regexp_matches(props, '^\\{"k": [0-9]+\\}$'),
                          false)
            THEN 'OBJECT<k: BIGINT>' END AS v_schema
FROM events
""",
)
def sql_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (Spark 4): ``parse_json`` into a
    binary variant column, typed extraction via ``variant_get`` with
    target-type casts, and ``schema_of_variant`` introspection — the
    open-lakehouse answer to storing JSON without string re-parsing
    per access (the variant encodes once; every downstream
    ``variant_get`` is a binary field lookup, not a parse).  DuckDB
    has no variant type, so the oracle extracts the same values
    through its JSON path functions — equal values prove the variant
    round-trip is lossless for this surface.

    Scale shape: map-only expressions; at 100 TB the win is parsing
    each props string ONCE instead of once per extraction."""
    ev = _t(spark, sf_dir, "events")
    # try_parse_json / try_variant_get: a truncated payload must NULL
    # the variant and a type-confused field must NULL the typed get —
    # never abort the 100 TB job (malformed-JSON audit, round 10)
    v = F.try_parse_json("props")
    nested_v = F.parse_json(
        F.concat(F.lit('{"u":'), F.col("user_id"), F.lit(',"tags":["a","b"]}'))
    )
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_typed"),
        F.try_variant_get(v, "$.k", "double").alias("k_num"),
        F.try_variant_get(nested_v, "$.tags[0]", "string").alias("tag0"),
        # schema introspection asserted on the well-formed generator
        # shape, NULL elsewhere (mirrored in the oracle)
        F.when(
            F.col("props").rlike(r'^\{"k": [0-9]+\}$'),
            F.schema_of_variant(v),
        ).alias("v_schema"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_array_mutation_funcs",
    oracle="""
SELECT event_id,
       array_to_string(list_append(
           [CAST(user_id % 5 AS VARCHAR), CAST(user_id % 3 AS VARCHAR),
            CAST(user_id % 5 AS VARCHAR)], 'z'), ',') AS appended,
       array_to_string(list_prepend('a',
           [CAST(user_id % 5 AS VARCHAR), CAST(user_id % 3 AS VARCHAR)]),
           ',') AS prepended,
       array_to_string(list_filter(
           [CAST(user_id % 5 AS VARCHAR), NULL,
            CAST(user_id % 3 AS VARCHAR)], x -> x IS NOT NULL), ',')
           AS compacted,
       coalesce(array_to_string(list_filter(
           [CAST(user_id % 5 AS VARCHAR), CAST(user_id % 3 AS VARCHAR),
            CAST(user_id % 5 AS VARCHAR)],
           x -> x <> CAST(user_id % 5 AS VARCHAR)), ','), '') AS removed,
       array_to_string(list_sort(list_distinct(
           [CAST(user_id % 5 AS VARCHAR), CAST(user_id % 3 AS VARCHAR),
            CAST(user_id % 5 AS VARCHAR)])), ',') AS distinct_sorted,
       array_to_string(list_reverse(
           [CAST(user_id % 5 AS VARCHAR), CAST(user_id % 3 AS VARCHAR)]),
           ',') AS reversed_arr,
       array_to_string(flatten(
           [[CAST(user_id % 5 AS VARCHAR)], ['x', 'y']]), ',') AS flat
FROM events
""",
)
def sql_array_mutation_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array MUTATION class (the construction/edit half of the list
    surface; sql_array_funcs covers inspection): append, prepend,
    compact (null removal), remove-by-value, distinct (order
    normalized by a sort — DuckDB's list_distinct does not preserve
    first-occurrence order, so raw distinct output can never
    hash-match), reverse, and flatten — all map-only codegen'd
    expressions, outputs joined to scalars for the comparator."""
    ev = _t(spark, sf_dir, "events")
    e1 = (F.col("user_id") % 5).cast("string")
    e2 = (F.col("user_id") % 3).cast("string")
    base3 = F.array(e1, e2, e1)
    base2 = F.array(e1, e2)
    withnull = F.array(e1, F.lit(None).cast("string"), e2)
    return ev.select(
        "event_id",
        F.array_join(F.array_append(base3, F.lit("z")), ",").alias(
            "appended"
        ),
        F.array_join(F.array_prepend(base2, F.lit("a")), ",").alias(
            "prepended"
        ),
        F.array_join(F.array_compact(withnull), ",").alias("compacted"),
        F.coalesce(
            F.array_join(F.array_remove(base3, e1), ","), F.lit("")
        ).alias("removed"),
        F.array_join(
            F.sort_array(F.array_distinct(base3)), ","
        ).alias("distinct_sorted"),
        F.array_join(F.reverse(base2), ",").alias("reversed_arr"),
        F.array_join(
            F.flatten(F.array(F.array(e1), F.array(F.lit("x"), F.lit("y")))),
            ",",
        ).alias("flat"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_map_funcs",
    oracle="""
SELECT event_id,
       map(['k1', 'k2'], [user_id % 5, user_id % 3])['k1'][1] AS v1,
       array_to_string(map_keys(
           map(['k1', 'k2'], [user_id % 5, user_id % 3])), ',') AS keys_s,
       array_to_string(list_transform(map_values(
           map(['k1', 'k2'], [user_id % 5, user_id % 3])),
           x -> CAST(x AS VARCHAR)), ',') AS vals_s,
       CAST(cardinality(map(['k1', 'k2'], [user_id % 5, user_id % 3]))
            AS BIGINT) AS n_entries,
       list_contains(map_keys(
           map(['k1', 'k2'], [user_id % 5, user_id % 3])), 'k1') AS has_k1,
       list_contains(map_keys(
           map(['k1', 'k2'], [user_id % 5, user_id % 3])), 'k9') AS has_k9
FROM events
""",
)
def sql_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-function class: construction, key lookup (scalar), key and
    value enumeration (joined to scalars — entry order is insertion
    order in both engines for literal construction), cardinality, and
    key-membership — the per-row dictionary surface config/props
    pipelines lean on (sql_nested_types pins struct field access;
    this pins the dynamic-key half).

    Scale: map-only codegen'd expressions."""
    ev = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("k1"), F.col("user_id") % 5, F.lit("k2"), F.col("user_id") % 3
    )
    return ev.select(
        "event_id",
        F.element_at(m, "k1").alias("v1"),
        F.array_join(F.map_keys(m), ",").alias("keys_s"),
        F.array_join(
            F.transform(F.map_values(m), lambda x: x.cast("string")), ","
        ).alias("vals_s"),
        F.size(m).cast("long").alias("n_entries"),
        F.map_contains_key(m, "k1").alias("has_k1"),
        F.map_contains_key(m, "k9").alias("has_k9"),
    )


# --------------------------------------------------------------------------
@query(
    "sql_qualify",
    oracle="""
SELECT s_nationkey, s_suppkey, round(s_acctbal, 2) AS acctbal,
       rank() OVER (PARTITION BY s_nationkey
                    ORDER BY s_acctbal DESC, s_suppkey) AS rk,
       round(s_acctbal
             - CAST(sum(CAST(s_acctbal AS DECIMAL(18,6)))
                        OVER (PARTITION BY s_nationkey) AS DOUBLE)
               / count(*) OVER (PARTITION BY s_nationkey), 2)
           AS above_nation_avg
FROM supplier
QUALIFY rk <= 3
""",
)
def sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-clause parity (round 8): filtering on a window
    function without a subquery — DuckDB/Snowflake/BigQuery QUALIFY
    (here: each nation's top-3 suppliers by balance, annotated with
    their distance above the nation mean).  Spark SQL has no QUALIFY
    keyword; the portable lowering is compute-the-windows-then-filter
    — which is exactly the plan QUALIFY compiles to in engines that
    have it, so nothing is lost: one shuffle on the partition key
    computes both windows in a single Window node, the rank filter
    applies after.

    Scale shape: both window functions share one nation-keyed sort
    (Catalyst collapses same-spec windows into one Window operator);
    the rank()<=3 predicate keeps per-key state bounded.  No global
    window, no join — partition keys spread nations across the
    cluster."""
    from pyspark.sql import Window

    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey")
    wo = w.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        s.withColumn("rk", F.rank().over(wo))
        .withColumn(
            "above_nation_avg",
            # decimal window sum, not avg-of-doubles: partition
            # iteration order differs between engines, and a double
            # sum is order-sensitive (repo contract) — the decimal
            # sum is exact, the division assembles in double with one
            # fixed association order
            F.round(
                F.col("s_acctbal")
                - F.sum(F.col("s_acctbal").cast("decimal(18,6)"))
                .over(w)
                .cast("double")
                / F.count(F.lit(1)).over(w),
                2,
            ),
        )
        .filter(F.col("rk") <= 3)
        .select(
            "s_nationkey",
            "s_suppkey",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.col("rk").cast("bigint").alias("rk"),
            "above_nation_avg",
        )
    )


# --------------------------------------------------------------------------
@query(
    "sql_regexp_funcs",
    oracle=r"""
SELECT p_partkey,
       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
       regexp_extract(p_type, '([A-Z]+)\s+([A-Z]+)', 2) AS second_type_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       CAST(length(p_name) - length(regexp_replace(p_name, '[aeiou]', '', 'g'))
            AS BIGINT) AS vowel_count,
       CAST(len(regexp_split_to_array(p_type, '\s+')) AS BIGINT)
           AS type_words,
       regexp_matches(p_brand, '^Brand#[0-9]{2}$') AS std_brand,
       regexp_extract(p_brand, '(\d+)$', 1) AS brand_digits
FROM part
""",
)
def sql_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-expression function class (round 9): capture-group
    extraction (first and Nth group), global replacement,
    occurrence counting via the length-difference identity (portable
    where a native regexp_count is not), regex splitting, anchored
    full-match booleans, and trailing-digit capture — the surface ETL
    string-normalization jobs lean on beyond sql_pattern_match's
    LIKE/boolean layer.  regexp_replace is global-by-default in
    Spark and needs the explicit 'g' flag in DuckDB — this class
    pins that the two lowerings agree.  Map-only; the whole row
    stays inside one WholeStageCodegen span."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_extract(
            F.col("p_type"), r"([A-Z]+)\s+([A-Z]+)", 2
        ).alias("second_type_word"),
        F.regexp_replace(F.col("p_name"), r"[aeiou]", "_").alias("devoweled"),
        (
            F.length("p_name")
            - F.length(F.regexp_replace(F.col("p_name"), r"[aeiou]", ""))
        )
        .cast("bigint")
        .alias("vowel_count"),
        F.size(F.split(F.col("p_type"), r"\s+"))
        .cast("bigint")
        .alias("type_words"),
        F.col("p_brand").rlike(r"^Brand#[0-9]{2}$").alias("std_brand"),
        F.regexp_extract(F.col("p_brand"), r"(\d+)$", 1).alias("brand_digits"),
    )


# --------------------------------------------------------------------------
_RECURSIVE_WALK_SQL = """
WITH RECURSIVE ranked AS (
    SELECT n_nationkey, n_regionkey, n_name,
           row_number() OVER (PARTITION BY n_regionkey
                              ORDER BY n_nationkey) AS rk
    FROM nation
),
walk AS (
    SELECT n_regionkey AS region_key, n_nationkey AS nation_key,
           n_name AS nation_name, rk, 1 AS depth,
           n_name AS path
    FROM ranked WHERE rk = 1
    UNION ALL
    SELECT r.n_regionkey, r.n_nationkey, r.n_name, r.rk,
           w.depth + 1, w.path || '>' || r.n_name
    FROM walk w
    JOIN ranked r
      ON r.n_regionkey = w.region_key AND r.rk = w.rk + 1
)
SELECT region_key, nation_key, nation_name, depth, path FROM walk
"""


@query("sql_recursive_cte", oracle=_RECURSIVE_WALK_SQL)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE parity (round 10): the one DuckDB query-surface
    class the registry's oracles lean on constantly (the dedup
    connected-components and survivor-set oracles are recursive CTEs)
    but the Spark side never demonstrated — Spark 4 executes
    recursive CTEs natively (UnionLoop / UnionLoopRef in the physical
    plan), so a reference user's hierarchy-walk queries now port
    verbatim.  The fixture is the canonical bounded-depth walk
    (org-chart / BOM / category-tree class): chain each region's
    nations in key order and recurse from the region root
    accumulating depth and a '>'-joined path.  Both engines run the
    IDENTICAL statement — base case, UNION ALL recursive member
    joining the working set to a ranked dimension, string-path
    accumulation — and must agree row-for-row.

    Scale: recursion depth is the hierarchy depth (≤ nations per
    region here; org charts/BOMs are ~10 levels), NOT data volume —
    each UnionLoop iteration is one join of the frontier against the
    dimension, broadcast-able when the dimension is small.  For
    unbounded-depth graph closure (components over dedup edges) the
    repo deliberately uses O(log n) pointer-jumping instead
    (operators/dedup.py) — recursive CTEs are the small-depth
    hierarchy tool, and this key pins exactly that class."""
    from duckdb_hdfs_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("nation",))
    return spark.sql(_RECURSIVE_WALK_SQL)


# --------------------------------------------------------------------------
@query(
    "sql_epoch_calendar_funcs",
    oracle="""
SELECT event_id,
       (epoch_us(ts) - ((epoch_us(ts) % 1000000 + 1000000) % 1000000))
           // 1000000 AS epoch_s,
       (epoch_us(ts) - ((epoch_us(ts) % 1000 + 1000) % 1000))
           // 1000 AS epoch_msec,
       make_timestamp(epoch_us(ts)) AS ts_roundtrip,
       CAST(week(ts) AS INT) AS iso_week,
       CAST(dayofyear(ts) AS INT) AS day_of_year,
       strftime(ts, '%Y-%m-%d %H:%M') AS fmt_minute,
       dayname(ts) AS day_name
FROM events
""",
)
def sql_epoch_calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-arithmetic / calendar-function class (round 10) — the
    timestamp surface beyond sql_date_funcs' extract/interval layer:
    epoch seconds and milliseconds as explicit FLOOR division of the
    integer epoch-microsecond value on BOTH engines (round 12, found
    by the ts-extremes audit's negative-epoch instant −1 µs: the
    engines' native conversions disagree in BOTH directions there —
    Spark ``unix_timestamp`` truncates toward zero (0) where DuckDB
    ``CAST(floor(epoch()))`` floors (−1), while Spark
    ``unix_millis`` floors (−1) where DuckDB ``epoch_ms`` truncates
    (0); DuckDB's fractional-DOUBLE ``epoch()`` also loses
    microsecond precision beyond ~2242, and even its integer ``//``
    truncates on BIGINT.  Neither engine has a true integer
    floor-div, so BOTH sides lower it through the pmod identity
    floor(m/d) = (m − pmod(m,d))/d — exact because the numerator is
    divisible), a microsecond epoch→timestamp roundtrip through
    the tz-free constructors (``make_timestamp(us)`` ↔
    ``timestamp_micros``; both sides avoid TIMESTAMPTZ casts whose
    value depends on ambient session zone), ISO week-of-year
    (DuckDB ``week`` IS the ISO week, Spark ``weekofyear``),
    day-of-year, strftime↔date_format dialect parity ('%Y-%m-%d
    %H:%M' ↔ 'yyyy-MM-dd HH:mm'), and English day names (``dayname``
    ↔ 'EEEE').  Map-only, one codegen span; the session pins
    spark.sql.session.timeZone=UTC so naive parquet timestamps read
    identically on both engines."""
    e = _t(spark, sf_dir, "events")

    def floor_div(den: int):
        # exact: m − pmod(m, den) is divisible by den, so integer DIV
        # (truncating) equals floor division here
        return F.expr(
            f"(unix_micros(ts) - pmod(unix_micros(ts), {den})) DIV {den}"
        )

    return e.select(
        "event_id",
        floor_div(1_000_000).alias("epoch_s"),
        floor_div(1_000).alias("epoch_msec"),
        F.timestamp_micros(F.unix_micros("ts")).alias("ts_roundtrip"),
        F.weekofyear("ts").alias("iso_week"),
        F.dayofyear("ts").alias("day_of_year"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("fmt_minute"),
        F.date_format("ts", "EEEE").alias("day_name"),
    )
