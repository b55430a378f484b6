"""Co-located (bucketed) join tests (SURVEY.md §4): writing both
fact tables bucketed on the join key must remove BOTH Exchange nodes
from the join plan — the scale property that turns every downstream
fact-fact join into local work."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_hdfs_spark.sources.bucketing import write_bucketed
from duckdb_hdfs_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        "li_bucketed",
        ["l_orderkey"],
        n_buckets=8,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        "ord_bucketed",
        ["o_orderkey"],
        n_buckets=8,
        sort_cols=["o_orderkey"],
    )
    yield "li_bucketed", "ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_cobucketed_join_is_shuffle_free(spark, bucketed_tables):
    li, ords = bucketed_tables
    # disable broadcast so the join exercises the bucketed SMJ path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(li).join(
            spark.table(ords), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # unbucketed baseline DOES shuffle — proves the assertion bites
        raw_li = spark.table(li).repartition(4)
        baseline = raw_li.join(
            spark.table(ords), F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert "Exchange" in _plan(baseline)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    li, ords = bucketed_tables
    got = (
        spark.table(li)
        .join(spark.table(ords), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
