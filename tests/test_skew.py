"""Skew-mitigation tests (SURVEY.md §4): salted two-stage
aggregation must equal the direct aggregation on a deliberately
degenerate key distribution, and the salting must actually split the
hot key across shards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_hdfs_spark.operators.skew import salted_agg


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one key — the distribution that melts a
    single reducer at scale."""
    n = 20_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    return df.cache()


def test_salted_agg_matches_direct(spark, skewed):
    got = salted_agg(
        skewed,
        keys=["k"],
        aggs=[
            ("n", F.count(F.lit(1)), "sum"),
            ("total", F.sum("v"), "sum"),
            ("mx", F.max("v"), "max"),
            ("mn", F.min("v"), "min"),
        ],
        n_salts=8,
    )
    want = skewed.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("total"),
        F.max("v").alias("mx"),
        F.min("v").alias("mn"),
    )
    # integral-valued doubles: sums are exact, compare directly
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salting_splits_hot_key(spark, skewed):
    """Stage-1 must see the hot key in every salt shard (balanced),
    i.e. no single reducer gets the whole hot key."""
    salted = skewed.withColumn(
        "__salt", (F.monotonically_increasing_id() % 8).cast("int")
    )
    shards = (
        salted.filter(F.col("k") == "HOT")
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(shards) == 8
    counts = [r["count"] for r in shards]
    assert max(counts) < sum(counts) * 0.5, f"hot key unbalanced: {counts}"
