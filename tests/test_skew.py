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


# --------------------------------------------------------------------------
# connected components (operators.dedup.connected_clusters)
# --------------------------------------------------------------------------
def test_connected_clusters_toy_graph(spark):
    """Chain 1-2-3-4 plus isolated edge 10-11: every node must adopt
    its component's minimum id, across multiple propagation hops."""
    from pyspark.sql import functions as F

    from duckdb_hdfs_spark.operators.dedup import connected_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.node: r.cluster_id for r in connected_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_clusters_consistent_with_pairs(spark, sf_dir):
    """On real LSH pairs: both endpoints of every candidate pair must
    land in the same cluster, and each cluster id is its min member."""
    from pyspark.sql import functions as F

    from duckdb_hdfs_spark.operators.dedup import connected_clusters, minhash_candidate_pairs
    from duckdb_hdfs_spark.sources.catalog import load_table

    pairs = minhash_candidate_pairs(load_table(spark, sf_dir, "documents")).cache()
    labels = connected_clusters(pairs).cache()
    a = labels.withColumnRenamed("node", "doc_a").withColumnRenamed("cluster_id", "ca")
    b = labels.withColumnRenamed("node", "doc_b").withColumnRenamed("cluster_id", "cb")
    split = pairs.join(a, "doc_a").join(b, "doc_b").filter(F.col("ca") != F.col("cb"))
    assert split.count() == 0, "a candidate pair spans two clusters"
    bad_min = (
        labels.groupBy("cluster_id").agg(F.min("node").alias("mn"))
        .filter(F.col("cluster_id") != F.col("mn"))
    )
    assert bad_min.count() == 0, "cluster id is not the min member"


def test_connected_clusters_chain_converges_in_log_rounds(spark):
    """A 64-node chain has diameter 63: plain min-label propagation
    needs ~63 rounds, so converging (to the correct single cluster)
    within max_iters=10 proves the pointer-jumping shortcut halves
    chain depth per round (O(log diameter))."""
    from duckdb_hdfs_spark.operators.dedup import connected_clusters

    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {r.node: r.cluster_id for r in connected_clusters(pairs, max_iters=10).collect()}
    assert got == {i: 0 for i in range(n)}
