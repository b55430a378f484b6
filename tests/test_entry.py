"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs), "oracle keys must be a subset of query keys"


def test_queries_wrapper_repairs_foreign_timezone(spark, sf_dir, oracle_con):
    """The driver supplies its OWN session, which may have captured a
    non-UTC timezone from the host.  The queries() wrapper must pin
    the parity-critical confs (UTC session timezone + NTZ inference
    off) before running, so a timestamp-sensitive key still
    hash-matches the oracle.  This simulates the hostile session
    state, runs through the PUBLIC wrapper, and restores the conf."""
    from duckdb_hdfs_spark.oracle import compare
    from duckdb_hdfs_spark.queries import load_all

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        wrapped = entrymod.queries()["ev_tumbling_counts"]
        qd = load_all()["ev_tumbling_counts"]
        result = compare(
            "ev_tumbling_counts", wrapped(spark, sf_dir), oracle_con, qd.oracle
        )
        assert result.ok, str(result)
        # the wrapper must have repaired the session conf, not just
        # tolerated the foreign value
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
