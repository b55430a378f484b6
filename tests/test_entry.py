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
