"""Per-query DuckDB-oracle parity at sf0.001 — the same gate the
driver runs at sf0.01 (row count + schema + order-insensitive value
compare)."""

from __future__ import annotations

import pytest

from duckdb_hdfs_spark.oracle import compare
from duckdb_hdfs_spark.queries import load_all

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, qd in REGISTRY.items() if qd.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, qd in REGISTRY.items() if qd.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, sf_dir, oracle_con):
    qd = REGISTRY[name]
    result = compare(name, qd.spark(spark, sf_dir), oracle_con, qd.oracle)
    assert result.ok, str(result)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark, sf_dir):
    """Rows-only ops must execute, yield a stable schema, and return
    actual rows — an ANN/dedup op that finds nothing on its own test
    data is broken even if it 'runs'."""
    qd = REGISTRY[name]
    df = qd.spark(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    assert df.count() > 0, f"{name}: returned no rows"
