"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
for the driver's DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from duckdb_hdfs_spark.queries import load_all

    return load_all()["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from duckdb_hdfs_spark.queries import load_all

    return {name: qd.spark for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; keys
    with no oracle (rows-only ops) are omitted."""
    from duckdb_hdfs_spark.queries import load_all

    return {
        name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None
    }
