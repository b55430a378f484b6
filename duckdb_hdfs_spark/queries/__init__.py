"""Query registry.

Every operator in SURVEY.md §2 registers here as a ``QueryDef``:
a Spark implementation ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a DuckDB oracle SQL string over the pre-registered
views ``region nation customer supplier part orders lineitem events
documents embeddings``.  The driver hash-compares the two at sf0.01;
``tests/`` run the same comparison at sf0.001.

Contract rules (driver compare is column-name-sorted value hash):
- alias every computed column identically on both sides;
- round floating aggregates identically on both sides (sums of
  doubles are order-sensitive; rounding makes them bit-stable);
- hash functions must be engine-portable: md5 hex (both engines
  produce identical lowercase hex) — never engine-native ``hash()``.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    spark: SparkQuery
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}

_QUERY_MODULES = (
    "duckdb_hdfs_spark.queries.tpch",
    "duckdb_hdfs_spark.queries.windows",
    "duckdb_hdfs_spark.queries.events",
    "duckdb_hdfs_spark.queries.fslayer",
    "duckdb_hdfs_spark.queries.dedup",
    "duckdb_hdfs_spark.queries.similarity",
    "duckdb_hdfs_spark.queries.text",
    "duckdb_hdfs_spark.queries.multimodal",
    "duckdb_hdfs_spark.queries.advanced",
    "duckdb_hdfs_spark.queries.sqlfuncs",
    "duckdb_hdfs_spark.queries.streaming_q",
)


def query(
    name: str, oracle: str | None = None, headline: bool = False
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query (+ optional oracle SQL)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(
            name=name, spark=fn, oracle=oracle, headline=headline, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return REGISTRY
