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

# Registration order matters: the driver's CORRECTNESS harness checks the
# first 50 registry entries only.  Rounds 1-2 led with tpch/windows/events
# (48 already-green keys), starving §2.5-2.10 of driver coverage.  Lead with
# the LLM-pipeline surface and demote the already-proven OLAP modules to
# the tail; the fine-grained window placement is _DRIVER_PRIORITY below.
_QUERY_MODULES = (
    "duckdb_hdfs_spark.queries.dedup",
    "duckdb_hdfs_spark.queries.similarity",
    "duckdb_hdfs_spark.queries.text",
    "duckdb_hdfs_spark.queries.advanced",
    "duckdb_hdfs_spark.queries.sqlfuncs",
    "duckdb_hdfs_spark.queries.multimodal",
    "duckdb_hdfs_spark.queries.fslayer",
    "duckdb_hdfs_spark.queries.streaming_q",
    "duckdb_hdfs_spark.queries.events",
    "duckdb_hdfs_spark.queries.windows",
    "duckdb_hdfs_spark.queries.tpch",
    # round-3 additions — registered past the driver's 50-entry window
    # (this round's window is allocated to §2.5-2.10); pytest-covered
    # now, rotate into the driver window next round.
    "duckdb_hdfs_spark.queries.llmextra",
    "duckdb_hdfs_spark.queries.layout",
    "duckdb_hdfs_spark.queries.cdc",
    "duckdb_hdfs_spark.queries.sketches",
)

# Names forced to the FRONT of the registry (in this order), ahead of
# everything else, so they land inside the driver's 50-entry window.
# Keep this list at ≤50 names: the 47 keys with no CORRECTNESS row in
# rounds 1-2, plus the two repaired this round (ev_value_histogram,
# distinct_users_approx) and one stable sentinel (fs_read_parquet) whose
# continued green-ness guards the fslayer read path.
_DRIVER_PRIORITY = (
    # fixed this round — need fresh driver rows
    "ev_value_histogram",
    "distinct_users_approx",
    # never driver-checked through round 2 (registration cap)
    "streaming_windowed_counts",
    "fs_ls",
    "fs_write_parquet",
    "fs_sql_path",
    "fs_describe_tables",
    # dedup / similarity / text / advanced / sqlfuncs / multimodal keep
    # their module registration order after the pins above
)


def _reorder(reg: dict[str, QueryDef]) -> dict[str, QueryDef]:
    ordered: dict[str, QueryDef] = {}
    for name in _DRIVER_PRIORITY:
        if name in reg:
            ordered[name] = reg[name]
    for name, qd in reg.items():
        if name not in ordered:
            ordered[name] = qd
    return ordered


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
    """Import every query module (idempotent) and return the registry,
    reordered so _DRIVER_PRIORITY names lead (driver 50-entry window)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return _reorder(REGISTRY)
