"""Shared query helpers.

Lives in its own module (no ``@query`` registrations) so that query
modules can import table/sum helpers WITHOUT transitively importing
``tpch`` — registration order in ``REGISTRY`` is load order, and the
driver's CORRECTNESS harness only checks the first 50 entries, so a
stray ``from .tpch import _t`` in an early module silently pushes the
whole LLM-pipeline surface past the cap (this happened in rounds 1-2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_hdfs_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


#: per-row decimal for PLAIN-SUM accumulation (never multiplied):
#: (28,6) survives row values to 10^22 where the earlier (18,6)
#: crashed both engines on a plausible 10^12 metric value
#: (extreme-values audit, round 10); the sum accumulator is
#: DECIMAL(38,6) on both engines — exact to Σ|x| < 10^32.
#: POWER-SUM paths (v·v products) must stay (18,6): the exact product
#: type (37,12) is the widest that fits the 38-digit ceiling, so the
#: |v| < 10^12 domain bound there is arithmetic, not a choice — both
#: engines reject it identically (see SURVEY §5 audit notes).
SUM_DEC = "decimal(28,6)"
SUM_DEC_SQL = "DECIMAL(28,6)"


def _dsum(expr, scale: int = 2):
    """Deterministic money sum: cast the per-row double straight to
    the SUM_DEC decimal — both engines derive the decimal from the
    double's shortest decimal representation, so the rounded value is
    bit-identical (probe-verified incl. .xx5 boundaries) and the cast
    is ~35% cheaper than a round-then-cast-to-DECIMAL(38,6) pipeline.
    Accumulation happens in the DECIMAL(38,6) sum accumulator
    (order-independent; overflow needs Σ|x| > 10^32 per group — far
    beyond a 100 TB group; unlike bigint cents, which overflow at
    Σ|x| ≈ 9·10^12).  Final round stays in the decimal domain, then
    emit double.  Mirrored 1:1 by :func:`_osum` on the oracle side."""
    return F.round(F.sum(expr.cast(SUM_DEC)), scale).cast("double")


def _dsum_raw(expr):
    """Exact decimal sum as double, unrounded (for ratios)."""
    return F.sum(expr.cast(SUM_DEC)).cast("double")


def _osum(expr_sql: str, scale: int = 2) -> str:
    return (
        f"CAST(round(sum(CAST({expr_sql} AS {SUM_DEC_SQL}))"
        f", {scale}) AS DOUBLE)"
    )


def _osum_raw(expr_sql: str) -> str:
    return f"CAST(sum(CAST({expr_sql} AS {SUM_DEC_SQL})) AS DOUBLE)"
