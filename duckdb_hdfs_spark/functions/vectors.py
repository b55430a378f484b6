"""Vector column expressions over ``array<float>`` embeddings
(SURVEY.md §2.6) — JVM-side higher-order functions, no UDFs.

Determinism: elements are cast float→double *before* multiplying and
the sum is a sequential left fold (``F.aggregate`` ↔ DuckDB
``list_reduce``), so dot products are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a: str, b: str) -> str:
    # iterate to greatest(len(a), len(b)) so a ragged pair yields NULL
    # (out-of-range element -> NULL product -> NULL sum) EXACTLY like
    # Spark's zip_with null padding — iterating only len(a) returned a
    # finite value when b was longer, silently diverging from the
    # Spark side on malformed embeddings (round-7 review finding).
    # The CASE guard NULL-propagates a NULL ARRAY itself (all-NULL
    # audit, round 10): without it, list_transform over the NULL
    # series collapses and list_prepend's seed survives alone, so a
    # NULL embedding folded to 0.0 on DuckDB while Spark's
    # aggregate(zip_with(NULL, ...)) is NULL.
    return (
        f"CASE WHEN {a} IS NULL OR {b} IS NULL THEN NULL ELSE "
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, greatest(len({a}), len({b}))), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x) END"
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column, b: Column) -> Column:
    """cos(a, b); both norms > 0 assumed (embeddings are non-zero)."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"{dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)})"
