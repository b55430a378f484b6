"""Vector column expressions over ``array<float>`` embeddings
(SURVEY.md §2.6) — JVM-side expressions, no UDFs.

Determinism: elements are cast float→double *before* multiplying and
the sum is a sequential left fold (``F.aggregate`` ↔ DuckDB
``list_reduce``), so dot products are bit-identical across engines.

Round 14 (guide §1.2 per-task work): the higher-order fold
(``aggregate`` over ``zip_with``) is a CodegenFallback expression —
Spark evaluates it INTERPRETED, one lambda dispatch per element,
which made the per-pair cosine the CPU wall of every pair-grain
scorer (dedup_embedding_cos ~4.8 s of fold time at sf0.1;
sim_mutual_knn_graph's 4M pairs likewise).  :func:`dot_expr` emits
the SAME arithmetic as ONE generated SQL string: a size-guarded
UNROLLED sum for the known embedding dims (whole-stage-codegen-able
multiply-adds) with the generic fold as the CASE fallback for every
other shape (ragged, NULL, sliced to an unknown dim).  Bit-exactness
of the unrolled branch: the term order is the fold's left-to-right
order over the identical ``CAST(float→double)`` products, seeded with
the same ``0.0D`` (the leading ``0.0D +`` also pins the fold's
signed-zero behavior when the first product is -0.0), and the guard
fires only when BOTH arrays have exactly the unrolled length — where
``zip_with`` padding can never engage (0 mismatches on a 2,000-pair
random sweep incl. ragged/NULL/±0.0/NaN edges).

POLICY — unroll per-PAIR terms only (measured, round 14): each
unrolled site carries a ~460-node expression tree whose fixed
planning + codegen cost measured ~0.06-0.25 s per site per query at
sf0.1 (interleaved A/B, operators/similarity brute_topk variant
matrix: 20-probe shape fold/fold 0.49 s vs all-expr 0.66 s; 2000-probe
shape fold-norms + expr-dot 0.79 s vs fold/fold 1.61 s).  So the
unrolled form pays for itself exactly where the expression runs once
per CANDIDATE PAIR — the superlinear term that dominates at 100 TB —
and is a net loss on N-LINEAR once-per-row sites (norms, codebook
builds, PQ encode/assignment), which stay on the fold: their
interpreted cost is a bounded constant factor on a lower-order term.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: dims that get an unrolled codegen branch: the corpus embedding dim
#: and the Matryoshka-truncated prefix dim (queries slice to 16).
UNROLL_DIMS = (64, 16)


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision (generic
    Column form — lambda-variable inputs inside higher-order
    functions; hot call sites use :func:`dot_expr` instead)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_fold_sql_spark(a: str, b: str) -> str:
    """Spark-SQL text of the generic sequential fold — the exact tree
    :func:`dot` builds, as a parseable string."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def dot_fold_expr(a: str, b: str) -> Column:
    """The fold dot as ONE ``F.expr`` parse — the identical Catalyst
    tree :func:`dot` assembles Column-by-Column in ~40 py4j driver
    round-trips, in a single round trip (the round-13 lsh_band_keys
    construction collapse, applied to the vector family's N-LINEAR
    sites; per-PAIR sites take :func:`dot_expr`'s unrolled branch
    instead — see the policy note above)."""
    return F.expr(dot_fold_sql_spark(a, b))


def norm_fold_sql(a: str) -> str:
    return f"sqrt({dot_fold_sql_spark(a, a)})"


def norm_fold_expr(a: str) -> Column:
    """:func:`norm` as one parse — see :func:`dot_fold_expr`."""
    return F.expr(norm_fold_sql(a))


def dot_expr(a: str, b: str) -> str:
    """Spark-SQL dot product over two array expressions: unrolled
    (codegen) for the known dims, sequential fold otherwise.  Both
    branches compute the identical left-fold double sum — see the
    module docstring for the bit-exactness argument."""
    branches = []
    for d in UNROLL_DIMS:
        terms = " + ".join(
            f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))"
            for i in range(d)
        )
        branches.append(
            f"WHEN size({a}) = {d} AND size({b}) = {d} THEN 0.0D + {terms}"
        )
    return (
        "CASE " + " ".join(branches) + f" ELSE {dot_fold_sql_spark(a, b)} END"
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
