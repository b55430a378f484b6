"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional file pruning (SURVEY.md §2.11 / §4).

At 100 TB the dominant read cost is files that parquet min/max
statistics CANNOT skip.  Sorting by one column gives perfect pruning
on that column and none on any other; interleaving the bits of k
columns (the Z-order / Morton curve) gives each output file a small
bounding hyper-rectangle in ALL k dimensions, so a predicate on any
of them skips most files.  This is the layout trick behind
Delta/Iceberg ``ZORDER BY`` — here expressed as plain Spark
expressions plus ``repartitionByRange``:

- ``zorder_key``: the Morton key as a JVM-side bit-arithmetic column
  (whole-stage-codegen friendly — no UDF);
- ``zorder_key_sql``: the byte-identical DuckDB mirror of the same
  arithmetic, generated from the same loop, for oracle parity;
- ``cluster_by_zorder``: range-repartition on the key (the range
  partitioner SAMPLES the key distribution, so files stay balanced
  under arbitrary skew) and sort within partitions, ready to write.

The reference engine has no layout control (it reads whatever HDFS
holds); this is part of the beyond-the-reference curation surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of each column.

    Each input is cast to long and masked to ``bits`` bits (callers
    bucket/normalize first if the domain exceeds ``2**bits``); bit i
    of dimension d lands at position ``i*ndims + (ndims-1-d)``, so
    dimension 0 owns the most-significant bit of each group — the
    conventional x-major Morton layout.  Pure shift/and/or
    arithmetic: codegen-inlined, no shuffle, no UDF.

    ``bits * ndims`` must fit the 63 value bits of a signed long —
    otherwise the top interleaved bit lands in the sign bit and the
    range partitioner orders negative keys first, silently scrambling
    the Z-curve (round-7 review finding).
    """
    nd = len(cols)
    if bits * nd > 63:
        raise ValueError(
            f"zorder_key: bits*ndims = {bits}*{nd} exceeds the 63 value "
            "bits of a signed long; lower bits (e.g. 63 // ndims)"
        )
    mask = F.lit((1 << bits) - 1)
    z = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        v = c.cast("long").bitwiseAND(mask)
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(v, i).bitwiseAND(F.lit(1)),
                    i * nd + (nd - 1 - d),
                )
            )
    return z


def zorder_key_sql(exprs: list[str], bits: int = 8) -> str:
    """DuckDB SQL mirror of :func:`zorder_key` — generated from the
    same bit-placement loop so the two engines agree byte-for-byte."""
    nd = len(exprs)
    if bits * nd > 63:
        raise ValueError(
            f"zorder_key_sql: bits*ndims = {bits}*{nd} exceeds the 63 "
            "value bits of a signed long"
        )
    mask = (1 << bits) - 1
    terms = []
    for d, e in enumerate(exprs):
        v = f"(CAST({e} AS BIGINT) & {mask})"
        for i in range(bits):
            terms.append(f"((({v} >> {i}) & 1) << {i * nd + (nd - 1 - d)})")
    return "(" + " | ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame, cols: list[Column], n_files: int, bits: int = 8
) -> DataFrame:
    """Return ``df`` re-laid-out along the Z-curve: range-partitioned
    into ``n_files`` key ranges (sampled split points — balanced even
    when the key space is sparsely/unevenly populated) and sorted
    within each, so a subsequent ``.write`` emits one tight
    hyper-rectangle per file.  Drops the internal key column."""
    keyed = df.withColumn("__zkey", zorder_key(cols, bits))
    return (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )


# --------------------------------------------------------------------------
# Hilbert curve (round 9): same file-pruning motivation as Z-order,
# strictly better adjacency — consecutive curve positions are always
# edge-adjacent cells, so range reads touch fewer seek gaps.  The
# standard 4-state quadrant automaton (derived from the classic
# rotation algorithm and pinned against it exhaustively in
# tests/test_layout.py): at each level the (x-bit, y-bit) quadrant q
# under state s emits base-4 digit HILBERT_DIGIT[s*4+q] and moves to
# HILBERT_NEXT[s*4+q].  The inverse tables decode a curve position
# back to cell coordinates.  Both engines walk the SAME tables, so
# parity is by construction.

HILBERT_DIGIT = (0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0)
HILBERT_NEXT = (1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2)
#: inverse: index = state*4 + digit → (x-bit, y-bit, next state)
HILBERT_INV_BX = (0, 0, 1, 1, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 0)
HILBERT_INV_BY = (0, 1, 1, 0, 0, 0, 1, 1, 1, 1, 0, 0, 1, 0, 0, 1)
HILBERT_INV_NEXT = (1, 0, 0, 2, 0, 1, 1, 3, 3, 2, 2, 0, 2, 3, 3, 1)


def _lut(values: tuple[int, ...]) -> Column:
    return F.array(*[F.lit(v) for v in values])


def hilbert_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Hilbert curve position of (x, y) over a 2^bits × 2^bits grid —
    pure JVM-side arithmetic + 16-element array lookups (no UDF, no
    shuffle).  Inputs are masked to ``bits`` bits like zorder_key."""
    if 2 * bits > 63:
        raise ValueError("hilbert_key: 2*bits exceeds signed-long range")
    digit_arr, next_arr = _lut(HILBERT_DIGIT), _lut(HILBERT_NEXT)
    mask = F.lit((1 << bits) - 1)
    hx = x.cast("long").bitwiseAND(mask)
    hy = y.cast("long").bitwiseAND(mask)
    st: Column = F.lit(0)
    d: Column = F.lit(0).cast("long")
    for i in range(bits):
        sh = bits - 1 - i
        q = F.shiftright(hx, sh).bitwiseAND(F.lit(1)) * 2 + F.shiftright(
            hy, sh
        ).bitwiseAND(F.lit(1))
        idx = (st * 4 + q + 1).cast("int")
        d = d * 4 + F.element_at(digit_arr, idx).cast("long")
        st = F.element_at(next_arr, idx)
    return d


def hilbert_decode(d: Column, bits: int) -> tuple[Column, Column]:
    """Inverse of :func:`hilbert_key`: curve position → (x, y)."""
    bx_arr, by_arr, nx_arr = (
        _lut(HILBERT_INV_BX),
        _lut(HILBERT_INV_BY),
        _lut(HILBERT_INV_NEXT),
    )
    st: Column = F.lit(0)
    x: Column = F.lit(0).cast("long")
    y: Column = F.lit(0).cast("long")
    for i in range(bits):
        sh = 2 * (bits - 1 - i)
        dig = F.shiftright(d.cast("long"), sh).bitwiseAND(F.lit(3))
        idx = (st * 4 + dig + 1).cast("int")
        x = x * 2 + F.element_at(bx_arr, idx).cast("long")
        y = y * 2 + F.element_at(by_arr, idx).cast("long")
        st = F.element_at(nx_arr, idx)
    return x, y


def _sql_list(values: tuple[int, ...]) -> str:
    return "[" + ", ".join(str(v) for v in values) + "]"


def hilbert_key_sql(
    x_expr: str, y_expr: str, bits: int, source: str
) -> str:
    """DuckDB mirror of :func:`hilbert_key` as a nested-subquery chain
    over ``source`` (keeps SQL text linear in ``bits`` — a single
    inlined expression doubles per level).  The result column is
    ``hkey``; every source column passes through."""
    digit, nxt = _sql_list(HILBERT_DIGIT), _sql_list(HILBERT_NEXT)
    mask = (1 << bits) - 1
    inner = (
        f"SELECT *, 0 AS st0, CAST(0 AS BIGINT) AS d0,"
        f" (CAST({x_expr} AS BIGINT) & {mask}) AS hx,"
        f" (CAST({y_expr} AS BIGINT) & {mask}) AS hy FROM {source}"
    )
    for i in range(bits):
        sh = bits - 1 - i
        q = f"(((hx >> {sh}) & 1) * 2 + ((hy >> {sh}) & 1))"
        idx = f"(st{i} * 4 + {q})"
        inner = (
            f"SELECT *, d{i} * 4 + ({digit})[{idx} + 1] AS d{i + 1},"
            f" ({nxt})[{idx} + 1] AS st{i + 1} FROM ({inner})"
        )
    return f"SELECT *, d{bits} AS hkey FROM ({inner})"


def hilbert_decode_sql(d_expr: str, bits: int, source: str) -> str:
    """DuckDB mirror of :func:`hilbert_decode` (nested subqueries);
    result columns ``hdx``/``hdy``."""
    bx, by, nxt = (
        _sql_list(HILBERT_INV_BX),
        _sql_list(HILBERT_INV_BY),
        _sql_list(HILBERT_INV_NEXT),
    )
    inner = (
        f"SELECT *, 0 AS ist0, CAST(0 AS BIGINT) AS ix0,"
        f" CAST(0 AS BIGINT) AS iy0 FROM {source}"
    )
    for i in range(bits):
        sh = 2 * (bits - 1 - i)
        dig = f"((CAST({d_expr} AS BIGINT) >> {sh}) & 3)"
        idx = f"(ist{i} * 4 + {dig})"
        inner = (
            f"SELECT *, ix{i} * 2 + ({bx})[{idx} + 1] AS ix{i + 1},"
            f" iy{i} * 2 + ({by})[{idx} + 1] AS iy{i + 1},"
            f" ({nxt})[{idx} + 1] AS ist{i + 1} FROM ({inner})"
        )
    return (
        f"SELECT *, ix{bits} AS hdx, iy{bits} AS hdy FROM ({inner})"
    )
