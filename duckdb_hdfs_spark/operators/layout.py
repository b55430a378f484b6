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
