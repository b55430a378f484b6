"""Scan-parallelism rebalancing for CPU-heavy derivation stages.

Spark's file-scan parallelism is bounded by splits = files x row
groups.  A single-file / single-row-group input (how a small dimension
extract or a freshly-ingested file can arrive on a real cluster)
therefore runs its ENTIRE map phase on one task, no matter how many
cores the cluster has.  For cheap map work that is irrelevant; for
CPU-bound derivations (per-shingle md5 in MinHash, per-element vector
folds in similarity scoring) it serializes the stage.

:func:`rebalance_cpu_heavy` fixes exactly that case and ONLY that
case, with a GRADED plan-only sizing rule (no job runs): the slot
count is proportional to the Catalyst size estimate — one slot per
``bytes_per_slot`` of (compressed, column-pruned) input, capped at the
session's core count — and the exchange is added only when that grade
at least doubles the scan's existing parallelism.

Calibration history (measured on the sf0.1 bench set, local[32]):

- round 3: an UNCONDITIONAL ``repartition(defaultParallelism)`` made
  the MinHash / brute-force headliners 22-50% slower at sf0.01-ish
  volumes — 32 tasks of sub-millisecond work cost more in scheduling
  and broken scan→join codegen pipelining than the serial map phase.
  That round answered with an all-or-nothing 4 MiB/slot volume gate.
- round 7: the all-or-nothing gate was measured to over-correct — the
  sf0.1 documents scan (254 KB compressed estimate, ONE task) carries
  ~0.85 s of single-threaded shingle+md5 work, and the 4 MiB gate
  refused to parallelize it; a ~10-slot repartition cuts the full
  MinHash-LSH query 30-43% (1.45 s → 0.83-0.99 s median-of-5).  The
  graded rule below lands on exactly that slot count from the size
  estimate alone, and still grades sf0.001/sf0.01 inputs to one slot
  (no exchange — preserving the round-3 result).

At 100 TB neither path fires: thousands of row-group splits already
exceed ``2 * cores``, so the parallelism guard exits first and the
operators stay single-shuffle.  The case the grade exists for is the
real one: a single ~1 GB unsplittable fresh-ingest file whose
md5-heavy map phase would otherwise run serially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Catalyst-estimated (compressed, column-pruned) bytes per target
#: slot.  Empirically ~3.5 s/MB of single-threaded shingle-md5 work
#: on the documents table → ~80 ms of CPU per 24 KiB slot, an order
#: of magnitude past the ~5-10 ms per-task scheduling cost a tiny
#: narrow-row exchange adds.  Inputs smaller than ``2 * slot`` bytes
#: grade to one slot and are never repartitioned.
BYTES_PER_SLOT = 24 << 10

#: Backwards-compatible alias (round-3 name; tests referenced it).
MIN_BYTES_PER_SLOT = BYTES_PER_SLOT


def rebalance_cpu_heavy(
    df: DataFrame, bytes_per_slot: int = BYTES_PER_SLOT
) -> DataFrame:
    """Repartition ``df`` for a CPU-bound map phase iff the graded
    slot count (size estimate / ``bytes_per_slot``, capped at the
    session's cores) at least DOUBLES the current scan parallelism.
    Both probes are plan-only (no job runs)."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    current = df.rdd.getNumPartitions()
    if current * 2 > cores:
        return df
    est_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if est_bytes > 1 << 50:
        # stats-less leaf plans (LogicalRDD, createDataFrame over an
        # RDD) report spark.sql.defaultSizeInBytes ≈ Long.MaxValue —
        # an UNKNOWN, not a measurement; grading it would repartition
        # tiny frames to full core count (round-7 review finding).
        # A real >1 PiB input always has splits >> cores and exits at
        # the parallelism guard above, so treating huge as unknown
        # costs nothing.
        return df
    slots = min(est_bytes // bytes_per_slot, cores)
    if slots < current * 2:
        return df
    return df.repartition(slots)
