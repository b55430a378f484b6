"""Scan-parallelism rebalancing for CPU-heavy derivation stages.

Spark's file-scan parallelism is bounded by splits = files x row
groups.  A single-file / single-row-group input (how a small dimension
extract or a freshly-ingested file can arrive on a real cluster)
therefore runs its ENTIRE map phase on one task, no matter how many
cores the cluster has.  For cheap map work that is irrelevant; for
CPU-bound derivations (per-shingle md5 in MinHash, per-element vector
folds in similarity scoring) it serializes the stage.

:func:`rebalance_cpu_heavy` fixes exactly that case and ONLY that
case, with TWO plan-only guards (no job runs):

1. parallelism guard — the input's split count must leave more than
   half the session's cores idle, else the scan is already parallel;
2. volume guard — the Catalyst size estimate must provide at least
   ``MIN_BYTES_PER_SLOT`` per target slot, else the exchange costs
   more than the serialization it removes.  (Round-3 measured this:
   unconditionally repartitioning a 0.6 MB single-file input at 32
   cores made the MinHash / brute-force headliners 22-50% SLOWER —
   the shuffle write/read and the broken scan→join codegen pipeline
   outweigh parallelizing sub-second map work.)

At 100 TB the first guard never fires (thousands of row groups >>
cores), so no shuffle is added at scale — the operators stay
single-shuffle.  The case that still fires both guards is the real
target: a single ~1 GB unsplit fresh-ingest file, where 32 slots x
32 MB of md5-heavy map work dwarfs one narrow-projection shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Minimum Catalyst-estimated bytes of input per target slot before a
#: repartition is worth its exchange.  4 MiB of projected text/vector
#: input per core is multiple seconds of md5/fold work — safely past
#: the point where the one-pass shuffle of the same bytes amortizes.
MIN_BYTES_PER_SLOT = 4 << 20


def rebalance_cpu_heavy(
    df: DataFrame, min_bytes_per_slot: int = MIN_BYTES_PER_SLOT
) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff
    (a) its current partitioning would leave more than half the cores
    idle AND (b) the optimizer's size estimate gives every target
    slot at least ``min_bytes_per_slot`` of input to chew on.  Both
    probes are plan-only (no job runs)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 > target:
        return df
    est_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if est_bytes < target * min_bytes_per_slot:
        return df
    return df.repartition(target)
