"""Scan-parallelism rebalancing for CPU-heavy derivation stages.

Spark's file-scan parallelism is bounded by splits = files x row
groups.  A single-file / single-row-group input (how the local test
parquet is laid out — and how a small dimension extract or a
freshly-ingested file can arrive on a real cluster) therefore runs
its ENTIRE map phase on one task, no matter how many cores the
cluster has.  For cheap map work that is irrelevant; for CPU-bound
derivations (per-shingle md5 in MinHash, per-element vector folds in
similarity scoring) it serializes the stage.

:func:`rebalance_cpu_heavy` fixes exactly that case and ONLY that
case: when the input's split count is far below the session's
parallelism, round-robin repartition it; otherwise return the input
unchanged.  At 100 TB the guard never fires (thousands of row groups
>> cores), so no shuffle is added at scale — the operators stay
single-shuffle.  When it does fire the shuffled bytes are only the
operator's narrow projected input (doc_id + text, or vec_id +
embedding), measured 1.3-1.8x end-to-end on the md5/fold-heavy
headline operators locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_cpu_heavy(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff
    its current partitioning would leave more than half the cores
    idle.  The partition probe is plan-only (no job runs)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df
