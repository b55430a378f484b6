"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from duckdb_hdfs_spark import get_spark
    from duckdb_hdfs_spark.queries import load_all

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    bench_queries = {n: qd for n, qd in registry.items() if qd.headline}

    # JVM + code-path + page-cache warmup (not counted): full scan of
    # every table the headline queries read, so timings measure engine
    # throughput (steady-state, what a long run amortizes to) rather
    # than first-touch disk I/O — the DuckDB baseline numbers were
    # likewise measured warm.
    # warm EVERY catalog table (catalog.TABLES), not a hand-kept list:
    # the previous hardcoded tuple omitted supplier, so headline q5's
    # first timed run paid first-touch I/O (round-7 review finding)
    from duckdb_hdfs_spark.sources.catalog import TABLES, load_table

    for tbl in TABLES:
        df = load_table(spark, sf_dir, tbl)
        df.rdd.getNumPartitions()  # JIT-warm the partition probe path
        df.write.format("noop").mode("overwrite").save()

    def run_once(qd) -> float:
        """Materialize EVERY output column via the noop sink —
        ``count()`` would let Catalyst prune the computed columns and
        time an empty projection."""
        t0 = time.perf_counter()
        df = qd.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name, qd in bench_queries.items():
        # median of 3: first run pays plan compile + codegen (the
        # median discards it); a min-of-N kept producing phantom
        # ±15% round-over-round swings from one lucky run.
        runs = sorted(run_once(qd) for _ in range(3))
        timings[name] = round(runs[1], 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
