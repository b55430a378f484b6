"""Volume-slope measurement for dedup_substring_spans (round-9
verdict task 7) — the same protocol round 7 used for the LSH
pipeline: 1x/2x/5x/10x the sf0.1 documents corpus via id-offset
self-union with per-replica text perturbation (every token gets a
replica prefix, so grams are disjoint across replicas: within-replica
duplicate structure — and therefore per-gram doc frequency — is
preserved exactly, and the workload scales linearly by construction
instead of inflating df past the SPAN_MAXDF cap).

Records candidate-position mass (the pre-window matched-position
count, the df²-bounded quantity the docstring's fan-out argument is
about) and median-of-3 warm wall time for full span materialization.

    python scripts/substring_slope.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--scales", default="1,2,5,10")
    args = ap.parse_args()

    from duckdb_hdfs_spark.queries.dedup import substring_spans_pipeline
    from duckdb_hdfs_spark.session import get_spark
    from duckdb_hdfs_spark.sources.catalog import load_table

    spark = get_spark("substring-slope")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, args.sf, "documents").select("doc_id", "text")
    n_base = base.count()

    out = []
    for scale in [int(s) for s in args.scales.split(",")]:
        reps = [
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                # per-replica token prefix: replicas share no grams,
                # so df per gram — and the cap's effect — is constant
                F.regexp_replace("text", r"(\S+)", f"r{i}$1").alias("text"),
            )
            for i in range(scale)
        ]
        docs = reps[0]
        for r in reps[1:]:
            docs = docs.unionAll(r)
        docs = docs.localCheckpoint(eager=True)  # isolate input prep

        def run_once():
            t0 = time.perf_counter()
            matches, spans = substring_spans_pipeline(docs)
            n_spans = spans.count()
            wall = time.perf_counter() - t0
            return wall, matches.count(), n_spans

        runs = [run_once() for _ in range(3)]
        wall = sorted(w for w, _, _ in runs)[1]
        _, mass, n_spans = runs[0]
        rec = {
            "scale": scale,
            "docs": n_base * scale,
            "wall_sec": round(wall, 2),
            "candidate_positions": mass,
            "spans": n_spans,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
        docs.unpersist()

    print(json.dumps({"slope": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
