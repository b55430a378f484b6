"""Volume-slope measurement for stats_spearman_corr (round 10) — the
same protocol as the LSH and substring-span slopes: 1x/2x/5x/10x the
sf0.1 lineitem rows via self-union with per-replica value jitter.

The interesting scaling axis for distributed ranking is the DISTINCT
y grain (the grouped_cumsum input): each replica perturbs
l_extendedprice by a sub-cent replica epsilon so distinct-y grows
linearly with volume (the adversarial direction — a near-unique rank
key), while x keeps its tiny domain (replica-invariant).  Records the
distinct-(flag, y) grain and median-of-3 warm wall for the full
5-column correlation panel.

    python scripts/spearman_slope.py [--sf /root/testdata/sf0.1]
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

    import tempfile

    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.session import get_spark
    from duckdb_hdfs_spark.sources.catalog import load_table

    spark = get_spark("spearman-slope")
    spark.sparkContext.setLogLevel("ERROR")
    q = load_all()["stats_spearman_corr"].spark
    base = load_table(spark, args.sf, "lineitem")
    n_base = base.count()
    cols = base.columns

    out = []
    for scale in [int(s) for s in args.scales.split(",")]:
        reps = [
            base.withColumn(
                "l_extendedprice",
                # sub-cent replica epsilon: keeps values in-domain and
                # distinct across replicas, so the distinct-y rank
                # grain grows linearly with volume
                F.col("l_extendedprice") + F.lit(i) / 1000.0,
            ).select(*cols)
            for i in range(scale)
        ]
        docs = reps[0]
        for r in reps[1:]:
            docs = docs.unionAll(r)
        # the registry callable reads from a directory — materialize
        # the scaled replica as parquet so the measured pipeline is
        # EXACTLY the registered query, scan included
        d = tempfile.mkdtemp(prefix=f"spearman_slope_{scale}x_")
        docs.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")

        grain = (
            spark.read.parquet(f"{d}/lineitem.parquet")
            .select("l_returnflag", "l_extendedprice")
            .distinct()
            .count()
        )

        def run_once():
            t0 = time.perf_counter()
            q(spark, d).collect()
            return time.perf_counter() - t0

        run_once()  # warm the scan
        wall = sorted(run_once() for _ in range(3))[1]
        rec = {
            "scale": scale,
            "rows": n_base * scale,
            "distinct_flag_y": grain,
            "wall_sec": round(wall, 2),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"slope": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
