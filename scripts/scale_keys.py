"""Time arbitrary registry keys on Spark at a given sf dir — the
Spark-side twin of scripts/duckdb_baseline.py, with bench.py's exact
timing discipline (table warmup pass, noop-sink full-column
materialization, warm run + median of 3).  Built for the round-13
iterative-graph scale run (r12-verdict task #2: the one operator
family with no 10x datapoint) and the third-scale-point slope runs
(task #4), but key-generic like the stage profiler.

    python scripts/scale_keys.py --sf /tmp/sf1.0 dedup_cc_clusters ...
    python scripts/scale_keys.py --sf /tmp/sf1.0 --check keys...   # parity
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--check", action="store_true",
                    help="also hash-compare each key vs its DuckDB oracle")
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    from duckdb_hdfs_spark.sources.catalog import TABLES, load_table
    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.session import get_spark

    spark = get_spark("scale-keys")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    for tbl in TABLES:
        load_table(spark, args.sf, tbl).write.format("noop") \
            .mode("overwrite").save()

    def run_once(qd) -> float:
        t0 = time.perf_counter()
        qd.spark(spark, args.sf).write.format("noop") \
            .mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name in args.keys:
        qd = reg[name]
        run_once(qd)  # warm (code path + page cache), not counted
        runs = sorted(run_once(qd) for _ in range(args.reps))
        timings[name] = round(runs[len(runs) // 2], 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    ok = None
    if args.check:
        from duckdb_hdfs_spark.oracle import compare, duckdb_connection

        con = duckdb_connection(args.sf)
        ok = {}
        for name in args.keys:
            qd = reg[name]
            if qd.oracle is None:
                ok[name] = None
                continue
            r = compare(name, qd.spark(spark, args.sf), con, qd.oracle)
            ok[name] = bool(r.ok)
            print(f"# check {name}: {'OK' if r.ok else str(r)[:200]}",
                  file=sys.stderr)
        con.close()

    out = {"metric": "scale_keys_wall_time",
           "value": round(sum(timings.values()), 3), "unit": "sec",
           "queries": timings, "sf_dir": args.sf}
    if ok is not None:
        out["oracle_ok"] = ok
    print(json.dumps(out), flush=True)
    return 0 if (ok is None or all(v in (True, None) for v in ok.values())) \
        else 1


if __name__ == "__main__":
    raise SystemExit(main())
