"""Measure the DuckDB reference-engine baseline for headline queries:
runs each key's oracle SQL over the same sf-dir parquet views on the
same thread count as bench.py, warm, median of 3, full
materialization (fetchall).  This is how the README's DuckDB column
is produced.

    python scripts/duckdb_baseline.py [--sf /root/testdata/sf0.1] [keys...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_hdfs_spark.oracle import duckdb_connection
from duckdb_hdfs_spark.queries import load_all


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--threads", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    reg = load_all()
    keys = args.keys or [n for n, qd in reg.items() if qd.headline]
    con = duckdb_connection(args.sf)
    con.execute(f"SET threads TO {int(args.threads)}")

    timings = {}
    for name in keys:
        sql = reg[name].oracle
        if sql is None:
            timings[name] = None
            continue
        con.execute(sql).fetchall()  # warm (page cache + plan)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    print(json.dumps({"engine": "duckdb", "sf": args.sf, "queries": timings,
                      "total": round(sum(v for v in timings.values() if v), 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
