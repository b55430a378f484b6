"""Local simulation of the driver's CORRECTNESS gate.

Runs the first N registry keys (the driver window) — or an explicit
key list — through duckdb_hdfs_spark.oracle.compare at an arbitrary
sf dir (default sf0.01, the driver's scale), printing one line per
key and a final tally.  Usage:

    python scripts/driver_sim.py [--sf /root/testdata/sf0.01] [--n 50] [keys...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_hdfs_spark.oracle import compare, duckdb_connection
from duckdb_hdfs_spark.queries import load_all
from duckdb_hdfs_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    reg = load_all()
    keys = args.keys or list(reg)[: args.n]
    spark = get_spark()
    con = duckdb_connection(args.sf)
    bad = []
    for i, name in enumerate(keys):
        t0 = time.time()
        try:
            qd = reg[name]  # inside try: a typo'd key is a FAIL, not an abort
            if qd.oracle is None:
                n = qd.spark(spark, args.sf).count()
                ok, msg = n > 0, f"rows-only n={n}"
            else:
                res = compare(name, qd.spark(spark, args.sf), con, qd.oracle)
                ok, msg = res.ok, str(res)
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXC {type(exc).__name__}: {exc}"
        dt = time.time() - t0
        print(f"[{i+1}/{len(keys)}] {'OK ' if ok else 'FAIL'} {name} ({dt:.1f}s)"
              + ("" if ok else f" :: {msg[:400]}"), flush=True)
        if not ok:
            bad.append(name)
    print(f"\n{len(keys) - len(bad)}/{len(keys)} green" + (f"; FAILED: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
