"""Capture .explain("formatted") for registry keys into plans/<tag>/.

Plan-only (no job runs): builds each key's DataFrame against the sf
dir and writes ``plans/<tag>/<key>_<suffix>.txt``.  Used for the
optimization-round before/after plan evidence.

    python scripts/capture_plans.py --tag r13 --suffix before key...
    python scripts/capture_plans.py --tag r13 --suffix before --all
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--all", action="store_true", help="every registry key")
    ap.add_argument("--headline", action="store_true", help="headline keys")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    keys = list(args.keys)
    if args.all:
        keys = list(reg)
    elif args.headline:
        keys = [n for n, qd in reg.items() if qd.headline]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in keys:
        qd = reg[name]
        try:
            df = qd.spark(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"# wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
