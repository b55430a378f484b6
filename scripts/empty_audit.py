"""Zero-row adversarial audit (round 10) — the degenerate the tiny-data
audit (30-row tables, round 9) stopped short of: EVERY table empty,
schema preserved.  A real pipeline hits this state constantly (a new
partition before first ingest, a filter that matched nothing, a
dry-run over an empty prefix), and it is where 1-row-scalar
assumptions break: global aggregates produce one NULL row vs zero
rows, broadcast 1-row thresholds become empty broadcasts, quantile
sketches return NULL bounds into range bucketing, and ANSI division
guards meet count(*) = 0.

Runs the FULL registry parity sweep over a schema-only copy of
sf0.001 and reports every key whose Spark and DuckDB results diverge
(both-empty = green, matching the oracle row-for-row like every other
audit).

    python scripts/empty_audit.py [--sf /root/testdata/sf0.001] [keys...]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def build_empty_dir(sf_dir: str, dst: str) -> str:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet' WHERE false) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return dst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from duckdb_hdfs_spark.oracle import run_all
    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.session import get_spark

    dst = tempfile.mkdtemp(prefix="testdata_empty_")
    build_empty_dir(args.sf, dst)
    print(f"schema-only copy at {dst}", flush=True)

    spark = get_spark("empty-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    keys = [k for k in (args.keys or list(reg)) if k in reg]
    results = run_all(spark, dst, names=keys)
    bad = [r for r in results if not r.ok]
    print(f"{len(results) - len(bad)}/{len(results)} green")
    for r in bad:
        print(f"FAIL {getattr(r, 'name', r)} :: {str(r)[:400]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
