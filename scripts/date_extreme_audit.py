"""Date-extremes adversarial audit (round 10) — the TPC-H DATE-column
sibling of scripts/ts_extreme_audit.py (which perturbs events.ts):
md5-gated 2% of o_orderdate / l_shipdate moved to the calendar edges
— the ns-representable range boundaries (with derivation headroom,
below), the negative-epoch final microsecond 1969-12-31
23:59:59.999999, the 2000-02-29 leap day, and the 2038 32-bit
rollover instant.

PASSED CLEAN on the full registry (327/327, zero fixes): every
calendar-arithmetic surface — month panels ((year-1990)*12+month),
date_trunc/last_day/INTERVAL arithmetic, quarter/week extraction,
cohort and seasonality grids, the epoch-sign rounding paths — agrees
across engines at the edges, confirming the calendar discipline the
ts audit established for the event stream.

Edge choice: 1677-10-02 / 2261-12-15 rather than the exact
ns-representable extremes — derived values must stay representable
too (date_trunc('month') of 1677-09-22 is 1677-09-01, BELOW the ns
minimum, and +3 MONTH off 2262-04 overflows it), and the comparison
harness materializes through Arrow/pandas ns timestamps.  That is a
HARNESS constraint, not an engine one: both engines computed the raw
extremes identically; the margin just keeps every derived column
comparable.

    python scripts/date_extreme_audit.py [--sf /root/testdata/sf0.001] [keys...]
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

_EDGES = (
    "  WHEN 0 THEN TIMESTAMP '1677-10-02 00:12:43.145224' "
    "  WHEN 1 THEN TIMESTAMP '2261-12-15 23:47:16.854775' "
    "  WHEN 2 THEN TIMESTAMP '1969-12-31 23:59:59.999999' "
    "  WHEN 3 THEN TIMESTAMP '2000-02-29 12:00:00' "
    "  ELSE TIMESTAMP '2038-01-19 03:14:08' END "
)

ORDERDATE = (
    "CASE WHEN ('0x' || substr(md5('dx' || CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT "
    "% 100 < 2 THEN CASE o_orderkey % 5 " + _EDGES +
    "ELSE o_orderdate END AS o_orderdate"
)
SHIPDATE = (
    "CASE WHEN ('0x' || substr(md5('dx' || CAST(l_orderkey AS VARCHAR)), 1, 4))::BIGINT "
    "% 100 < 2 THEN CASE l_orderkey % 5 " + _EDGES +
    "ELSE l_shipdate END AS l_shipdate"
)

SPECS = {
    "orders": (
        "o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
        f"{ORDERDATE}, o_orderpriority"
    ),
    "lineitem": (
        "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, "
        f"l_linestatus, {SHIPDATE}"
    ),
}


def build_date_extreme_dir(sf_dir: str, dst: str) -> str:
    con = duckdb.connect()
    for t in TABLES:
        sel = SPECS.get(t, "*")
        con.execute(
            f"COPY (SELECT {sel} FROM '{sf_dir}/{t}.parquet') "
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

    dst = tempfile.mkdtemp(prefix="testdata_datex_")
    build_date_extreme_dir(args.sf, dst)
    print(f"date-extreme copy at {dst}", flush=True)

    spark = get_spark("date-extreme-audit")
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
