"""Negative-measures adversarial audit (round 10) — md5-gated 5% of
money/measure values sign-flipped: the refund / chargeback /
correction-entry state every revenue pipeline eventually carries.
The extreme-values audit stressed MAGNITUDE (±1e12); this one
stresses SIGN where the magnitude is ordinary: log/sqrt domain edges
(log of a negative share, sqrt of a negative mean), Benford-style
digit extraction on negatives, Gini/concentration with negative
contributions, discount factors > 1, and revenue ratios crossing
zero (division by a near-zero group total flips the quotient's
sign between engines only if rounding differs).

Perturbations (deterministic md5 gate, 5%):
- lineitem.l_extendedprice -> negated (a credit line)
- orders.o_totalprice      -> negated (a refunded order)
- events.value             -> negated
- customer.c_acctbal already carries negatives in TPC-H — untouched.

    python scripts/negative_audit.py [--sf /root/testdata/sf0.001] [keys...]
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


def _neg(col: str, gate: str, key: str) -> str:
    return (
        f"CASE WHEN ('0x' || substr(md5('{gate}' || CAST({key} AS VARCHAR)), 1, 4))::BIGINT "
        f"% 100 < 5 THEN -{col} ELSE {col} END AS {col}"
    )


SPECS = {
    "lineitem": (
        "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
        + _neg("l_extendedprice", "ng", "l_orderkey * 8 + l_linenumber")
        + ", l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
    ),
    "orders": (
        "o_orderkey, o_custkey, o_orderstatus, "
        + _neg("o_totalprice", "no", "o_orderkey")
        + ", o_orderdate, o_orderpriority"
    ),
    "events": (
        "event_id, ts, user_id, event_type, "
        + _neg("value", "nv", "event_id")
        + ", props"
    ),
}


def build_negative_dir(sf_dir: str, dst: str) -> str:
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

    dst = tempfile.mkdtemp(prefix="testdata_negative_")
    build_negative_dir(args.sf, dst)
    print(f"sign-flipped copy at {dst}", flush=True)

    spark = get_spark("negative-audit")
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
