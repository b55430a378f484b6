"""Single-row adversarial audit (round 10) — between the tiny-data
audit's 30-row tables (round 9) and the zero-row audit (round 10)
sits the sharpest populated degenerate: EVERY table holds exactly ONE
row.  n = 1 zeroes every sample-variance denominator (n - 1), every
pair construction (self-joins, lag/lead, consecutive-row deltas),
every "other group" contrast (Welch/ANOVA between-groups), and every
tie structure — the states a fresh tenant, a filtered-to-one-key
debug run, or a first-ingest partition hit in production.

Rows are selected REFERENTIALLY CONSISTENT (the one lineitem belongs
to the one order, which belongs to the one customer, whose nation and
region are the ones kept; the one part/supplier are the lineitem's),
so join-shaped queries still produce their natural 1-row results
rather than empty sets — this keeps the audit probing n=1 arithmetic,
not (already-audited) empty-input behavior.

Runs the FULL registry parity sweep and reports every key whose Spark
and DuckDB results diverge.

    python scripts/onerow_audit.py [--sf /root/testdata/sf0.001] [keys...]
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


def build_onerow_dir(sf_dir: str, dst: str) -> str:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW src_{t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    # anchor on the smallest orderkey that HAS lineitems, then walk
    # the foreign keys outward so every kept row references a kept row
    con.execute("""
CREATE TABLE k_lineitem AS
    SELECT * FROM src_lineitem
    ORDER BY l_orderkey, l_linenumber LIMIT 1
""")
    con.execute("""
CREATE TABLE k_orders AS
    SELECT o.* FROM src_orders o, k_lineitem l
    WHERE o.o_orderkey = l.l_orderkey LIMIT 1
""")
    con.execute("""
CREATE TABLE k_customer AS
    SELECT c.* FROM src_customer c, k_orders o
    WHERE c.c_custkey = o.o_custkey LIMIT 1
""")
    con.execute("""
CREATE TABLE k_nation AS
    SELECT n.* FROM src_nation n, k_customer c
    WHERE n.n_nationkey = c.c_nationkey LIMIT 1
""")
    con.execute("""
CREATE TABLE k_region AS
    SELECT r.* FROM src_region r, k_nation n
    WHERE r.r_regionkey = n.n_regionkey LIMIT 1
""")
    con.execute("""
CREATE TABLE k_part AS
    SELECT p.* FROM src_part p, k_lineitem l
    WHERE p.p_partkey = l.l_partkey LIMIT 1
""")
    con.execute("""
CREATE TABLE k_supplier AS
    SELECT s.* FROM src_supplier s, k_lineitem l
    WHERE s.s_suppkey = l.l_suppkey LIMIT 1
""")
    for t in ("events", "documents", "embeddings"):
        key = {"events": "event_id", "documents": "doc_id", "embeddings": "vec_id"}[t]
        con.execute(
            f"CREATE TABLE k_{t} AS SELECT * FROM src_{t} ORDER BY {key} LIMIT 1"
        )
    for t in TABLES:
        con.execute(
            f"COPY k_{t} TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
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

    dst = tempfile.mkdtemp(prefix="testdata_onerow_")
    build_onerow_dir(args.sf, dst)
    print(f"single-row copy at {dst}", flush=True)

    spark = get_spark("onerow-audit")
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
