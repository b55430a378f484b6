"""All-NULL-measures adversarial audit (round 10) — the saturation
limit of the round-9 NULL-injection audit: that audit NULLed 2% of
values and caught asymmetric NULL handling on the margins; this one
NULLs EVERY measure (keys, categories and timestamps stay real), the
state of a feed whose payload extractor broke while the envelope kept
flowing.  Aggregates must go NULL/0 identically on both engines
(sum→NULL, count(col)→0, avg→NULL), NULL thresholds broadcast into
comparisons must yield NULL-consistent filters, NULL text must vanish
symmetrically from every tokenize/shingle/hash pipeline at 100%
density, and NULL embedding arrays must NULL every fold instead of
crashing a worker.

Perturbations (total):
- events.value, events.props               -> NULL
- lineitem l_quantity/l_extendedprice/l_discount/l_tax -> NULL
- orders.o_totalprice                      -> NULL
- customer.c_acctbal, supplier.s_acctbal   -> NULL
- part.p_retailprice                       -> NULL
- documents.text                           -> NULL
- embeddings.embedding                     -> NULL

    python scripts/allnull_audit.py [--sf /root/testdata/sf0.001] [keys...]
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

SPECS = {
    "events": (
        "event_id, ts, user_id, event_type, "
        "CAST(NULL AS DOUBLE) AS value, CAST(NULL AS VARCHAR) AS props"
    ),
    "lineitem": (
        "l_orderkey, l_partkey, l_suppkey, l_linenumber, "
        "CAST(NULL AS DOUBLE) AS l_quantity, "
        "CAST(NULL AS DOUBLE) AS l_extendedprice, "
        "CAST(NULL AS DOUBLE) AS l_discount, CAST(NULL AS DOUBLE) AS l_tax, "
        "l_returnflag, l_linestatus, l_shipdate"
    ),
    "orders": (
        "o_orderkey, o_custkey, o_orderstatus, "
        "CAST(NULL AS DOUBLE) AS o_totalprice, o_orderdate, o_orderpriority"
    ),
    "customer": (
        "c_custkey, c_name, c_nationkey, "
        "CAST(NULL AS DOUBLE) AS c_acctbal, c_mktsegment"
    ),
    "supplier": (
        "s_suppkey, s_name, s_nationkey, CAST(NULL AS DOUBLE) AS s_acctbal"
    ),
    "part": (
        "p_partkey, p_name, p_brand, p_type, p_size, "
        "CAST(NULL AS DOUBLE) AS p_retailprice"
    ),
    "documents": (
        "doc_id, CAST(NULL AS VARCHAR) AS text, lang, source, n_chars"
    ),
    "embeddings": "vec_id, CAST(NULL AS FLOAT[]) AS embedding, label",
}


def build_allnull_dir(sf_dir: str, dst: str) -> str:
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

    dst = tempfile.mkdtemp(prefix="testdata_allnull_")
    build_allnull_dir(args.sf, dst)
    print(f"all-NULL copy at {dst}", flush=True)

    spark = get_spark("allnull-audit")
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
