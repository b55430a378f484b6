"""Constant-data (zero-variance / all-ties) adversarial audit (round
10) — the degenerate the extreme-values audit stopped short of: every
measure column holds ONE value across the whole table (keys, text and
timestamps stay real).  A real pipeline hits this state constantly (a
fixed-price catalog slice, a sensor stuck at a constant reading, a
single-language corpus shard, an embedding column where a bug wrote
the same vector everywhere), and it is where variance-denominator and
tie-ranking assumptions break: stddev = 0 feeds z-scores / t-tests /
correlations (DuckDB yields NULL on 0/0 double division, Spark yields
NaN unless guarded), rank correlations meet the all-ties column,
top-k-by-similarity meets an all-equal score column (nondeterministic
without a unique tie-break), and histogram/bucket logic meets a
single occupied bin.

Perturbations (total, not sampled — constancy must be complete to
zero the variance):

- events.value        -> 1.0
- lineitem.l_quantity / l_extendedprice / l_discount / l_tax
                      -> 25.0 / 1000.0 / 0.05 / 0.02
- orders.o_totalprice -> 100000.0
- customer.c_acctbal, supplier.s_acctbal -> 1000.0
- part.p_retailprice  -> 500.0, p_size -> 10
- documents.lang      -> 'en'  (single-group per-language machinery)
- embeddings.embedding -> the first row's vector, everywhere
  (cosine = 1 for every pair: ANN top-k tie explosion)

Runs the FULL registry parity sweep over the constant copy of sf0.001
and reports every key whose Spark and DuckDB results diverge.

    python scripts/const_audit.py [--sf /root/testdata/sf0.001] [keys...]
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
    "events": "event_id, ts, user_id, event_type, CAST(1.0 AS DOUBLE) AS value, props",
    "lineitem": (
        "l_orderkey, l_partkey, l_suppkey, l_linenumber, "
        "CAST(25.0 AS DOUBLE) AS l_quantity, CAST(1000.0 AS DOUBLE) AS l_extendedprice, "
        "CAST(0.05 AS DOUBLE) AS l_discount, CAST(0.02 AS DOUBLE) AS l_tax, "
        "l_returnflag, l_linestatus, l_shipdate"
    ),
    "orders": (
        "o_orderkey, o_custkey, o_orderstatus, "
        "CAST(100000.0 AS DOUBLE) AS o_totalprice, o_orderdate, o_orderpriority"
    ),
    "customer": "c_custkey, c_name, c_nationkey, CAST(1000.0 AS DOUBLE) AS c_acctbal, c_mktsegment",
    "supplier": "s_suppkey, s_name, s_nationkey, CAST(1000.0 AS DOUBLE) AS s_acctbal",
    "part": (
        "p_partkey, p_name, p_brand, p_type, "
        "CAST(10 AS INTEGER) AS p_size, CAST(500.0 AS DOUBLE) AS p_retailprice"
    ),
    "documents": "doc_id, text, 'en' AS lang, source, n_chars",
}


def build_const_dir(sf_dir: str, dst: str) -> str:
    con = duckdb.connect()
    for t in TABLES:
        sel = SPECS.get(t, "*")
        if t == "embeddings":
            # one real vector, inlined as a literal for every row
            vec = con.execute(
                f"SELECT embedding FROM '{sf_dir}/{t}.parquet' "
                "ORDER BY vec_id LIMIT 1"
            ).fetchone()[0]
            lit = "[" + ", ".join(repr(float(x)) for x in vec) + "]"
            sel = f"vec_id, CAST({lit} AS FLOAT[]) AS embedding, label"
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

    dst = tempfile.mkdtemp(prefix="testdata_const_")
    build_const_dir(args.sf, dst)
    print(f"constant copy at {dst}", flush=True)

    spark = get_spark("const-audit")
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
