"""Row-order / layout-invariance adversarial audit (round 11) — every
table rewritten with its rows in a deterministic md5 SCRAMBLE of the
original order: the state a distributed writer, a compaction job, or
a shuffle-stage retry actually leaves behind.  Row order is the one
degree of freedom a 100 TB storage layer exercises constantly
(task-commit order, file merge order, row-group interleaving), and
NOTHING in the result contract may depend on it.

What it stresses, per engine and cross-engine:

- any accidental ``first``/``any_value``-style pick without an
  explicit deterministic order;
- approximate sketches whose merge tree follows the partition layout
  (``percentile_approx`` bounds in grouped_cumsum's range bucketing,
  HLL/GK estimates) — bucket boundaries MAY move, results may not:
  the repo's contracts are rank/error BOUNDS and monotone-bucketing
  invariance, both of which must absorb any layout;
- double-sum accumulation order (guarded repo-wide by rounding
  before decimal folds — this audit is the direct probe of that
  rule);
- LIMIT/top-k without a total order (banned; this catches
  regressions).

Protocol — two checks per key:

1. PARITY on the scrambled copy (spark vs DuckDB oracle, the
   standard sweep);
2. INVARIANCE: spark(scrambled) must equal spark(original)
   frame-for-frame (canonicalized) — the pure layout-sensitivity
   probe, engine-internal, no oracle in the loop.

    python scripts/roworder_audit.py [--sf /root/testdata/sf0.001]
        [--skip-invariance] [keys...]
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

#: per-table scramble key (dup_audit's KEY map): md5 of the key is a
#: deterministic pseudo-random total order, uncorrelated with every
#: natural ordering (time, key ranges, insertion batches)
KEY = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey",
    "part": "p_partkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey * 8 + l_linenumber",
    "events": "event_id", "documents": "doc_id", "embeddings": "vec_id",
}


def build_scrambled_dir(sf_dir: str, dst: str) -> str:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet' "
            f" ORDER BY md5('shuf' || CAST({KEY[t]} AS VARCHAR))) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return dst


def invariance_check(name, qd, spark, scrambled: str, original: str):
    """spark(scrambled) == spark(original), canonicalized — reuses
    the oracle harness's canonical form and value comparator."""
    from duckdb_hdfs_spark.oracle import CompareResult, _canon, _values_equal

    a = _canon(qd.spark(spark, scrambled).toPandas())
    b = _canon(qd.spark(spark, original).toPandas())
    mism: list[str] = []
    if list(a.columns) != list(b.columns):
        mism.append(f"columns: scrambled={list(a.columns)} original={list(b.columns)}")
    elif len(a) != len(b):
        mism.append(f"row count: scrambled={len(a)} original={len(b)}")
    else:
        for col in a.columns:
            for i, (x, y) in enumerate(zip(a[col].tolist(), b[col].tolist())):
                if not _values_equal(x, y):
                    mism.append(
                        f"col {col} row {i}: scrambled={x!r} original={y!r}"
                    )
                    break
    return CompareResult(name, not mism, len(a), len(b), mism)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--skip-invariance", action="store_true")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from duckdb_hdfs_spark.oracle import run_all
    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.session import get_spark

    dst = tempfile.mkdtemp(prefix="testdata_roworder_")
    build_scrambled_dir(args.sf, dst)
    print(f"scrambled copy at {dst}", flush=True)

    spark = get_spark("roworder-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    keys = [k for k in (args.keys or list(reg)) if k in reg]

    results = run_all(spark, dst, names=keys)
    bad = [r for r in results if not r.ok]
    print(f"parity: {len(results) - len(bad)}/{len(results)} green", flush=True)

    inv_bad = []
    if not args.skip_invariance:
        n_inv = 0
        for name in keys:
            qd = reg[name]
            try:
                r = invariance_check(name, qd, spark, dst, args.sf)
            except Exception as e:  # noqa: BLE001
                from duckdb_hdfs_spark.oracle import CompareResult

                r = CompareResult(name, False, -1, -1, [f"exception: {e!r:.300}"])
            n_inv += 1
            if not r.ok:
                inv_bad.append(r)
        print(f"invariance: {n_inv - len(inv_bad)}/{n_inv} green", flush=True)

    for r in bad:
        print(f"FAIL parity {getattr(r, 'name', r)} :: {str(r)[:400]}")
    for r in inv_bad:
        print(f"FAIL invariance {getattr(r, 'name', r)} :: {str(r)[:400]}")
    return 1 if (bad or inv_bad) else 0


if __name__ == "__main__":
    raise SystemExit(main())
