"""Schema-widening adversarial audit (round 11) — every table gains
an unexpected trailing column (``_schema_drift``, a per-row string):
the state a producer rollout leaves behind mid-migration, and the
most common schema-evolution event a 100 TB lake sees.  Consumers
reading by NAME must be bit-unaffected; consumers whose contract is
the full schema (select-*/whole-file surfaces) see the new column on
BOTH engines identically.

Checks:

1. PARITY on the widened copy — full registry, Spark vs the DuckDB
   oracle, both reading the widened files.  Keys that project named
   columns ignore the drift column; keys whose contract is the whole
   schema carry it on both sides equally — parity must hold for ALL.
2. INVARIANCE — spark(widened) == spark(original) for every key NOT
   in the WHOLE_SCHEMA class (those legitimately expose the new
   column or the changed file bytes/sizes).

    python scripts/schemadrift_audit.py [--sf /root/testdata/sf0.001]
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

KEY = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey",
    "part": "p_partkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey * 8 + l_linenumber",
    "events": "event_id", "documents": "doc_id", "embeddings": "vec_id",
}

#: keys whose CONTRACT includes the physical schema or raw file
#: bytes: a widened file is legitimately different output for them
#: (they still must agree CROSS-ENGINE on the widened copy — the
#: parity check covers every key).  fs_read_schema_merge left this
#: class in round 11: the audit caught it writing the SOURCE's full
#: schema into its generation files (leaking the drift column); it
#: now projects named columns and is drift-invariant.
WHOLE_SCHEMA = {
    "fs_read_parquet",      # select-* read of the table
    "fs_read_binary",       # whole-file bytes (file content changed)
    "fs_describe_tables",   # schema/size metadata panel
    "fs_ls",                # file sizes changed
    "fs_glob",              # file sizes changed
    "fs_sql_path",          # direct-path select-*
    "fs_typed_roundtrip",   # roundtrips the full row shape
    "fs_write_parquet",     # rewrites what it read
    "fs_write_orc",
    "fs_write_roundtrip",
    "fs_read_orc",
    "fs_read_csv",
    "fs_read_csv_gzip",
    "fs_read_csv_malformed",
    "fs_read_json",
    "fs_read_json_nested",
    "fs_summarize_table",   # per-column summary panel gains a column
    "fs_parquet_codecs",
    "fs_compact_small_files",
    "fs_partitioned_prune",
    "fs_bucketed_join",
    "fs_sql_join_views",
}


def build_widened_dir(sf_dir: str, dst: str) -> str:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT *, 'drift-' || CAST({KEY[t]} AS VARCHAR) AS _schema_drift "
            f" FROM '{sf_dir}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return dst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--skip-invariance", action="store_true")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from duckdb_hdfs_spark.oracle import CompareResult, run_all
    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.session import get_spark

    import importlib.util as ilu

    ro_spec = ilu.spec_from_file_location(
        "roworder_audit",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "roworder_audit.py"),
    )
    ro = ilu.module_from_spec(ro_spec)
    ro_spec.loader.exec_module(ro)

    dst = tempfile.mkdtemp(prefix="testdata_schemadrift_")
    build_widened_dir(args.sf, dst)
    print(f"widened copy at {dst}", flush=True)

    spark = get_spark("schemadrift-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    keys = [k for k in (args.keys or list(reg)) if k in reg]

    results = run_all(spark, dst, names=keys)
    bad = [("parity", r) for r in results if not r.ok]
    print(f"parity: {len(results) - len(bad)}/{len(results)} green", flush=True)

    if not args.skip_invariance:
        inv_keys = [k for k in keys if k not in WHOLE_SCHEMA]
        for name in sorted(WHOLE_SCHEMA & set(keys)):
            print(f"SKIP invariance {name} (WHOLE_SCHEMA — the schema/file "
                  "IS the contract; parity still checked above)")
        inv_bad = 0
        for name in inv_keys:
            qd = reg[name]
            try:
                r = ro.invariance_check(name, qd, spark, dst, args.sf)
            except Exception as e:  # noqa: BLE001
                r = CompareResult(name, False, -1, -1, [f"exception: {e!r:.300}"])
            if not r.ok:
                bad.append(("invariance", r))
                inv_bad += 1
        print(f"invariance: {len(inv_keys) - inv_bad}/{len(inv_keys)} green",
              flush=True)

    for kind, r in bad:
        print(f"FAIL {kind} {getattr(r, 'name', r)} :: {str(r)[:400]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
