"""File-split / multi-file-layout adversarial audit (round 11) — the
second layout degree of freedom after row order
(scripts/roworder_audit.py): every table rewritten as a DIRECTORY of
4 part files with rows md5-assigned to parts — the state every
distributed writer, compaction tier, and incremental-append pipeline
actually produces.  At 100 TB no table is one file; results must be
invariant to how rows are distributed across files (file read order,
per-file row groups, partition boundaries all move).

Checks per key (same dual protocol as the row-order audit):

1. PARITY on the split copy — Spark vs the DuckDB oracle, both
   reading the 4-part directories (DuckDB via explicit glob views,
   since a bare directory path is not auto-globbed);
2. INVARIANCE — spark(split) == spark(original single-file),
   canonicalized.

LAYOUT_DEFINED exclusion class: fs-layer keys whose CONTRACT is the
file layout itself (they enumerate, size, or whole-read the physical
files — a multi-file copy is a genuinely different filesystem state,
not the same table): these are swept for parity only against their
own layout semantics elsewhere (tests/test_fs_layer.py) and skipped
here.

    python scripts/filesplit_audit.py [--sf /root/testdata/sf0.001]
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

N_PARTS = 4

#: keys whose CONTRACT is the physical file layout (enumerate / size /
#: whole-read the files): a multi-file copy is a different filesystem
#: state by definition, not the same table in a different layout.
LAYOUT_DEFINED = {
    "fs_ls",              # emits per-file name/size rows
    "fs_glob",            # enumerates the matched file set
    "fs_read_binary",     # whole-file byte read of ONE file
    "fs_describe_tables", # per-table file size/metadata panel
    "fs_compact_small_files",  # its subject IS the file count
    "fs_parquet_codecs",  # writes/reads per-codec files it creates
}


def build_split_dir(sf_dir: str, dst: str) -> str:
    """Each table becomes ``{dst}/{t}.parquet/`` holding N_PARTS part
    files; rows are md5-assigned to parts (uncorrelated with any
    natural order), original order preserved within a part."""
    con = duckdb.connect()
    for t in TABLES:
        d = f"{dst}/{t}.parquet"
        os.makedirs(d, exist_ok=True)
        for i in range(N_PARTS):
            con.execute(
                f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet' "
                f" WHERE ('0x' || substr(md5('split' || CAST({KEY[t]} AS VARCHAR)), 1, 4))"
                f"::BIGINT % {N_PARTS} = {i}) "
                f"TO '{d}/part-{i:05d}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return dst


def glob_connection(split_dir: str) -> duckdb.DuckDBPyConnection:
    """The oracle connection for the split copy: explicit glob views
    (duckdb does not auto-glob a bare directory path)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{split_dir}/{t}.parquet/*.parquet'"
        )
    return con


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--skip-invariance", action="store_true")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from duckdb_hdfs_spark.oracle import CompareResult, compare
    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.session import get_spark

    # the invariance comparator is shared with the row-order audit
    import importlib.util as ilu

    ro_spec = ilu.spec_from_file_location(
        "roworder_audit",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "roworder_audit.py"),
    )
    ro = ilu.module_from_spec(ro_spec)
    ro_spec.loader.exec_module(ro)

    dst = tempfile.mkdtemp(prefix="testdata_filesplit_")
    build_split_dir(args.sf, dst)
    print(f"split copy at {dst} ({N_PARTS} parts per table)", flush=True)

    spark = get_spark("filesplit-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    keys = [k for k in (args.keys or list(reg)) if k in reg]
    for name in sorted(LAYOUT_DEFINED & set(keys)):
        print(f"SKIP {name} (LAYOUT_DEFINED — the file layout IS the contract)")
    keys = [k for k in keys if k not in LAYOUT_DEFINED]

    con = glob_connection(dst)
    bad, n = [], 0
    for name in keys:
        qd = reg[name]
        try:
            r = compare(name, qd.spark(spark, dst), con, qd.oracle)
        except Exception as e:  # noqa: BLE001
            r = CompareResult(name, False, -1, -1, [f"exception: {e!r:.300}"])
        n += 1
        if not r.ok:
            bad.append(("parity", r))
    print(f"parity: {n - len(bad)}/{n} green", flush=True)

    if not args.skip_invariance:
        inv_bad = 0
        for name in keys:
            qd = reg[name]
            try:
                r = ro.invariance_check(name, qd, spark, dst, args.sf)
            except Exception as e:  # noqa: BLE001
                r = CompareResult(name, False, -1, -1, [f"exception: {e!r:.300}"])
            if not r.ok:
                bad.append(("invariance", r))
                inv_bad += 1
        print(f"invariance: {len(keys) - inv_bad}/{len(keys)} green", flush=True)

    for kind, r in bad:
        print(f"FAIL {kind} {getattr(r, 'name', r)} :: {str(r)[:400]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
