"""Malformed-JSON adversarial audit (round 10) — md5-gated 2% of
events.props replaced with the payloads a truncated log line, a
mid-write crash, or a schema-drifting producer actually emits:

- '{"k": 1'        (truncated object — unterminated)
- 'not json at all'
- ''               (empty string)
- '{"k": "str"}'   (type confusion: string where ints flow)
- '{}'             (valid EMPTY object — round-11 advice: DuckDB's
                    array_to_string(json_keys('{}')) is NULL where
                    Spark's array_join(...) was ''; both sides now
                    guard empty key sets to NULL)
- '[1, 2, 3]'      (shape drift: array where an object flows)

What it caught (4 keys): DuckDB's json_extract/json_extract_string
RAISE InvalidInput on malformed payloads where Spark's
get_json_object NULLs (fixed: json_valid CASE guards in the
oracles), DuckDB's CAST of a type-confused extraction raises (fixed:
TRY_CAST), Spark's ANSI cast of the extracted 'str' raises (fixed:
try_cast), and the variant surface aborting instead of quarantining
(fixed: try_parse_json + try_variant_get, with schema introspection
asserted on the well-formed generator shape and NULL elsewhere on
both engines).

    python scripts/json_audit.py [--sf /root/testdata/sf0.001] [keys...]
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

PROPS = (
    "CASE WHEN ('0x' || substr(md5('js' || CAST(event_id AS VARCHAR)), 1, 4))::BIGINT "
    "% 100 < 2 THEN "
    " CASE event_id % 6 "
    "  WHEN 0 THEN '{\"k\": 1' "
    "  WHEN 1 THEN 'not json at all' "
    "  WHEN 2 THEN '' "
    "  WHEN 3 THEN '{\"k\": \"str\"}' "
    "  WHEN 4 THEN '{}' "  # valid EMPTY object (round-11 advice)
    "  ELSE '[1, 2, 3]' END "
    "ELSE props END AS props"
)

SPECS = {"events": f"event_id, ts, user_id, event_type, value, {PROPS}"}


def build_json_dir(sf_dir: str, dst: str) -> str:
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

    dst = tempfile.mkdtemp(prefix="testdata_json_")
    build_json_dir(args.sf, dst)
    print(f"malformed-JSON copy at {dst}", flush=True)

    spark = get_spark("json-audit")
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
