r"""Whitespace-class adversarial audit (round 10), same protocol as
the NULL / unicode / tiny-data / extreme-values audits: perturb a
copy of sf0.001's documents with VERTICAL-TAB-bearing text — the one
BMP codepoint where Java regex ``\s`` (Spark) and RE2 ``\s`` (DuckDB
string_split_regex) disagree (tests/test_ws_sweep.py) — run the FULL
registry parity sweep against it, and report every key whose Spark
and DuckDB results diverge.

Without the ``_WS_SRC`` pre-translate (functions/hashing.py), Spark
splits a token at U+000B while DuckDB keeps it inside the token, so
every token count, shingle hash, minhash signature, langid call, and
content fingerprint over VT-bearing text diverges silently.  Scraped
corpora DO contain vertical tabs (PDF text extraction, terminal
dumps, Excel exports), so this is a plausible-data audit, not a
constructed one.

Perturbations (deterministic, md5-gated 2% like the other audits),
documents.text by doc_id%3:

- every space replaced by VT (the all-VT whitespace document);
- one inter-word space replaced by VT (a single divergent token);
- a trailing ``'x' || VT || 'y'`` appendix (VT between non-space
  tokens, exercising token-content divergence, not just counts).

    python scripts/ws_audit.py [--sf /root/testdata/sf0.001] [keys...]
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

TEXT_CASE = (
    "CASE WHEN ('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 2 THEN "
    " CASE doc_id % 3 "
    "  WHEN 0 THEN replace(text, ' ', chr(11)) "
    "  WHEN 1 THEN regexp_replace(text, ' ', chr(11)) "
    "  ELSE (text || 'x' || chr(11) || 'y') END "
    "ELSE text END AS text"
)

SPECS = {
    "documents": f"doc_id, {TEXT_CASE}, lang, source, n_chars",
}


def build_ws_dir(sf_dir: str, dst: str) -> str:
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

    dst = tempfile.mkdtemp(prefix="testdata_ws_")
    build_ws_dir(args.sf, dst)
    print(f"perturbed copy at {dst}", flush=True)

    spark = get_spark("ws-audit")
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
