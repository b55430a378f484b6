"""Ragged-embeddings adversarial audit (round 10) — md5-gated 2% of
vectors truncated to 32 of 64 dims: the state a crashed writer, a
mid-migration re-embedding, or a mixed-model table leaves behind.

Two operator classes, two protocols (the dup_audit KEY_GRAIN
pattern):

- RAGGED-TOLERANT (21/36 embedding keys): ops whose vector folds ride
  the dot_sql ragged contract (iterate to greatest(len) → NULL
  product → NULL fold, identical to Spark's zip_with null padding) —
  swept against the RAW ragged copy and required green.
- FIXED_DIM (15/36, listed below): ops whose semantics assume one
  embedding dimensionality — PQ/ADC subspace slicing, per-dimension
  variance/centroid panels, whitening/PCA eigenbases, IVF codebooks,
  purity assignment.  A mixed-dim corpus is malformed INPUT for
  them; the production rule is DIMENSION ENFORCEMENT AT INGEST
  (filter len(embedding) = d, exactly like replay-dedupe for
  key-identity ops), and the audit enforces that protocol: the class
  is swept against the dim-filtered copy — a genuinely reduced
  corpus, NOT the clean data — and must be green there.

    python scripts/ragged_audit.py [--sf /root/testdata/sf0.001] [keys...]
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

DIM = 64
TRUNC = 32

#: fixed-dimension operators: swept under the dim-enforcement ingest
#: rule (see module docstring).  Every name must exist in the
#: registry (tests/test_null_robustness.py checks currency).
FIXED_DIM = {
    "emb_kmeans_update", "emb_pca_project", "dedup_semdedup",
    "sim_ivf_ann", "sim_recall_eval", "emb_pq_codes",
    "sim_pq_adc_topk", "sim_ivf_probe_sweep", "sim_ivf_cell_stats",
    "sim_ivf_pq_topk", "emb_whitening_check",
    "emb_label_centroid_cohesion", "emb_centroid_separation",
    "emb_dim_variance", "emb_cluster_purity",
}


def build_ragged_dir(sf_dir: str, dst: str) -> str:
    con = duckdb.connect()
    for t in TABLES:
        sel = "*"
        if t == "embeddings":
            sel = (
                "vec_id, CASE WHEN ('0x' || substr(md5('rg' || "
                "CAST(vec_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 2 "
                f"THEN embedding[1:{TRUNC}] ELSE embedding END AS embedding, "
                "label"
            )
        con.execute(
            f"COPY (SELECT {sel} FROM '{sf_dir}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return dst


def build_dim_enforced_dir(ragged_dir: str, dst: str) -> str:
    """Apply the ingest rule: only full-dimension vectors pass."""
    con = duckdb.connect()
    for t in TABLES:
        where = f" WHERE len(embedding) = {DIM}" if t == "embeddings" else ""
        con.execute(
            f"COPY (SELECT * FROM '{ragged_dir}/{t}.parquet'{where}) "
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

    dst = tempfile.mkdtemp(prefix="testdata_ragged_")
    build_ragged_dir(args.sf, dst)
    print(f"ragged copy at {dst}", flush=True)

    spark = get_spark("ragged-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    keys = [k for k in (args.keys or list(reg)) if k in reg]
    raw_keys = [k for k in keys if k not in FIXED_DIM]
    fd_keys = [k for k in keys if k in FIXED_DIM]

    results = run_all(spark, dst, names=raw_keys)
    bad = [r for r in results if not r.ok]

    fd_results = []
    if fd_keys:
        ddst = tempfile.mkdtemp(prefix="testdata_ragged_dimok_")
        build_dim_enforced_dir(dst, ddst)
        print(f"dim-enforced copy at {ddst} ({len(fd_keys)} fixed-dim ops)",
              flush=True)
        fd_results = run_all(spark, ddst, names=fd_keys)
        bad += [r for r in fd_results if not r.ok]

    total = len(results) + len(fd_results)
    print(f"{total - len(bad)}/{total} green")
    for r in bad:
        print(f"FAIL {getattr(r, 'name', r)} :: {str(r)[:400]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
