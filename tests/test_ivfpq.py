"""Cross-key consistency for the IVF+PQ composed index (round 8).

The oracle proves engine parity; these pin the COMPOSITION contract:
IVF+PQ scores exactly the IVF candidate set, with exactly the ADC
distances the global PQ search computes for the same pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from duckdb_hdfs_spark.queries import load_all

REG = load_all()


def _np_adc_dist(mat, ids):
    """From-scratch NumPy PQ: md5-sampled 16-entry codebook, 8
    subspaces of 8 dims, argmin squared-L2 codes (tie on cent_id),
    and a function giving the ADC distance the engine should report
    for any (probe_row, vec_row) — per-subspace probe-to-centroid
    distances rounded to 9 decimals, summed, output-rounded to 6
    (the _adc_topk rounding contract)."""
    import hashlib

    order = np.argsort(
        [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    )
    cent_ids = ids[order[:16]]
    cents = mat[order[:16]]
    csort = np.argsort(cent_ids)
    codes = np.empty((len(ids), 8), dtype=np.int64)  # codebook INDEX
    for m in range(8):
        sl = slice(m * 8, (m + 1) * 8)
        d = ((mat[:, None, sl] - cents[None, csort, sl]) ** 2).sum(axis=2)
        codes[:, m] = csort[np.argmin(d, axis=1)]  # cent_id-asc ties

    def dist(p_row: int, v_row: int) -> float:
        total = 0.0
        for m in range(8):
            sl = slice(m * 8, (m + 1) * 8)
            c = cents[codes[v_row, m], sl]
            total += round(float(((mat[p_row, sl] - c) ** 2).sum()), 9)
        return round(total, 6)

    return dist


def test_ivfpq_adc_distances_match_numpy(spark, sf_dir):
    """Every (probe, vec, adc_dist) IVF+PQ emits must carry exactly
    the ADC distance a from-scratch NumPy PQ rederivation assigns
    that pair — EVERY output row is checked, not just the overlap
    with the global top-5 (round-8 review: the overlap-only compare
    could pass with zero pairs actually verified)."""
    out = REG["sim_ivf_pq_topk"].spark(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    row_of = {int(i): r for r, i in enumerate(ids)}
    dist = _np_adc_dist(mat, ids)
    assert len(out) > 0
    for r in out.itertuples():
        expect = dist(row_of[int(r.probe_id)], row_of[int(r.vec_id)])
        assert abs(float(r.adc_dist) - expect) < 2e-6, (
            r.probe_id, r.vec_id, r.adc_dist, expect)


def test_ivfpq_respects_cell_routing(spark, sf_dir):
    """Every emitted neighbor must live in one of its probe's nprobe=2
    nearest cells — re-derived from the shared assignment helper."""
    from duckdb_hdfs_spark.functions.vectors import norm
    from duckdb_hdfs_spark.operators.similarity import (
        assign_nearest,
        centroid_codebook,
    )
    from duckdb_hdfs_spark.queries._helpers import _t

    emb = _t(spark, sf_dir, "embeddings")
    cent = centroid_codebook(emb, 16).localCheckpoint(eager=True)
    cells = assign_nearest(
        emb.select("vec_id", F.col("embedding").alias("e"),
                   norm(F.col("embedding")).alias("n")),
        cent, "e", "n", top=1,
    ).select("vec_id", "cent_id").toPandas()
    probe_cells = assign_nearest(
        emb.filter(F.col("vec_id") % 100 == 0).select(
            "vec_id", F.col("embedding").alias("e"),
            norm(F.col("embedding")).alias("n")),
        cent, "e", "n", top=2,
    ).select("vec_id", "cent_id").toPandas()
    cell_of = dict(zip(cells["vec_id"], cells["cent_id"]))
    probed = probe_cells.groupby("vec_id")["cent_id"].apply(set).to_dict()
    out = REG["sim_ivf_pq_topk"].spark(spark, sf_dir).toPandas()
    for r in out.itertuples():
        assert cell_of[r.vec_id] in probed[r.probe_id], (
            r.probe_id, r.vec_id)
