"""Cross-key consistency for the IVF+PQ composed index (round 8).

The oracle proves engine parity; these pin the COMPOSITION contract:
IVF+PQ scores exactly the IVF candidate set, with exactly the ADC
distances the global PQ search computes for the same pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_hdfs_spark.queries import load_all

REG = load_all()


def test_ivfpq_scores_subset_of_global_adc(spark, sf_dir):
    """Every (probe, vec, adc_dist) IVF+PQ emits must carry the SAME
    distance the unrestricted ADC search assigns that pair — cell
    routing may only prune candidates, never change a score."""
    ivfpq = REG["sim_ivf_pq_topk"].spark(spark, sf_dir).toPandas()
    adc = REG["sim_pq_adc_topk"].spark(spark, sf_dir)
    # re-rank the global ADC at unlimited k is not exposed; instead
    # recompute via the shared helper without restriction at k large
    from duckdb_hdfs_spark.queries.similarity import _adc_topk
    from duckdb_hdfs_spark.queries._helpers import _t

    full = (
        _adc_topk(_t(spark, sf_dir, "embeddings"))
        .select("probe_id", "vec_id", "adc_dist")
        .toPandas()
    )
    lookup = {
        (int(r.probe_id), int(r.vec_id)): float(r.adc_dist)
        for r in full.itertuples()
    }
    assert len(ivfpq) > 0
    for r in ivfpq.itertuples():
        key = (int(r.probe_id), int(r.vec_id))
        if key in lookup:  # full is top-5-truncated; compare overlap
            assert abs(float(r.adc_dist) - lookup[key]) < 1e-9, key
    # sanity on the other key too (it must still run green)
    assert adc.count() > 0


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
