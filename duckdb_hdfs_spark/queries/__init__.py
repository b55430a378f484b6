"""Query registry.

Every operator in SURVEY.md §2 registers here as a ``QueryDef``:
a Spark implementation ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a DuckDB oracle SQL string over the pre-registered
views ``region nation customer supplier part orders lineitem events
documents embeddings``.  The driver hash-compares the two at sf0.01;
``tests/`` run the same comparison at sf0.001.

Contract rules (driver compare is column-name-sorted value hash):
- alias every computed column identically on both sides;
- round floating aggregates identically on both sides (sums of
  doubles are order-sensitive; rounding makes them bit-stable);
- hash functions must be engine-portable: md5 hex (both engines
  produce identical lowercase hex) — never engine-native ``hash()``.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    spark: SparkQuery
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}

# Registration order matters: the driver's CORRECTNESS harness checks the
# first 50 registry entries only.  Rounds 1-2 led with tpch/windows/events
# (48 already-green keys), starving §2.5-2.10 of driver coverage.  Lead with
# the LLM-pipeline surface and demote the already-proven OLAP modules to
# the tail; the fine-grained window placement is _DRIVER_PRIORITY below.
_QUERY_MODULES = (
    "duckdb_hdfs_spark.queries.dedup",
    "duckdb_hdfs_spark.queries.similarity",
    "duckdb_hdfs_spark.queries.text",
    "duckdb_hdfs_spark.queries.advanced",
    "duckdb_hdfs_spark.queries.sqlfuncs",
    "duckdb_hdfs_spark.queries.multimodal",
    "duckdb_hdfs_spark.queries.fslayer",
    "duckdb_hdfs_spark.queries.streaming_q",
    "duckdb_hdfs_spark.queries.events",
    "duckdb_hdfs_spark.queries.windows",
    "duckdb_hdfs_spark.queries.tpch",
    # round-3 additions — rotated into the driver window in round 4
    # via _DRIVER_PRIORITY below.
    "duckdb_hdfs_spark.queries.llmextra",
    "duckdb_hdfs_spark.queries.layout",
    "duckdb_hdfs_spark.queries.cdc",
    "duckdb_hdfs_spark.queries.sketches",
    # round-4 additions — outside this round's driver window (which is
    # allocated to the round-3 tail + timestamp re-verifies); locally
    # oracle-checked, rotate into the window next round.
    "duckdb_hdfs_spark.queries.curation",
    # round-5 additions
    "duckdb_hdfs_spark.queries.graph",
    "duckdb_hdfs_spark.queries.dq",
)

# Names forced to the FRONT of the registry (in this order), ahead of
# everything else, so they land inside the driver's 50-entry window.
# Keep this list at exactly ≤50 names.  Round-9 allocation: round 8
# closed cumulative driver coverage at 275/275 (zero failures ever),
# so the window becomes (a) the operators ADDED this round — every
# new key earns its driver row the round it lands — and (b) stale
# re-verifies on fresh testdata, oldest driver coverage first: all 25
# keys whose latest row is round 3, then the oldest round-4 keys
# (tpch micro-set, cdc merge, heavy-hitter sketch) up to the 50 cap.
# All 50 verified green at driver-condition sf0.01 before rotation.
_DRIVER_PRIORITY = (
    # --- round-9 additions (eighth wave of this session) ---
    "dq_monotonic_id_audit",
    "graph_clustering_coeff",
    "ev_conversion_latency_quantiles",
    # --- round-9 additions (seventh wave of this session) ---
    "sql_regexp_funcs",
    "sample_neyman_allocation",
    "pack_efficiency_audit",
    "ev_anomaly_dow_adjusted",
    # --- round-9 additions (sixth wave of this session) ---
    "sim_hubness_koccurrence",
    "dq_iqr_outliers",
    "stats_cramers_v",
    "text_langid_metrics",
    # --- round-9 additions (fifth wave of this session) ---
    "stats_jarque_bera",
    "stats_ljung_box",
    "stats_runs_test",
    "text_term_burstiness",
    # --- round-9 additions (fourth wave of this session) ---
    "ev_power_mde",
    "stats_brown_forsythe",
    "sketch_linear_counting",
    "graph_degree_assortativity",
    # --- round-9 additions (third wave of this session) ---
    "ev_nelson_aalen",
    "stats_kendall_tau",
    "dq_benford_digits",
    "layout_zonemap_prune",
    # --- round-9 additions (second wave of this session) ---
    "stats_spearman_corr",
    "ev_gini_concentration",
    "text_zipf_slope",
    "text_readability",
    "sketch_kmv_jaccard",
    "stats_bh_fdr",
    "mm_audio_tone_probe",
    "emb_cosine_diversity",
    "dq_psi_drift",
    "ev_time_weighted_value",
    "layout_range_partition_stats",
    "stats_cohens_d",
    # --- the 15 earlier round-9 additions: never driver-checked ---
    "sketch_kmv_distinct",
    "text_gopher_rules",
    "stats_bootstrap_ci",
    "ev_cusum_changepoint",
    "stats_kruskal_wallis",
    "stats_theil_sen_slope",
    "corpus_perplexity_buckets",
    "layout_hilbert_tiles",
    "fs_write_orc",
    "mm_image_channel_stats",
    "ev_abtest_srm",
    "stats_anova_oneway",
    "stats_proportions_ztest",
    "graph_kcore",
    "dedup_substring_spans",
    # (the window is now ENTIRELY never-driver-checked keys: this
    # session's 23 additions + the 27 prior-session round-9 keys.
    # Displaced stale re-verifies: asof_purchase_last_view,
    # corpus_mix_sample, distinct_users_approx, ev_value_histogram,
    # fs_describe_tables, fs_read_parquet, fs_sql_path,
    # fs_write_parquet, mm_binary_meta,
    # mm_decode_features, mm_frame_sample, mm_resize,
    # pack_context_windows, range_join_view_purchases,
    # sample_hash_split, sql_array_funcs, sql_conditional_funcs,
    # sql_date_funcs, sql_set_ops, sql_string_funcs, stats_moments,
    # stats_quantiles, streaming_windowed_counts and
    # text_levenshtein_pairs / unpivot_event_metrics — all locally
    # green at sf0.001 + sf0.01; new keys always outrank stale
    # re-verification for window slots)
)

# Round-10+ rotation pool — after this round's window lands,
# coverage is total again (every key will have a driver row; zero
# failures ever).  Future windows = any keys added that round, then
# stale re-verification oldest-first: FIRST the 25 r3-stale keys
# displaced above (oldest driver rows in the repo), THEN
# the ~50 r4-latest keys — including the 10 earlier round-9 waves
# displaced from this window (q1_pricing_summary, q3_shipping
# _priority, q5_local_supplier_volume, q6_forecast_revenue,
# q12_priority_lateness, q14_promo_revenue, cdc_merge_orders,
# sketch_hll_distinct, sketch_heavy_hitters, text_tfidf_topk) —
# plus text_repetition / text_contamination / dedup_prefix_groups /
# sim_ann_filtered / cdc_scd2_priority_history /
# sketch_quantiles_approx / pipeline_quality_filter, the events and
# streaming r4 waves, the fs csv/orc/gzip/prune family,
# win_moving_avg / win_running_total / win_time_range_frame, and the
# emb/llmextra leftovers (bpe_pair_counts, emb_gram_matrix,
# emb_int8_quantize, emb_kmeans_update, emb_pca_project,
# sample_stratified_topk, skew_salted_event_stats, text_span_dedup,
# time_decay_engagement, layout_zorder_tiles); then the r5 set.


def _reorder(reg: dict[str, QueryDef]) -> dict[str, QueryDef]:
    ordered: dict[str, QueryDef] = {}
    for name in _DRIVER_PRIORITY:
        if name in reg:
            ordered[name] = reg[name]
    for name, qd in reg.items():
        if name not in ordered:
            ordered[name] = qd
    return ordered


def query(
    name: str, oracle: str | None = None, headline: bool = False
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query (+ optional oracle SQL)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(
            name=name, spark=fn, oracle=oracle, headline=headline, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every query module (idempotent) and return the registry,
    reordered so _DRIVER_PRIORITY names lead (driver 50-entry window)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return _reorder(REGISTRY)
