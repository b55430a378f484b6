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
# Keep this list at exactly ≤50 names.  Round-6 allocation (VERDICT r5
# "Next round" #1): 50 of the 116 round-5 additions that have NEVER
# had a driver CORRECTNESS row, highest-novelty/highest-risk first —
# pipeline_corpus_release, the graph/dq modules, all 8 new streaming
# keys, the 5 real-decode multimodal keys, the LSH/IVF sweeps, then
# the sqlfuncs parity classes and the round-5 sketch/cdc/embedding
# waves.  The remaining 66 never-checked keys rotate in round 7.
_DRIVER_PRIORITY = (
    # --- end-to-end pipeline + graph + data-quality (4) ---
    "pipeline_corpus_release",
    "dedup_graph_pagerank",
    "dq_referential_audit",
    "dq_rule_violations",
    # --- round-5 streaming keys (8) ---
    "streaming_late_event_drops",
    "streaming_cdc_apply",
    "streaming_sliding_counts",
    "streaming_hll_rollup",
    "streaming_left_outer_join",
    "streaming_session_timeout",
    "streaming_partitioned_sink",
    "streaming_complete_topk",
    # --- real-decode multimodal keys (5) ---
    "mm_decode_real",
    "mm_decode_wav",
    "mm_audio_frame_energy",
    "mm_image_patch_grid",
    "mm_media_router",
    # --- calibration sweeps + high-risk dedup/sim evals (7) ---
    "dedup_lsh_band_sweep",
    "sim_ivf_probe_sweep",
    "dedup_lsh_recall_eval",
    "dedup_winnowing",
    "dedup_simhash_pairs",
    "sim_range_search",
    "text_bigram_logprob",
    # --- sqlfuncs parity classes (18) ---
    "sql_math_funcs",
    "sql_filtered_aggs",
    "sql_bit_funcs",
    "sql_pattern_match",
    "sql_string_agg",
    "sql_nested_types",
    "sql_lateral_join",
    "sql_distinct_on",
    "sql_try_cast",
    "sql_json_funcs",
    "sql_any_all",
    "sql_hash_funcs",
    "sql_dayofweek_normalized",
    "sql_union_by_name",
    "sql_paginated_topn",
    "sql_variant_type",
    "sql_array_mutation_funcs",
    "sql_map_funcs",
    # --- round-5 sketches (5) ---
    "sketch_bloom_filter",
    "sketch_count_min",
    "sketch_hll_intersection",
    "sketch_hll_rolling_wau",
    "sketch_cms_join_size",
    # --- round-5 cdc (3) ---
    "cdc_snapshot_at",
    "cdc_incremental_agg",
    "cdc_reordered_apply",
)

# Round-7 rotation pool — the 67 keys with no driver CORRECTNESS row
# after round 6 (66 round-5 leftovers + the round-6 mm_decode_gif).
# Rotate 50 of these into _DRIVER_PRIORITY next round; the remaining
# 17 (plus any stale re-verifies) go in round 8:
#   dedup: cc_size_histogram, embedding_clusters, pair_triangles,
#     embedding_threshold_sweep, chain_capture_eval, shingle_sensitivity
#   sim/emb: mutual_knn_graph, knn_label_accuracy, matryoshka_recall,
#     ivf_cell_stats, jl_project, label_centroid_cohesion,
#     centroid_separation, dim_variance, cluster_purity
#   text: code_detection, tokenizer_fertility, pii_prevalence
#   orders/stats: pareto_deciles, asof_left_view_purchase, welch_ttest,
#     cohort_revenue, first_touch_attribution, repeat_intervals,
#     market_basket, priority_drift, abc_class, monthly_growth,
#     segment_migration, concentration_hhi, seasonality_index,
#     linear_regression
#   fs: bucketed_join, compact_small_files, read_csv_malformed,
#     typed_roundtrip, read_json_nested, summarize_table,
#     parquet_codecs, sql_join_views
#   events: user_decile, burst_flags, cumulative_users, anomaly_mad,
#     stickiness, anomaly_ewma, session_paths, daily_conversion_wilson,
#     active_streaks, funnel_windowed, new_vs_returning,
#     gap_filled_daily, linear_attribution, user_entropy,
#     conversion_survival, bot_score_panel
#   windows: value_range_frame, locf_ignore_nulls, nulls_ordering
#   corpus: source_overlap, temperature_mix, length_drift_by_source,
#     quality_dup_calibration, shard_planner, vocab_growth,
#     quality_rule_ablation
#   multimodal: mm_decode_gif (round-6 addition)


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
