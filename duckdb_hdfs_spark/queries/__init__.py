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
# Keep this list at exactly ≤50 names.  Round-12 allocation (the
# round-11 verdict's tasks #1 and #4, verbatim): the one NEW key this
# round (pipeline_ingest_hardening — sources/ingest.py promoted to a
# driver-checked composition) leads, then ALL 27 keys whose latest
# row is round 5 (CORRECTNESS_r05 window order), then the 22 OLDEST
# round-6 keys (CORRECTNESS_r06 window order).  After this round
# lands, no key's latest driver row predates round 6.  All 50
# verified green at driver-condition sf0.01 before rotation.
_DRIVER_PRIORITY = (
    # --- the new round-12 key (never driver-checked) ---
    "pipeline_ingest_hardening",
    # --- the 27 r5-stale keys (CORRECTNESS_r05 order) ---
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_supplier_value",
    "q13_cust_order_distribution",
    "q15_top_supplier",
    "q16_brand_type_counts",
    "q17_small_qty_revenue",
    "q18_large_volume_cust",
    "q19_disjunctive_preds",
    "q20_part_supplier_ship",
    "q21_waiting_orders",
    "q22_acctbal_opportunity",
    "win_topk_per_group",
    "win_lag_delta",
    "rollup_sales",
    "cube_sales",
    "grouping_sets_sales",
    "pivot_event_types",
    "distinct_users_exact",
    "sql_cte_chain",
    "win_rank_functions",
    "grouping_id_sales",
    "fs_read_json",
    "fs_glob",
    # --- the 22 oldest r6-stale keys (CORRECTNESS_r06 order) ---
    "pipeline_corpus_release",
    "dedup_graph_pagerank",
    "dq_referential_audit",
    "dq_rule_violations",
    "streaming_late_event_drops",
    "streaming_cdc_apply",
    "streaming_sliding_counts",
    "streaming_hll_rollup",
    "streaming_left_outer_join",
    "streaming_session_timeout",
    "streaming_partitioned_sink",
    "streaming_complete_topk",
    "mm_decode_real",
    "mm_decode_wav",
    "mm_audio_frame_energy",
    "mm_image_patch_grid",
    "mm_media_router",
    "dedup_lsh_band_sweep",
    "sim_ivf_probe_sweep",
    "dedup_lsh_recall_eval",
    "dedup_winnowing",
    "dedup_simhash_pairs",
)

# Round-13+ rotation pool — stale re-verification oldest-first after
# any keys added that round.  Remaining r6-latest keys (28, in their
# CORRECTNESS_r06 window order): sim_range_search, text_bigram_logprob,
# sql_math_funcs, sql_filtered_aggs, sql_bit_funcs, sql_pattern_match,
# sql_string_agg, sql_nested_types, sql_lateral_join, sql_distinct_on,
# sql_try_cast, sql_json_funcs, sql_any_all, sql_hash_funcs,
# sql_dayofweek_normalized, sql_union_by_name, sql_paginated_topn,
# sql_variant_type, sql_array_mutation_funcs, sql_map_funcs,
# sketch_bloom_filter, sketch_count_min, sketch_hll_intersection,
# sketch_hll_rolling_wau, sketch_cms_join_size, cdc_snapshot_at,
# cdc_incremental_agg, cdc_reordered_apply;
# then the r7 set (50 keys), then r8, etc.


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
