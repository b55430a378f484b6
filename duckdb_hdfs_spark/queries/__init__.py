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
# Keep this list at exactly ≤50 names.  Round-11 allocation (the
# round-10 verdict's task #1, verbatim): the 2 round-10 keys that
# have never had a driver row lead, then ALL 25 keys whose latest
# row is round 4 (CORRECTNESS_r04 window order), then the 23 OLDEST
# round-5 keys (CORRECTNESS_r05 window order).  After this round
# lands, every one of the 327 registered keys has at least one green
# driver row and no key's latest row predates round 5.  All 50
# verified green at driver-condition sf0.01 before rotation.
_DRIVER_PRIORITY = (
    # --- the 2 never-driver-checked round-10 keys ---
    "sql_recursive_cte",
    "sql_epoch_calendar_funcs",
    # --- the 25 r4-stale keys (CORRECTNESS_r04 order) ---
    "streaming_dedup_users",
    "streaming_user_totals",
    "streaming_view_purchase_join",
    "streaming_session_windows",
    "streaming_static_enrich",
    "fs_ls",
    "ev_tumbling_counts",
    "ev_sessionize",
    "ev_funnel",
    "ev_retention",
    "ev_top_users",
    "ev_json_props",
    "ev_anomaly_zscore",
    "ev_rolling_dau",
    "ev_cohort_retention",
    "win_time_range_frame",
    "win_moving_avg",
    "win_running_total",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q12_priority_lateness",
    "q14_promo_revenue",
    "fs_read_csv",
    # --- the 23 oldest r5-stale keys (CORRECTNESS_r05 order) ---
    "text_unigram_logprob",
    "text_token_entropy",
    "dedup_containment",
    "sample_quality_resample",
    "corpus_dataset_card",
    "text_length_histogram",
    "corpus_token_budget",
    "emb_whitening_check",
    "emb_pq_codes",
    "sim_pq_adc_topk",
    "sim_norm_outliers",
    "dedup_lsh_bucket_stats",
    "cdc_merge_with_deletes",
    "win_first_last",
    "sql_higher_order_funcs",
    "ev_user_lifetime",
    "ev_markov_transitions",
    "ev_inter_event_times",
    "ev_hourly_profile",
    "asof_view_next_purchase",
    "orders_rfm_scores",
    "fs_read_binary",
    "q2_part_supplier_stats",
)

# Round-12+ rotation pool — stale re-verification oldest-first after
# any keys added that round.  Remaining r5-latest keys (27, in their
# CORRECTNESS_r05 window order): q4_order_priority, q7_volume_shipping,
# q8_market_share, q9_product_profit, q10_returned_items,
# q11_supplier_value, q13_cust_order_distribution, q15_top_supplier,
# q16_brand_type_counts, q17_small_qty_revenue, q18_large_volume_cust,
# q19_disjunctive_preds, q20_part_supplier_ship, q21_waiting_orders,
# q22_acctbal_opportunity, win_topk_per_group, win_lag_delta,
# rollup_sales, cube_sales, grouping_sets_sales, pivot_event_types,
# distinct_users_exact, sql_cte_chain, win_rank_functions,
# grouping_id_sales, fs_read_json, fs_glob;
# then the r6 set (50 keys), then r7, etc.


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
