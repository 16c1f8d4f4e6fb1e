from .registry import QUERIES, QuerySpec, register

# Importing the plan modules populates the registry.
from . import core_sql  # noqa: E402,F401
from . import core_sql2  # noqa: E402,F401
from . import core_sql3  # noqa: E402,F401
from . import core_sql4  # noqa: E402,F401
from . import core_sql5  # noqa: E402,F401
from . import core_sql6  # noqa: E402,F401
from . import analytics_ops  # noqa: E402,F401
from . import multimodal_ops  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import streaming_ops  # noqa: E402,F401
from . import library_gate  # noqa: E402,F401
from . import search_ops  # noqa: E402,F401

# Explicit gate ordering. The driver's correctness gate records 50
# rows per round in registry order (observed truncation at 50 since
# round 1), so the order below IS the rotation schedule.
#
# Round-9 window (_R9_WINDOW, 50 = the first 50 registry entries):
#   1. returnflag_priority_counts - the single red r8 row (oracle-side
#      HUGEINT/BIGINT cast, values verified identical by the r8 judge;
#      oracle fixed this round) re-gates first.
#   2. _R9_FRONT (28): the never-gated tail planned by r8 - analytics,
#      sampling, CDC/chunking/linkage/IVM/OHLC/DQ/BPE. After these go
#      green the driver-green union covers the whole pre-r9 registry.
#   3. The four gates REGISTERED this round (growth otherwise frozen;
#      all four are r8-verdict work items): events_daily_ewma_vec (the
#      production vectorize=True scan fold under a hash-exact gate,
#      verdict item 5) and the three lqy_query*_subtotals SQL*Plus
#      COMPUTE reports (verdict item 6).
#   4. 17 slots of r6-cohort rotation, FIFO (oldest green rows first).
#
# Behind the window: the remaining r6 cohort (r10 re-gates them), then
# the r7/r8 cohorts in registration order - freshness invariant: no
# green row older than three rounds once the r10 rotation lands.
# ann_index_lifecycle (registered later in r9, the persisted-ANN-index
# lifecycle gate) lands at the tail: it FRONTS the r10 window together
# with any other r9 registration that misses this round's 50 rows.
_R8_WINDOW = [
    # timeseries scans - operator rewritten this round (e33d79c)
    "events_daily_ewma", "events_daily_holt", "events_daily_cusum",
    "events_gapfill_interpolate",
    # new this round (the r7 verdict item 5)
    "embedding_covariance_spectrum",
    # transactional layer
    "txlog_time_travel", "incremental_agg_orders", "mor_delete_orders",
    "restore_orders_version", "clone_orders_isolated",
    "warehouse_consistent_read", "optimize_zorder_orders",
    "stats_skipping_orders", "parts_skipping_orders",
    "bloom_point_lookup", "incremental_minmax_orders",
    "bucketed_join_revenue",
    # batch-4/5/6 relational (TPC-H shapes)
    "waiting_suppliers", "top_revenue_supplier", "large_quantity_orders",
    "priority_pivot_unpivot", "window_value_functions",
    "array_function_surface", "nation_pair_revenue",
    "part_supplier_coverage", "shipping_priority_top10",
    "local_supplier_volume", "returned_item_top_customers",
    "dnf_predicate_revenue", "priority_late_order_counts",
    "forecast_revenue", "nation_profit_by_year",
    "returnflag_priority_counts", "customer_order_distribution",
    "promo_revenue_share", "small_quantity_revenue",
    "excess_stock_suppliers", "min_cost_supplier_parts",
    "important_parts_stock", "idle_rich_customers",
    # search / clustering / graph
    "bm25_search_topk", "tfidf_top_terms", "hybrid_rrf_search",
    "kmeans_assign_sizes", "semantic_dedup_pairs",
    "cluster_prototype_prune", "copurchase_pagerank",
    "copurchase_triangles",
    # heavy scrub / ANN
    "exact_substring_scrub", "pq_ann_topk",
]
_R9_FRONT = [
    "user_retention_cohorts", "parts_ordered_together",
    "weekly_active_users", "customer_value_deciles",
    "part_hierarchy_rollup", "keep_dense_rank_summary",
    "orders_category_gini", "order_price_histogram",
    "event_type_transitions", "order_price_outliers",
    "item_cf_similar_parts", "event_rate_anomalies",
    "event_type_weekday_chisq", "hard_negative_topk",
    "token_cms_estimates", "dedup_rate_by_source",
    "dsir_importance_weights", "cdc_chunk_dedup",
    "part_name_fuzzy_matches", "ivm_join_refresh",
    "self_repeat_scrub", "dedup_canonical_keep", "events_ohlc_15m",
    "cdc_orders_snapshot", "events_collapse_consecutive",
    "weighted_doc_sample", "dq_expectations_summary", "bpe_pair_stats",
]
_R6_GREEN = [
    "benchmark_contamination", "borrowing_not_exists_append",
    "cosine_topk", "customers_without_orders",
    "date_spine_daily_orders", "dedup_exact", "doc_bpe_token_counts",
    "doc_chunk_packing", "doc_fingerprint_dedup",
    "doc_repetition_scores", "doc_token_stats", "embedding_near_dups",
    "events_json_extract", "events_json_props",
    "events_session_windows", "events_tumbling_hourly",
    "lang_id_confusion", "lqy_query1_f", "lqy_query2_suppliers",
    "lqy_query3_states", "lsh_ann_topk_forced", "market_share",
    "matryoshka_topk", "media_video_stats", "nation_set_ops",
    "ngram_jaccard_dups", "order_price_bands", "orders_scalar_subquery",
    "param_filter_orders", "pii_scrub_stats", "pricing_summary",
    "quality_topn_per_source", "region_status_universe",
    "revenue_by_nation", "rollup_year_quarter", "scd2_dimbook_apply",
    "stratified_doc_sample", "string_function_surface",
    "surrogate_keys_customers", "text_quality_scores",
    "top_customers_per_nation", "top_orders_global",
    "yoy_nation_revenue",
]


# New gates this round (r8 verdict items 5 and 6).
_R9_NEW = [
    "events_daily_ewma_vec",
    "lqy_query1_subtotals", "lqy_query2_subtotals", "lqy_query3_subtotals",
]

# The 50-slot r9 window: red-row re-gate + never-gated backlog + new
# gates + the oldest 17 green rows (r6 cohort, FIFO).
_R9_WINDOW = (["returnflag_priority_counts"] + _R9_FRONT + _R9_NEW
              + _R6_GREEN[:17])


# Never-gated r9 registrations that missed the 50-row window: pinned
# immediately after it, fronting the r10 window (the _R9_FRONT
# convention).
_R10_FRONT = ["ann_index_lifecycle", "ann_index_pruned_probe"]


def _reorder() -> None:
    listed = set(_R9_WINDOW) | set(_R10_FRONT) | set(_R6_GREEN)
    ordered = (
        [n for n in _R9_WINDOW if n in QUERIES]
        + [n for n in _R10_FRONT if n in QUERIES]
        + [n for n in _R6_GREEN[17:] if n in QUERIES]
        # r7/r8-green tail (and anything newly registered but
        # unlisted - none expected while growth is frozen):
        # registration order.
        + [n for n in QUERIES if n not in listed]
    )
    snapshot = dict(QUERIES)
    QUERIES.clear()
    QUERIES.update({n: snapshot[n] for n in ordered})


_reorder()

__all__ = ["QUERIES", "QuerySpec", "register"]
