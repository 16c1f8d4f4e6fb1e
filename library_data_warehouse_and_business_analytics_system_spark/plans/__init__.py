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
# Round-11 window (_R11_WINDOW, 50 = the first 50 registry entries):
#   1. _R11_FRONT (3): the r10-close registrations with no driver row
#      yet (bitext_margin_pairs, orders_schema_evolution,
#      orders_maintenance_cycle — judge-verified locally at sf0.01);
#      gating them first restores "every registered query
#      driver-green" (r10 verdict item 1).
#   2. 47 rotation slots, stalest first: the whole 30-row r7-cohort
#      tail (_R7_GREEN[20:], last green r7), then 17 r8-cohort rows
#      FIFO (r10 verdict item 2).
#
# Behind the window: the remaining 32 r8-cohort rows (fronting r12's
# rotation), then the r9/r10 cohorts in registration order -
# freshness invariant: once the r11 rotation lands, no green row is
# older than round 8, and r12+r13 retire the r8/r9 backlog on the
# same schedule.
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

# The round whose 50-slot window the committed ordering encodes.
# tests/test_plan_quality.py derives its green-set cutoff from THIS
# constant (r9 verdict item 3: the manual duplicate went stale twice).
WINDOW_ROUND = 14

# New gate registered in r10 (growth otherwise frozen; the r9 verdict
# item 5 work item): ewma_scan's third routing mode (mode="split",
# hot keys ranged + tail grouped) under the driver's bit-exact hash.
_R10_NEW = ["events_daily_ewma_split"]

# Queries whose newest driver-green row is round 7 (all 50 of them;
# computed from CORRECTNESS_r01-r09), in the r9 registry order. After
# the r9 window refreshed 17 r6-cohort rows, the r6 tail
# (_R6_GREEN[17:], last green r6) is the stalest cohort and rotates
# first; these r7 rows are next-oldest and fill the remaining slots
# FIFO. The [20:] tail stays behind the window and fronts the r11
# rotation.
_R7_GREEN = [
    "quarterly_pivot", "order_size_distribution",
    "nation_list_per_region", "suppliers_of_large_shipments",
    "nation_customer_counts", "fact_surrogate_keys_audit",
    "date_function_surface", "acctbal_banding", "events_sessionize",
    "cube_order_stats", "grouping_sets_orders",
    "customer_spend_scd2_versions", "math_function_surface",
    "brand_revenue_share", "daily_order_window_frames",
    "order_price_percentiles", "order_quantity_arrays",
    "salted_event_type_counts", "approx_distinct_check",
    "regexp_function_surface", "approx_quantile_check",
    "orders_data_profile", "media_decode_stats", "media_frame_counts",
    "media_audio_stats", "minhash_lsh_pairs", "dedup_incremental",
    "boilerplate_line_scrub", "simhash_pairs", "lsh_ann_topk",
    "ivf_ann_topk", "embedding_near_dups_strict", "dedup_clusters",
    "doc_hash_split", "top_tokens_per_lang", "source_token_budget",
    "doc_token_familiarity", "temperature_mixture_sample",
    "dedup_kept_corpus", "doc_ngram_novelty", "srp_diverse_sample",
    "events_sliding_1h30m", "events_interval_join", "events_funnel",
    "events_asof_purchase_view", "lqy_query1", "lqy_query2",
    "lqy_query3", "merge_upsert_orders", "merge_parts_orders",
]

# The 50-slot r10 window: the one red r9 row re-gates first
# (oracle-side HUGEINT/BIGINT cast, fixed this round), then the two
# never-gated ANN index gates, the new split-mode gate, the 26
# stalest green rows (r6 cohort, last green r6), and 20 slots of
# r7-cohort rotation FIFO.
_R10_WINDOW = (["bpe_pair_stats"] + _R10_FRONT + _R10_NEW
               + _R6_GREEN[17:] + _R7_GREEN[:20])

# Registered at the r10 close, pinned immediately after the r10
# window so they front the r11 rotation (the _R9_FRONT/_R10_FRONT
# convention): margin-based bitext mining (operators/bitext.py), the
# merge-schema snapshot read, and the composed maintenance cycle
# (checkpoint → truncate → expire → vacuum over a merged partitioned
# table) — the txlog axes without driver rows until now.
_R11_FRONT = ["bitext_margin_pairs", "orders_schema_evolution",
              "orders_maintenance_cycle"]

# Queries whose newest driver-green row is round 8 (49 = the r8
# window minus returnflag_priority_counts, which re-gated r9),
# verified against CORRECTNESS_r01-r10: latest-green distribution is
# exactly r7:30 / r8:49 / r9:49 / r10:50 with the 3 _R11_FRONT rows
# never gated. FIFO = _R8_WINDOW registration order.
_R8_GREEN = [n for n in _R8_WINDOW if n != "returnflag_priority_counts"]

# The 50-slot r11 window (r10 verdict items 1-2): the 3 never-gated
# r10-close registrations gated FIRST (restoring "every registered
# query driver-green"), then 47 rotation slots stalest-first — the
# whole 30-row r7-cohort tail plus 17 r8-cohort rows FIFO. Landed
# 50/50 green (CORRECTNESS_r11): no green row older than round 8.
_R11_WINDOW = _R11_FRONT + _R7_GREEN[20:] + _R8_GREEN[:17]

# Registry growth unfroze for exactly the two pytest-only production
# postures the r11 verdict ordered under the driver hash (items 2-3):
# the SRP bucket_cap survivor-sample mine and the ANN cross-cell
# on_move="reroute" upsert. Registered mid-r12, so they gate FIRST in
# the r12 window (the _R9_NEW/_R10_NEW convention — new gates join
# their own round's window rather than waiting behind it).
_R12_NEW = ["bitext_margin_pairs_capped", "ann_index_reroute"]

# Queries whose newest driver-green row is round 9 (49 = the r9
# window minus bpe_pair_stats, whose r9 row was red — oracle-side
# HUGEINT cast — and which re-gated green in r10), FIFO in the r9
# window order. Verified against CORRECTNESS_r01-r11: latest-green
# distribution entering r12 is exactly r8:32 / r9:49 / r10:50 /
# r11:50 with every registered query green at least once.
_R9_GREEN = [n for n in _R9_WINDOW if n != "bpe_pair_stats"]

# The 50-slot r12 window (r11 verdict items 1-3): the 2 new
# production-posture gates first, then 48 rotation slots stalest
# first — the whole remaining 32-row r8 cohort plus 16 r9-cohort
# rows FIFO. Landed 50/50 green (CORRECTNESS_r12): no green row
# older than round 9.
_R12_WINDOW = _R12_NEW + _R8_GREEN[17:] + _R9_GREEN[:16]

# Registry growth unfroze for exactly the composed-lifecycle gate the
# r12 verdict ordered (item 4): ann_index_full_cycle chains the
# already-gated build/upsert (r10), MoR delete (r11), and
# resurrect+reroute (r12) with a forced-rebuild maintenance pass
# under ONE exact-full-probe hash. Registered mid-r13, so it gates
# FIRST in the r13 window (the _R9_NEW/_R10_NEW/_R12_NEW convention).
_R13_NEW = ["ann_index_full_cycle"]

# Queries whose newest driver-green row is round 10 (all 50 rows of
# the r10 window — none re-gated since), FIFO in the r10 window
# order. Verified against CORRECTNESS_r01-r12: latest-green
# distribution entering r13 is exactly r9:33 / r10:50 / r11:50 /
# r12:50 with every registered query green at least once.
_R10_GREEN = list(_R10_WINDOW)

# The 50-slot r13 window (r12 verdict items 1 + 4): the new composed
# gate first, then 49 rotation slots stalest first — the whole
# remaining 33-row r9 cohort plus 16 r10-cohort rows FIFO. After r13
# landed (50/50 green, CORRECTNESS_r13), no green row is older than
# round 10.
_R13_WINDOW = _R13_NEW + _R9_GREEN[16:] + _R10_GREEN[:16]

# Queries the r13 OPTIMIZATION round rewrote whose r13 gate rows were
# scheduled before the rewrites landed (the r13 verdict "What's wrong"
# item 2): last driver-green r12, rewritten r13, covered in-round only
# by repo-side oracle runs. They gate FIRST in r14 so the driver
# confirms the rewrites (r13 verdict "Next round" item 2).
_R14_REWRITTEN = [
    "tfidf_top_terms", "copurchase_pagerank", "copurchase_triangles",
    "item_cf_similar_parts", "order_price_outliers", "pq_ann_topk",
    "exact_substring_scrub", "semantic_dedup_pairs",
]

# Queries whose newest driver-green row is round 11 (all 50 rows of
# the r11 window — none re-gated since), FIFO in the r11 window order.
_R11_GREEN = list(_R11_WINDOW)

# The 50-slot r14 window (r13 verdict item 2): the 8 r13-rewritten
# queries first (driver confirmation of the optimization round's
# edits), then 42 rotation slots stalest first — the whole remaining
# 34-row r10 cohort plus 8 r11-cohort rows FIFO. After r14 lands, no
# green row is older than round 11; r15 retires the remaining 42 r11
# rows + the r12 cohort head on the same schedule.
_R14_WINDOW = _R14_REWRITTEN + _R10_GREEN[16:] + _R11_GREEN[:8]

# No round-close registrations pinned behind the window yet.
_R15_FRONT: list[str] = []


def _reorder() -> None:
    listed = set(_R14_WINDOW) | set(_R15_FRONT) | set(_R11_GREEN)
    ordered = (
        [n for n in _R14_WINDOW if n in QUERIES]
        + [n for n in _R15_FRONT if n in QUERIES]
        # stalest-first behind the window: the r11 cohort remainder
        # fronts the r15 rotation.
        + [n for n in _R11_GREEN[8:] if n in QUERIES]
        # r12/r13-green tail (and anything newly registered but
        # unlisted - none expected): registration order.
        + [n for n in QUERIES if n not in listed]
    )
    snapshot = dict(QUERIES)
    QUERIES.clear()
    QUERIES.update({n: snapshot[n] for n in ordered})


_reorder()

__all__ = ["QUERIES", "QuerySpec", "register"]
