"""Query registry package — importing this package registers every query.

Modules register themselves via the ``@query`` decorator in ``registry``;
add new modules to ``_MODULES`` as operator families land.
"""

from __future__ import annotations

from importlib import import_module

from .registry import REGISTRY, Query, oracle_queries, query, spark_queries

_MODULES = [
    "relational",
    "projection_suite",
    "join_suite",
    "agg_suite",
    "window_suite",
    "function_suite",
    "event_suite",
    "llm_suite",
    "udf_suite",
    "sql_suite",
    "maintenance_suite",
    "sink_suite",
    "source_suite",
    "stream_suite",
    "timeseries_suite",
    "dq_suite",
    "analytics_suite",
    "curation_suite",
    "sketch_suite",
    "graph_suite",
    "stats_suite",
]

for _m in _MODULES:
    import_module(f"{__name__}.{_m}")

# Registry iteration order is the order the grading driver checks queries
# in; the driver verifies exactly the FIRST 50 entries per round. Round
# 11's window (VERDICT r10 directive #1): (a) the 29 rows whose newest
# driver evidence is round 5 — the five snapshot-layer rows lead because
# they sit on five rounds of churned code (DVs served through bucketed
# views, union-schema rename maps, rebase, checkpoints), then the 24
# core-relational/function/window rows; (b) NEW round-11 feature rows,
# so they get driver evidence the round they land; (c) the
# round-6-evidence cohort in its round-6 driver order — the leading rows
# fill the window to 50 and the rest queue contiguously for round 12
# (the contiguity invariant tests/test_registry_window.py enforces
# covers only never-verified rows; already-verified r6 rows may straddle
# the 50-boundary freely).
_PRIORITY = [
    # -- (a) round-5-evidence rows (29) — snapshot-layer five first --------
    "src_deletion_vector", "src_schema_rename", "sink_snapshot_update_mor",
    "src_dynamic_partition_pruning", "src_snapshot_concurrent_writers",
    "agg_pivot", "agg_dedup_distinct", "win_rank_topk", "win_lag_lead",
    "win_running_frames", "win_ntile_percent", "sort_limit_topk",
    "setop_union", "setop_union_all_counts", "setop_intersect",
    "setop_except", "fn_string", "fn_datetime", "fn_math",
    "fn_conditional", "fn_json", "fn_map_entries", "fn_unpivot",
    "fn_posexplode_map", "fn_fuzzy_levenshtein", "ev_tumbling_window",
    "ev_sliding_window", "llm_bpe_merges", "llm_bpe_encode",
    # -- (b) new round-11 feature rows (append here as they land) ----------
    "join_copartitioned_rewrite", "join_connector_broadcast_df",
    "join_copartitioned_dv_anti",
    # -- (c) round-6-evidence cohort (49): the leading rows fill the -------
    # -- window to 50, the rest queue for round 12 --------------------------
    "sql_recursive_cte", "q2_min_cost_supplier", "q8_market_share",
    "q9_product_profit", "q11_important_value", "q13_customer_orders_dist",
    "q15_top_supplier", "sql_volume_shipping", "sql_scalar_subquery",
    "sql_correlated_subquery", "sql_exists_subquery", "sql_in_having",
    "sql_or_of_ands", "sql_anti_scalar", "sql_promo_revenue",
    "sql_q21_waiting_suppliers", "src_restore", "src_shallow_clone",
    "src_nullcount_skipping", "src_rowgroup_pruning",
    "src_check_constraints", "src_stream_change_feed",
    "src_timestamp_as_of", "sink_connector_clustered_write",
    "sink_snapshot_merge_mor", "llm_canonical_selection",
    "src_generated_columns", "src_metadata_only_agg", "src_bloom_index",
    "rollup_mv_change_feed", "llm_dsir_resample", "stats_join_advisor",
    "llm_bigram_logprob", "src_table_history", "src_vacuum_retention",
    "src_partition_spec", "src_row_tracking", "stats_ndv_estimate",
    "src_copy_into", "src_type_widening", "src_branch_wap",
    "src_column_defaults", "src_identity_column", "ev_stream_outer_join",
    "llm_contamination_spans", "src_schema_enforcement", "src_deep_clone",
    "sink_merge_sync", "src_table_detail",
]
_ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
_ordered.update({n: q for n, q in REGISTRY.items() if n not in _ordered})
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "Query", "query", "spark_queries", "oracle_queries"]
