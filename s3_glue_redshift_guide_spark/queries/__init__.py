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
# 10's window (VERDICT r9 directive #1): (a) the 24 rows whose newest
# driver evidence is round 4 — five rounds of snapshot-layer churn
# (DVs, schema maps, checkpoints, rebase) since their last oracle check
# makes them the only open correctness exposure; (b) NEW round-10
# feature rows, so they get driver evidence the round they land; (c) the
# 50-query round-5-evidence cohort in registry order — the 24+new rows
# fill the first slots, the leading r5 rows take the remainder of the
# window, and the rest queue contiguously for round 11 (the contiguity
# invariant tests/test_registry_window.py enforces covers only
# never-verified rows; already-verified r5 rows may straddle the
# 50-boundary freely).
_PRIORITY = [
    # -- (a) round-4-evidence rows (24) — rotate-first directive -----------
    "llm_contamination_bloom", "llm_quality_classifier",
    "join_scd2_pointintime", "llm_normalized_dedup", "llm_vocab_oov",
    "src_time_travel", "sink_snapshot_stream", "src_surgical_delete",
    "sink_snapshot_merge", "src_change_feed", "src_manifest_pruning",
    "llm_weighted_sample", "llm_frame_sample",
    "ev_stream_dedup_watermark", "src_snapshot_incremental",
    "src_file_metadata", "dq_observe_metrics", "agg_grouping_sets",
    "fn_try_safe", "udf_arrow_scalar", "src_python_datasource",
    "sink_snapshot_optimize", "llm_word_bigrams",
    "src_stream_datasource",
    # -- (b) new round-10 feature rows (append here as they land) ----------
    "sql_verb_body_snapshot_refs", "sql_cluster_by_n_pruning",
    "join_copartitioned_rename", "sql_insert_overwrite",
    "llm_minhash_capped",
    # -- (c) round-5-evidence cohort (50): the leading rows fill the -------
    # -- window to 50, the rest queue for round 11 --------------------------
    "q6_forecast_revenue", "q10_returned_items", "q12_priority_shipping",
    "p_change_schema", "etl_string_first_typing", "p_filter_predicates",
    "join_left_outer", "join_right_outer", "join_full_outer",
    "join_semi_exists", "join_anti_not_exists", "join_theta",
    "join_cross", "join_range_events", "join_asof_events",
    "join_aqe_skew", "agg_stats", "agg_count_distinct",
    "agg_minmax_by", "agg_rollup", "agg_cube", "agg_pivot",
    "agg_dedup_distinct", "win_rank_topk", "win_lag_lead",
    "win_running_frames", "win_ntile_percent", "sort_limit_topk",
    "setop_union", "setop_union_all_counts", "setop_intersect",
    "setop_except", "fn_string", "fn_datetime", "fn_math",
    "fn_conditional", "fn_json", "fn_map_entries", "fn_unpivot",
    "fn_posexplode_map", "fn_fuzzy_levenshtein", "ev_tumbling_window",
    "ev_sliding_window", "llm_bpe_merges", "llm_bpe_encode",
    "sink_snapshot_update_mor", "src_dynamic_partition_pruning",
    "src_deletion_vector", "src_schema_rename",
    "src_snapshot_concurrent_writers",
]
_ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
_ordered.update({n: q for n, q in REGISTRY.items() if n not in _ordered})
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "Query", "query", "spark_queries", "oracle_queries"]
