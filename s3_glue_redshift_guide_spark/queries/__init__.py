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
# in; the driver verifies exactly the FIRST 50 entries per round. After
# round 4 every registry query has at least one green driver row, so round
# 5's window does two jobs: (a) the round-5 NEWCOMERS go first (they have
# no driver evidence at all), and (b) the rest of the window rotates onto
# the 42 queries whose newest driver evidence is ROUND 1 — the relational/
# join/window/function core, three rounds of engine churn stale (VERDICT
# r4 directive #1). Everything else keeps its order past position 50 for
# future rotations.
_PRIORITY = [
    # -- new in round 5 (never driver-sampled) ------------------------------
    "src_deletion_vector", "sink_snapshot_update_mor", "src_schema_rename",
    "llm_bpe_merges", "llm_bpe_encode", "src_dynamic_partition_pruning",
    "join_aqe_skew", "src_snapshot_concurrent_writers",
    # -- round-1-stale regression re-checks (42): newest evidence is r1 ----
    # (q3/q5 are NOT re-listed here: both were re-verified in round 4 and
    # are bench headliners, so the 8 newcomers take their two slots)
    # TPC-H-shaped relational core
    "q6_forecast_revenue",
    "q10_returned_items", "q12_priority_shipping",
    # projection / ETL typing
    "p_change_schema", "p_filter_predicates", "etl_string_first_typing",
    # join family
    "join_left_outer", "join_right_outer", "join_full_outer",
    "join_semi_exists", "join_anti_not_exists", "join_theta",
    "join_cross", "join_range_events", "join_asof_events",
    # aggregate family
    "agg_stats", "agg_count_distinct", "agg_minmax_by", "agg_rollup",
    "agg_cube", "agg_dedup_distinct", "agg_pivot",
    # window / sort / set-op family
    "win_rank_topk", "win_lag_lead", "win_running_frames",
    "win_ntile_percent", "sort_limit_topk",
    "setop_union", "setop_union_all_counts", "setop_intersect",
    "setop_except",
    # function suites
    "fn_string", "fn_datetime", "fn_math", "fn_conditional", "fn_json",
    "fn_unpivot", "fn_posexplode_map", "fn_map_entries",
    "fn_fuzzy_levenshtein",
    # streaming windows (r1-verified, engine-churn-sensitive)
    "ev_tumbling_window", "ev_sliding_window",
]
_ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
_ordered.update({n: q for n, q in REGISTRY.items() if n not in _ordered})
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "Query", "query", "spark_queries", "oracle_queries"]
