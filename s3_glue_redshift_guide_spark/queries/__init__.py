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
]

for _m in _MODULES:
    import_module(f"{__name__}.{_m}")

__all__ = ["REGISTRY", "Query", "query", "spark_queries", "oracle_queries"]
