"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 registers one named query here:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are SQL-expressible) the equivalent ANSI SQL for the DuckDB oracle. The
driver compares the two at sf=0.01 by row count + schema + order-insensitive
value hash, so:

* every computed column is aliased identically on both sides;
* doubles are rounded on both sides before projection (sum order differs
  between engines);
* dates are projected as DATE, timestamps at microsecond precision (the
  value DuckDB produces for the ns-precision events table).

Queries that are not SQL-expressible (LSH internals, streaming state) omit
the oracle and get the driver's rows-only check; their semantics are covered
by pytest self-checks instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over views region/nation/.../embeddings
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None):
    """Register ``fn`` as the named query; idempotent re-registration wins
    last so test reloads don't error."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_queries() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
