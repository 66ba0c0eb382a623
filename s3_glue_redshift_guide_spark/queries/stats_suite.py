"""Statistics / cost-based-planning queries (SURVEY.md §2 — catalog stats).

The reference's crawler persists ``recordCount`` / ``averageRecordSize`` /
``sizeKey`` table properties and the warehouse ANALYZEs tables so its
planner can pick distribution strategies. ``stats_table_sizing`` is the
engine-side equivalent: one aggregate pass per table computes row count and
a deterministic in-memory size estimate (integer arithmetic only — fixed
type widths plus octet_length for strings — so DuckDB reproduces every
byte), then applies the same strategy rule ``stats.choose_strategy`` uses:
broadcast below 128 KiB, shuffle-hash build below 2 MiB, else sort-merge.

The thresholds here are scaled to the sf0.01 gate so all three branches are
exercised; production planning goes through ``stats.plan_join`` where the
broadcast cutoff defaults to Spark's own 10 MiB conf value.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..stats import ROW_OVERHEAD, size_bytes_expr
from .registry import query

_TABLES = ("nation", "supplier", "customer", "orders", "lineitem")
_BROADCAST = 128 * 1024
_HASH = 16 * _BROADCAST


def _oracle_leg(name: str, fixed: int, str_cols: tuple[str, ...]) -> str:
    # DuckDB strlen() = byte length of a VARCHAR (its octet_length is
    # BLOB-only); matches Spark's octet_length on the same UTF-8 data
    strs = " + ".join(
        f"CASE WHEN {c} IS NULL THEN 0 ELSE strlen({c}) END" for c in str_cols
    )
    return f"""
    SELECT '{name}' AS table_name, count(*) AS n_rows,
           CAST(sum({fixed} + {strs}) AS BIGINT) AS data_bytes
    FROM {name}"""


_ORACLE = f"""
WITH sizing AS (
  {_oracle_leg("nation", 8, ("n_name",))}
  UNION ALL {_oracle_leg("supplier", 20, ("s_name",))}
  UNION ALL {_oracle_leg("customer", 20, ("c_name", "c_mktsegment"))}
  UNION ALL {_oracle_leg("orders", 32, ("o_orderstatus", "o_orderpriority"))}
  UNION ALL {_oracle_leg(
      "lineitem", 68, ("l_returnflag", "l_linestatus"))}
)
SELECT table_name, n_rows, data_bytes,
       data_bytes + n_rows * {ROW_OVERHEAD} AS est_bytes,
       CASE WHEN data_bytes + n_rows * {ROW_OVERHEAD} <= {_BROADCAST}
              THEN 'broadcast'
            WHEN data_bytes + n_rows * {ROW_OVERHEAD} <= {_HASH}
              THEN 'shuffle_hash'
            ELSE 'sort_merge' END AS join_strategy
FROM sizing
"""


@query("stats_table_sizing", oracle=_ORACLE)
def stats_table_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-equivalent sizing report driving join strategy. Five
    single-pass aggregates (count + byte-width sum, both partial-
    aggregatable: one reduce row per partition per table) unioned into a
    tidy report; the strategy CASE is the same rule stats.choose_strategy
    applies when planning a join against a larger fact side."""

    def sizing(name: str) -> DataFrame:
        df = load_table(spark, sf_dir, name)
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(size_bytes_expr(df)).cast("long").alias("data_bytes"),
        ).select(F.lit(name).alias("table_name"), "n_rows", "data_bytes")

    u = reduce(DataFrame.unionByName, [sizing(n) for n in _TABLES])
    est = F.col("data_bytes") + F.col("n_rows") * F.lit(ROW_OVERHEAD)
    return u.withColumn("est_bytes", est).withColumn(
        "join_strategy",
        F.when(est <= _BROADCAST, "broadcast")
        .when(est <= _HASH, "shuffle_hash")
        .otherwise("sort_merge"),
    )
