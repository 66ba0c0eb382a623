"""Sink-side semantics exposed as oracle-checked queries.

The staged COPY / warehouse upsert machinery (sinks/upsert.py,
sinks/warehouse_copy.py) is exercised end-to-end in pytest (it needs a
warehouse connection); the MERGE *semantics* — SCD1 "updates win on key
collision, latest version wins within the batch" — are engine-side pure
DataFrame logic, so they register here with a plain SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..sinks.upsert import merge_dataframes
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "sink_scd1_merge",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey < 2000),
    upd AS (
      SELECT o_orderkey, 'U2' AS o_orderstatus FROM orders
      WHERE o_orderkey >= 1000 AND o_orderkey < 3000)
    SELECT o_orderkey, o_orderstatus FROM target
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    UNION ALL
    SELECT o_orderkey, o_orderstatus FROM upd
    """,
)
def sink_scd1_merge(spark, sf_dir):
    """SCD1 MERGE semantics (reference's warehouse-load UPSERT path): the
    updates batch deliberately carries TWO rows per key (versions 1 and 2,
    the reprocessed-partition case); version_col dedup keeps v2, the
    anti-join drops collided target rows, updates insert. Output is the
    post-merge table — one row per key, updates win, latest version wins."""
    o = _t(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey", "o_orderstatus", F.lit(0).alias("v")
    )
    base = o.filter(
        (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 3000)
    ).select("o_orderkey")
    updates = base.select(
        "o_orderkey", F.lit("U1").alias("o_orderstatus"), F.lit(1).alias("v")
    ).unionByName(
        base.select(
            "o_orderkey", F.lit("U2").alias("o_orderstatus"), F.lit(2).alias("v")
        )
    )
    merged = merge_dataframes(target, updates, ["o_orderkey"], version_col="v")
    return merged.select("o_orderkey", "o_orderstatus")
