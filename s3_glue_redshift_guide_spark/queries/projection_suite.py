"""P1-P6 — the reference's "Change schema" transform and row predicates as
oracle-checked queries (SURVEY.md §2.2; reference README.md:149-151).

``p_change_schema`` routes through the engine's declarative SchemaMapping —
the same code the ETL pipeline uses — so the transform the reference calls
"renaming, reordering, adding, or removing destination columns" is what's
actually under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..operators.projection import SchemaMapping
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "p_change_schema",
    oracle="""
    SELECT l_orderkey                                   AS order_id,
           CAST(l_linenumber AS BIGINT)                 AS line_no,
           CAST(l_quantity AS INTEGER)                  AS qty,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price,
           l_returnflag                                 AS flag
    FROM lineitem
    """,
)
def p_change_schema(spark, sf_dir):
    """Change schema (P1-P5): remove, rename, reorder, derive, cast — one
    declarative mapping collapsed into the scan projection."""
    li = _t(spark, sf_dir, "lineitem")
    mapping = SchemaMapping.from_dict(
        {
            "order_id": "l_orderkey",
            "line_no": ("l_linenumber", "bigint"),
            "qty": ("l_quantity", "int"),
            "net_price": ("round(l_extendedprice * (1 - l_discount), 4)", "double"),
            "flag": "l_returnflag",
        }
    )
    return mapping.apply(li)


@query(
    "etl_string_first_typing",
    oracle="""
    SELECT order_id, qty, ship_ts FROM (
      SELECT CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS order_id,
             CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty,
             CAST(CAST(l_shipdate AS VARCHAR) AS TIMESTAMP) AS ship_ts,
             TRY_CAST(l_returnflag AS INTEGER) AS bad_cast
      FROM lineitem)
    WHERE bad_cast IS NULL
    """,
)
def etl_string_first_typing(spark, sf_dir):
    """The reference's CSV pipeline semantics in-gate (S1+P5): every value
    becomes a string first (OpenCSVSerde reads all columns as string,
    README.md:125-131), then the Change-schema step types it — with
    malformed casts nulling the cell, not the row (try_cast)."""
    li = _t(spark, sf_dir, "lineitem")
    stringified = li.select(
        F.col("l_orderkey").cast("string").alias("s_key"),
        F.col("l_quantity").cast("string").alias("s_qty"),
        F.col("l_shipdate").cast("string").alias("s_ship"),
        F.col("l_returnflag").alias("s_flag"),
    )
    mapping = SchemaMapping.from_dict(
        {
            "order_id": ("s_key", "bigint"),
            "qty": ("s_qty", "double"),
            "ship_ts": ("s_ship", "timestamp_ntz"),
            "bad_cast": ("s_flag", "int"),  # 'A'/'N'/'R' -> NULL, row kept
        }
    )
    return (
        mapping.apply(stringified)
        .filter(F.col("bad_cast").isNull())
        .select("order_id", "qty", "ship_ts")
    )


@query(
    "p_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 50000 AND 200000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '%URGENT%'
      AND NOT (o_custkey IS NULL)
      AND (o_orderdate >= TIMESTAMP '1995-06-01' OR o_orderkey < 100)
    """,
)
def p_filter_predicates(spark, sf_dir):
    """Predicate family (P6): between, isin, like, null test, boolean
    composition — all pushed into the Parquet scan by Catalyst."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").like("%URGENT%")
        & ~F.col("o_custkey").isNull()
        & (
            (F.col("o_orderdate") >= F.lit("1995-06-01").cast("timestamp_ntz"))
            | (F.col("o_orderkey") < 100)
        )
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")
