"""W1-W4 + O1-O5 — window functions, sort/limit, set operations
(SURVEY.md §2.5-§2.6).

Every window ORDER BY carries a unique tiebreak column so rank/lag output is
engine-independent (the correctness hash is order-insensitive but the
*values* produced by rank/lag depend on sort order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import load_table
from .registry import query
from .util import money


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "win_rank_topk",
    oracle="""
    WITH ranked AS (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn,
             rank()       OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk,
             dense_rank() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS drnk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    SELECT c_mktsegment, o_orderkey,
           round(o_totalprice, 2) AS total_price, rn, rnk, drnk
    FROM ranked WHERE rn <= 3
    """,
)
def win_rank_topk(spark, sf_dir):
    """Top-3 orders per market segment with ranking family (W1/W4):
    the scale answer to "top-k per group" — no global sort, partial
    TakeOrdered within each partition."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "rn",
            "rnk",
            "drnk",
        )
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           round(value, 2) AS value,
           round(lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_value,
           round(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS next_value
    FROM events WHERE user_id < 5
    """,
)
def win_lag_lead(spark, sf_dir):
    """lag/lead analytics per user timeline (W2)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
    )


@query(
    "win_running_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM orders
    """,
)
def win_running_frames(spark, sf_dir):
    """Aggregates over row frames (W3): running total + 3-row moving average."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(money("o_totalprice"))
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_total"),
        # round 4, not 2: an average of 2-decimal values over a 2-row frame
        # lands exactly on .005 boundaries where engines round-half apart.
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias(
            "moving_avg3"
        ),
    )


@query(
    "win_ntile_percent",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS balance_quartile,
           round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank
    FROM customer
    """,
)
def win_ntile_percent(spark, sf_dir):
    """ntile / percent_rank distribution ranking (W1)."""
    c = _t(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def sort_limit_topk(spark, sf_dir):
    """Global top-k (O1/O3): Catalyst plans TakeOrderedAndProject — each
    partition keeps k rows, no full sort at any scale."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"))
    )


@query(
    "setop_union",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def setop_union(spark, sf_dir):
    """UNION DISTINCT (O4): bag union + dedup."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.union(b).distinct()


@query(
    "setop_union_all_counts",
    oracle="""
    SELECT c_custkey, count(*) AS n FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      UNION ALL
      SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    ) GROUP BY c_custkey
    """,
)
def setop_union_all_counts(spark, sf_dir):
    """UNION ALL keeps duplicates (O4) — counted to make bag semantics
    observable in an order-insensitive compare."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.union(b).groupBy("c_custkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def setop_intersect(spark, sf_dir):
    """INTERSECT (O5): customers ordering in both years."""
    o = _t(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select(F.col("o_custkey").alias("c_custkey"))
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select(F.col("o_custkey").alias("c_custkey"))
    return y96.intersect(y97)


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def setop_except(spark, sf_dir):
    """EXCEPT (O5): customers who never ordered — same answer as the
    anti-join, via set semantics."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.select("c_custkey").subtract(
        o.select(F.col("o_custkey").alias("c_custkey"))
    )


@query(
    "win_distinct_count",
    oracle="""
    SELECT user_id, event_type,
           count(DISTINCT event_type) OVER (PARTITION BY user_id)
             AS n_types_for_user,
           count(*) AS n_events
    FROM (SELECT user_id, event_type FROM events WHERE user_id < 40)
    GROUP BY user_id, event_type
    """,
)
def win_distinct_count(spark, sf_dir):
    """Distinct count over a window (§2.5): Spark rejects COUNT(DISTINCT)
    OVER, so the idiomatic rewrite is size(collect_set() OVER) — same
    semantics, one window pass. The aggregation beneath keeps cardinality
    at (user, type) so the windowed set stays tiny per partition."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    grouped = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = W.partitionBy("user_id")
    return grouped.select(
        "user_id",
        "event_type",
        F.size(F.collect_set("event_type").over(w))
        .cast("bigint")
        .alias("n_types_for_user"),
        "n_events",
    )
