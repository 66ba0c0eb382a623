"""Core relational queries (SURVEY.md §2.2-§2.6 — scan/project/filter/join/
agg/sort/limit), each with its DuckDB oracle.

These are the "what the reference's ETL output warehouse would be queried
with" workload: star-schema joins over the TPC-H-ish test tables. All joins
declare the plan declaratively and let Catalyst/AQE pick physical strategies;
dimension sides that stay small at every scale factor get an explicit
``broadcast`` hint (region=5, nation=25, supplier=10 rows — constant-size in
TPC-H-style data, so the hint is safe at 100 TB too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from .registry import query
from .util import dsum, money


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship: TPC-H-Q5-shaped regional revenue rollup.
# Exercises S10 scan, P1-P6 projection/filter, J1/J2 joins (broadcast dims),
# A1/A2 aggregation, O1 sort in one query — the reference's pipeline shape
# (ingest -> schema-map -> load -> warehouse query) expressed as the
# warehouse query itself. Reference scope: README.md:104 (crawler+job),
# README.md:149-151 (schema mapping); joins/aggs are driver-mandated (M).
# --------------------------------------------------------------------------
@query(
    "q5_regional_revenue",
    oracle="""
    SELECT r.r_name AS region_name,
           n.n_name AS nation_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem l
    JOIN orders o     ON l.l_orderkey = o.o_orderkey
    JOIN customer c   ON o.o_custkey = c.c_custkey
    JOIN supplier s   ON l.l_suppkey = s.s_suppkey
    JOIN nation n     ON s.s_nationkey = n.n_nationkey
    JOIN region r     ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY r.r_name, n.n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region/nation over a date window (flagship; TPC-H Q5 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(
            (orders.o_orderdate >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (orders.o_orderdate < F.lit("1999-01-01").cast("timestamp_ntz"))
        )
        .groupBy(
            region.r_name.alias("region_name"),
            nation.n_name.alias("nation_name"),
        )
        .agg(
            dsum(money(li.l_extendedprice) * (1 - money(li.l_discount))).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H-Q1-shaped pricing summary: wide aggregate over the fact table.
# Exercises A1/A2 (8 aggregates, map-side partial agg for free via Catalyst).
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)          AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)     AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)  AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))
                    * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE)       AS sum_charge,
           round(avg(l_quantity), 4)                                       AS avg_qty,
           round(avg(l_extendedprice), 4)                                  AS avg_price,
           round(avg(l_discount), 4)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): 8 aggregates over 2 keys."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = money(li.l_extendedprice) * (1 - money(li.l_discount))
    return (
        li.filter(li.l_shipdate <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(money(li.l_quantity)).alias("sum_qty"),
            dsum(money(li.l_extendedprice)).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + money(li.l_tax))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H-Q3-shaped top-k: join + agg + deterministic top-10.
# Exercises O3 (Catalyst plans TakeOrderedAndProject — no global sort).
# Ordering includes the unique o_orderkey tiebreak so the selected set is
# engine-independent.
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey,
           o.o_orderdate AS order_date,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped-revenue orders for one market segment (TPC-H Q3 shape)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        cust.filter(cust.c_mktsegment == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .filter(
            (orders.o_orderdate < F.lit("1998-03-15").cast("timestamp_ntz"))
            & (li.l_shipdate > F.lit("1995-03-15").cast("timestamp_ntz"))
        )
        .groupBy(orders.o_orderkey, orders.o_orderdate.alias("order_date"))
        .agg(dsum(money(li.l_extendedprice) * (1 - money(li.l_discount))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H-Q6-shaped forecast revenue: pure filter + single aggregate — the
# predicate-pushdown showcase (every condition reaches the parquet scan).
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """Forecast revenue change (TPC-H Q6 shape): filter-heavy single agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (li.l_shipdate >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (li.l_shipdate < F.lit("1997-01-01").cast("timestamp_ntz"))
            & li.l_discount.between(0.03, 0.07)
            & (li.l_quantity < 24)
        )
        .agg(
            dsum(money(li.l_extendedprice) * money(li.l_discount)).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H-Q10-shaped returned-items report: 4-table join + agg + top-20.
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """Customers with highest returned-item revenue (TPC-H Q10 shape)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    return (
        li.filter(li.l_returnflag == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(c.c_custkey, c.c_name, n.n_name.alias("nation_name"))
        .agg(dsum(money(li.l_extendedprice) * (1 - money(li.l_discount))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H-Q12-shaped shipping-priority split: join + conditional aggregation.
# --------------------------------------------------------------------------
@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_priority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_shipping(spark, sf_dir):
    """Priority-class line counts (TPC-H Q12 shape): conditional sums."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (li.l_shipdate >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (li.l_shipdate < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_priority"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_priority"),
        )
    )
