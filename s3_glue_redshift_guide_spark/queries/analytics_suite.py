"""Decision-support tail (TPC-H Q2/Q8/Q9/Q11/Q13/Q15/Q16/Q20/Q22 shapes),
adapted to the test schema (no partsupp table; supply cost is derived from
lineitem unit prices, availability from shipped quantity).

These nine shapes complete the classic decision-support plan inventory the
earlier suites started (q1/q3/q5/q6/q10/q12 + the subquery suite): min-per-
group equality joins, fractioned market share over a self-joined dimension,
HAVING against a global scalar, outer-join count distributions, argmax by
exact decimal equality, NOT-IN rewritten as anti join, nested semi joins,
and anti-join-with-scalar-threshold. Every scalar subquery is decorrelated
into a 1-row aggregate broadcast — the shape that survives 1000 executors
(no per-row subquery execution, one extra tiny stage).

All money aggregation follows the engine decimal policy
(``functions/numeric.py``): exact DECIMAL sums surfaced as DOUBLE so both
engines produce identical bits regardless of partial-agg order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from .registry import query
from .util import dsum, money


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _disc_price(li: DataFrame) -> F.Column:
    return money(li.l_extendedprice) * (1 - money(li.l_discount))


# --------------------------------------------------------------------------
# Q2 shape: cheapest supplier per part (correlated MIN decorrelated into a
# per-group MIN + equality join — Catalyst's own rewrite, stated explicitly).
# --------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH uc AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), pm AS (
      SELECT l_partkey, min(cost) AS best FROM uc GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation_name,
           round(uc.cost, 4) AS min_cost
    FROM uc
    JOIN pm ON uc.l_partkey = pm.l_partkey AND uc.cost = pm.best
    JOIN part p     ON p.p_partkey = uc.l_partkey
    JOIN supplier s ON s.s_suppkey = uc.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'LARGE' AND p.p_size <= 15
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """Cheapest observed unit cost per LARGE part and who supplies it.

    The correlated ``cost = (SELECT min ...)`` of TPC-H Q2 is expressed as
    two aggregations + an equality join on the min — one shuffle keyed on
    ``l_partkey`` serves both (exchange reuse), and the double equality is
    engine-safe because both sides are the same IEEE division results.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    uc = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    pm = uc.groupBy(F.col("l_partkey").alias("pm_partkey")).agg(
        F.min("cost").alias("best")
    )
    return (
        uc.join(
            pm,
            (F.col("l_partkey") == F.col("pm_partkey"))
            & (F.col("cost") == F.col("best")),
        )
        .join(part, uc.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), uc.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            nation.n_name.alias("nation_name"),
            F.round("cost", 4).alias("min_cost"),
        )
    )


# --------------------------------------------------------------------------
# Q8 shape: national market share inside a region (two roles of the nation
# dimension -> self-join with aliases; share = exact-decimal volume ratio).
# --------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle="""
    WITH v AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN part      ON p_partkey = l_partkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT order_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
                               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM v GROUP BY order_year
    """,
)
def q8_market_share(spark, sf_dir):
    """NATION_7's share of ECONOMY-part volume sold into ASIA, by year.

    Nation plays two roles (customer's and supplier's) — expressed as two
    broadcast joins of the same 25-row dim under different aliases. Both
    numerator and denominator are exact decimal sums; only the final ratio
    is floating, so the share is bit-identical across engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = _t(spark, sf_dir, "supplier")
    n_cust = _t(spark, sf_dir, "nation").alias("n1")
    n_supp = _t(spark, sf_dir, "nation").alias("n2")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    v = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("n2.n_nationkey"))
        .filter(
            (orders.o_orderdate >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (orders.o_orderdate < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select(
            F.year(orders.o_orderdate).cast("integer").alias("order_year"),
            _disc_price(li).alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return v.groupBy("order_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q9 shape: product-line profit by supplier nation and year. Supply cost is
# derived (retailprice * qty * 0.5) since the schema has no partsupp.
# --------------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(0.5 AS DECIMAL(2,1))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN part      ON p_partkey = l_partkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation n  ON s_nationkey = n.n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n.n_name, year(o_orderdate)
    """,
)
def q9_product_profit(spark, sf_dir):
    """Profit on red parts by supplier nation and order year (Q9 shape).

    The three-factor decimal product stays exact (DECIMAL(12,2) factors keep
    the widened result under Spark's precision-38 cap), so the profit sum is
    order-independent and cross-engine stable.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    half = F.lit(0.5).cast("decimal(2,1)")
    profit = _disc_price(li) - money(part.p_retailprice) * money(li.l_quantity) * half
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            nation.n_name.alias("nation_name"),
            F.year(orders.o_orderdate).cast("integer").alias("order_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


# --------------------------------------------------------------------------
# Q11 shape: per-part value concentration vs a global threshold (HAVING
# against a scalar subquery -> 1-row aggregate broadcast, exact decimals).
# --------------------------------------------------------------------------
@query(
    "q11_important_value",
    oracle="""
    WITH nat AS (
      SELECT l_partkey,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2))) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_0'
    ), tot AS (SELECT sum(val) AS total FROM nat)
    SELECT l_partkey AS part_key,
           CAST(sum(val) AS DOUBLE) AS part_value
    FROM nat CROSS JOIN tot
    GROUP BY l_partkey, tot.total
    HAVING sum(val) > total * CAST(0.001 AS DECIMAL(4,3))
    """,
)
def q11_important_value(spark, sf_dir):
    """Parts holding >0.1% of NATION_0's traded value (Q11 shape).

    The global total is a 1-row aggregate broadcast-crossed into the
    per-part aggregate — no correlated execution, one extra tiny stage.
    Both sides of the HAVING comparison are exact decimals, so the
    threshold cut is deterministic across engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")

    nat = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(li.l_partkey, _disc_price(li).alias("val"))
    )
    per_part = nat.groupBy("l_partkey").agg(F.sum("val").alias("vdec"))
    total = nat.agg(F.sum("val").alias("total"))
    frac = F.lit(0.001).cast("decimal(4,3)")
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("vdec") > F.col("total") * frac)
        .select(
            F.col("l_partkey").alias("part_key"),
            F.col("vdec").cast("double").alias("part_value"),
        )
    )


# --------------------------------------------------------------------------
# Q13 shape: distribution of orders-per-customer including zero-order
# customers (left outer join with an ON-clause filter, two-level agg).
# --------------------------------------------------------------------------
@query(
    "q13_customer_orders_dist",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_orders_dist(spark, sf_dir):
    """How many customers placed k non-urgent orders, for each k (Q13 shape).

    The priority predicate lives in the join condition (not a post-filter),
    so zero-order customers survive the outer join and land in the k=0
    bucket — the semantics the post-filter form silently breaks.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(cust.c_custkey)
        .agg(F.count(orders.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q15 shape: top supplier by quarterly revenue (argmax via exact-decimal
# equality against a 1-row MAX aggregate).
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(rev.rev_dec AS DOUBLE) AS total_revenue
    FROM rev
    JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.rev_dec = (SELECT max(rev_dec) FROM rev)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """The supplier(s) with maximum Q1-1996 revenue (Q15 shape).

    Ties are kept (all argmax rows), and the equality is on exact decimals
    — the double form of this query is flaky because two engines' partial
    sums can differ in the last ulp and drop the winner.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")

    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_disc_price(li)).alias("rev_dec"))
    )
    mx = rev.agg(F.max("rev_dec").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rev_dec") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# Q16 shape: supplier diversity per part attribute, excluding a NOT-IN set
# (anti join — the null-safe rewrite of NOT IN on a non-null key).
# --------------------------------------------------------------------------
@query(
    "q16_supplier_part_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_cnt(spark, sf_dir):
    """Distinct suppliers per (brand, type, size), excluding suppliers in
    arrears (Q16 shape). The NOT IN becomes a left-anti join — safe here
    because ``s_suppkey`` is non-null, and shuffle-cheap because the
    excluded set is a filtered dimension."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(bad_supp, "l_suppkey", "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q20 shape: nested IN-subqueries -> semi-join chain (suppliers who shipped
# a meaningful volume of small parts in 1996, from one nation).
# --------------------------------------------------------------------------
@query(
    "q20_excess_shippers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation ON s.s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 50
      )
    """,
)
def q20_excess_shippers(spark, sf_dir):
    """NATION_1 suppliers who shipped >50 units of small parts in 1996
    (Q20 shape). Both INs become semi joins: part-filter first (prunes
    lineitem early), then the aggregated supplier set — each join keyed on
    what the previous stage already shuffled by."""
    li = _t(spark, sf_dir, "lineitem")
    part_small = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(part_small, "l_partkey", "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(money(F.col("l_quantity"))).alias("qty_dec"))
        .filter(F.col("qty_dec") > 50)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


# --------------------------------------------------------------------------
# Q22 shape: dormant-but-wealthy customers by country segment (scalar AVG
# threshold + NOT EXISTS -> 1-row aggregate broadcast + anti join).
# --------------------------------------------------------------------------
@query(
    "q22_dormant_customers",
    oracle="""
    WITH seg AS (
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ), thresh AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS avg_bal
      FROM seg WHERE c_acctbal > 0
    )
    SELECT c_nationkey AS cntrycode,
           count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM seg CROSS JOIN thresh
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22_dormant_customers(spark, sf_dir):
    """Above-average-balance customers with no orders, per country segment
    (Q22 shape; country code = nationkey since the schema has no phone).

    The AVG threshold is computed as exact-decimal-sum / count so both
    engines derive the identical double before the boundary comparison;
    NOT EXISTS is a left-anti join on the order keys.
    """
    segs = [1, 3, 5, 7, 9, 11, 13]
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(segs))
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    thresh = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(money(F.col("c_acctbal"))).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cust.join(orders, "c_custkey", "left_anti")
        .join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(money(F.col("c_acctbal"))).alias("totacctbal"),
        )
    )
