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


# --------------------------------------------------------------------------
# Q4 shape: late-shipment order-priority census. The classic commit-vs-
# receipt predicate is adapted to the test schema (no l_commitdate /
# l_receiptdate): an order is "late" when any of its lines shipped more
# than 60 days after the order date. EXISTS -> left-semi join with a
# residual non-equi condition riding the equi key.
# --------------------------------------------------------------------------
@query(
    "q4_priority_census",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_census(spark, sf_dir):
    """Orders per priority with a >60-day-late line, Q3-1996 (Q4 shape).

    The EXISTS decorrelates into one left-semi join: the equi key
    (orderkey) carries the shuffle, the 60-day lateness rides as a
    residual condition — no per-row subquery execution, and the date
    filter on orders is pushed to the scan before the join.
    """
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q7 shape: bilateral trade volume between two nations by ship year.
# The two-direction nation-pair predicate lands after both dimension
# joins; both nation sides are 25-row broadcasts.
# --------------------------------------------------------------------------
@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(12,2))) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey   = l.l_suppkey
      JOIN orders o   ON o.o_orderkey  = l.l_orderkey
      JOIN customer c ON c.c_custkey   = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1995-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """NATION_1 <-> NATION_2 shipped revenue per direction and year (Q7
    shape): the nation-pair disjunction filters after two broadcast
    dimension joins, so the big fact tables shuffle only on their own
    equi keys."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(li.l_shipdate).cast("integer").alias("l_year"),
        )
        .agg(dsum(_disc_price(li)).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q14 shape: promotion revenue share for one month. Both the numerator
# (conditional) and denominator sums stay exact decimals; the percentage
# is a single double division at the very end.
# --------------------------------------------------------------------------
@query(
    "q14_promo_effect",
    oracle="""
    SELECT CAST(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN vol
                                      ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS DOUBLE)
                / CAST(sum(vol) AS DOUBLE) AS DOUBLE) AS promo_revenue_pct,
           CAST(sum(vol) AS DOUBLE) AS total_revenue,
           count(*) AS n_rows
    FROM (
      SELECT l_partkey,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2))) AS vol
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        AND l_shipdate <  TIMESTAMP '1996-10-01'
    ) l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q14_promo_effect(spark, sf_dir):
    """Share of September-1996 revenue from PROMO parts (Q14 shape).

    Conditional and total sums are exact decimals (order-independent);
    the only float op is the final percentage division, computed
    identically in both engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    vol = _disc_price(li)
    zero = F.lit(0).cast("decimal(12,2)")
    month = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    agg = (
        month.join(part, month.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(part.p_type == "PROMO", vol).otherwise(zero)).alias("promo_dec"),
            F.sum(vol).alias("tot_dec"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return agg.select(
        (
            F.lit(100.0) * F.col("promo_dec").cast("double")
            / F.col("tot_dec").cast("double")
        ).alias("promo_revenue_pct"),
        F.col("tot_dec").cast("double").alias("total_revenue"),
        "n_rows",
    )


# --------------------------------------------------------------------------
# Q17 shape: revenue lost to small-quantity orders of one brand's small
# parts. The correlated per-part AVG decorrelates into one aggregate on
# the part-restricted lineitem, joined back on the same key.
# --------------------------------------------------------------------------
@query(
    "q17_small_qty_revenue",
    oracle="""
    WITH tgt AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#23' AND p_size < 11
    ), pavg AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thresh
      FROM lineitem JOIN tgt ON l_partkey = p_partkey
      GROUP BY l_partkey
    )
    SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
           count(*) AS n_rows
    FROM lineitem l JOIN pavg ON l.l_partkey = pavg.l_partkey
    WHERE l.l_quantity < pavg.qty_thresh
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """Avg yearly revenue in sub-20%-of-average-quantity lines of
    Brand#23 small parts (Q17 shape).

    The correlated AVG subquery decorrelates into one groupBy over the
    part-restricted fact (a semi-joined subset, not the whole table)
    joined back on l_partkey. Quantities are integral doubles, so the
    AVG is sum/count over exact values — the 0.2x threshold compares
    identically in both engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    tgt = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") < 11))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    restricted = li.join(F.broadcast(tgt), "l_partkey", "inner")
    pavg = restricted.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        restricted.join(F.broadcast(pavg), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (F.sum(money(F.col("l_extendedprice"))).cast("double") / F.lit(7.0))
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# Q18 shape: large-volume customers — orders whose total quantity tops a
# threshold, top-100 by order price. HAVING over the fact-side aggregate
# happens before any dimension join touches it.
# --------------------------------------------------------------------------
@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sq
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           o.o_orderdate AS order_date,
           CAST(o.o_totalprice AS DOUBLE) AS total_price,
           CAST(big.sq AS DOUBLE) AS sum_qty
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    ORDER BY total_price DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """Top-100 orders with >250 total quantity, with their customers
    (Q18 shape). The quantity rollup + HAVING runs on lineitem alone
    (partial agg, one shuffle on orderkey); only the ~0.1% survivors
    join orders/customer, and the top-100 plans as
    TakeOrderedAndProject — no global sort. Quantities are integral
    doubles, so sums and the threshold cut are exact."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("order_date"),
            F.col("o_totalprice").cast("double").alias("total_price"),
            F.col("sq").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive brand/size/quantity baskets. The OR-of-ANDs
# stays one residual predicate on a single equi join; the implied
# brand IN (...) prefilter is pushed to the part scan explicitly so
# row-group pruning sees it.
# --------------------------------------------------------------------------
@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#5'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    """Revenue from three brand/size/quantity baskets (Q19 shape).

    One equi join on partkey carries the disjunction as a residual
    predicate; the implied `p_brand IN (3 brands)` is applied to the
    part scan before the join (3/25 of the dimension), which Catalyst
    cannot always infer from an OR-of-ANDs on its own.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#5")
        & (F.col("p_size") >= 1)
    )
    basket = (
        ((part.p_brand == "Brand#12") & part.p_size.between(1, 5)
         & li.l_quantity.between(1, 11))
        | ((part.p_brand == "Brand#23") & part.p_size.between(1, 10)
           & li.l_quantity.between(10, 20))
        | ((part.p_brand == "Brand#5") & part.p_size.between(1, 15)
           & li.l_quantity.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(basket)
        .agg(
            dsum(_disc_price(li)).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
