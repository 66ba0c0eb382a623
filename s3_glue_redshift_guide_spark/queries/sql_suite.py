"""SQL-API entry + subquery shapes (Catalyst decorrelation) and the skew
operators, oracle-checked.

``spark.sql`` over the registered views produces the same Catalyst plans
as the DataFrame API — these queries prove the SQL surface end-to-end and
cover scalar/correlated subqueries, which no other suite exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table, register_views
from ..operators.skew import salted_join, two_phase_agg
from .registry import query


@query(
    "sql_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name < n2.n_name
    GROUP BY n1.n_name, n2.n_name, year(o_orderdate)
    """,
)
def sql_volume_shipping(spark, sf_dir):
    """TPC-H-Q7-shaped bilateral trade volume, written in SQL (the SQL API
    entry point; same Catalyst plan as the DataFrame form)."""
    register_views(spark, sf_dir, ["lineitem", "orders", "supplier", "customer", "nation"])
    return spark.sql(
        """
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               year(o_orderdate) AS order_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name < n2.n_name
        GROUP BY n1.n_name, n2.n_name, year(o_orderdate)
        """
    )


@query(
    "sql_scalar_subquery",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_totalprice > 1.6 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def sql_scalar_subquery(spark, sf_dir):
    """Scalar subquery: orders well above the global average price."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS total_price
        FROM orders
        WHERE o_totalprice > 1.6 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@query(
    "sql_correlated_subquery",
    oracle="""
    SELECT c_custkey, count(*) AS n_big_orders
    FROM customer, orders
    WHERE c_custkey = o_custkey
      AND o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders o2
                          WHERE o2.o_custkey = o_custkey)
    GROUP BY c_custkey
    """,
)
def sql_correlated_subquery(spark, sf_dir):
    """Correlated subquery (Catalyst decorrelates to a join+agg): orders
    1.5x above their own customer's average."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, count(*) AS n_big_orders
        FROM customer, orders
        WHERE c_custkey = o_custkey
          AND o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders o2
                              WHERE o2.o_custkey = o_custkey)
        GROUP BY c_custkey
        """
    )


_SQL_EXISTS = """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """


@query("sql_exists_subquery", oracle=_SQL_EXISTS)
def sql_exists_subquery(spark, sf_dir):
    """EXISTS subquery (TPC-H-Q4 shape): Catalyst rewrites to a left-semi
    join — no per-row probing at any scale."""
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_SQL_EXISTS)


_SQL_IN_HAVING = """
    SELECT o_orderkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150)
    GROUP BY o_orderkey
    """


@query("sql_in_having", oracle=_SQL_IN_HAVING)
def sql_in_having(spark, sf_dir):
    """IN over an aggregated subquery with HAVING (TPC-H-Q18 shape): the
    membership probe becomes a semi join against the aggregate."""
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_SQL_IN_HAVING)


_SQL_OR_OF_ANDS = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue,
           count(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 50)
    """


@query("sql_or_of_ands", oracle=_SQL_OR_OF_ANDS)
def sql_or_of_ands(spark, sf_dir):
    """Disjunction of conjunctions (TPC-H-Q19 shape): Catalyst pushes the
    common-column residues (p_brand/p_size to the part scan, l_quantity to
    the lineitem scan) below the join."""
    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_SQL_OR_OF_ANDS)


_SQL_ANTI_SCALAR = """
    SELECT c_mktsegment, count(*) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal_total
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """


@query("sql_anti_scalar", oracle=_SQL_ANTI_SCALAR)
def sql_anti_scalar(spark, sf_dir):
    """NOT EXISTS + scalar subquery threshold (TPC-H-Q22 shape): anti join
    against orders, one global scalar broadcast for the balance cutoff."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_SQL_ANTI_SCALAR)


_SQL_PROMO = """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2))) END)
                 AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE),
             4) AS promo_pct
    FROM lineitem
    JOIN part   ON p_partkey = l_partkey
    JOIN orders ON o_orderkey = l_orderkey
    GROUP BY year(o_orderdate)
    """


@query("sql_promo_revenue", oracle=_SQL_PROMO)
def sql_promo_revenue(spark, sf_dir):
    """Conditional-aggregate ratio (TPC-H-Q14 shape): promo share of
    revenue per year — exact decimal sums on both sides, one double
    division at the end."""
    register_views(spark, sf_dir, ["lineitem", "part", "orders"])
    return spark.sql(_SQL_PROMO)


@query(
    "skew_salted_join",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS retail_total
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY l_returnflag
    """,
)
def skew_salted_join(spark, sf_dir):
    """Salted join (skew mitigation): same semantics as the plain equi-join
    — the oracle IS the plain join — with the probe side salted and the
    build side replicated so a hot part key spreads across reducers."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = salted_join(
        li, part, "l_partkey", "p_partkey", salt=8, probe_unique_col="l_orderkey"
    )
    from .util import dsum, money

    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(money("p_retailprice")).alias("retail_total"),
    )


@query(
    "skew_two_phase_agg",
    oracle="""
    SELECT l_suppkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
           count(*) AS n_items
    FROM lineitem GROUP BY l_suppkey
    """,
)
def skew_two_phase_agg(spark, sf_dir):
    """Two-phase (salted) aggregation: partial agg on (key, salt) spreads a
    hot supplier key, merge on key — identical result to the direct group."""
    li = load_table(spark, sf_dir, "lineitem")
    from .util import money

    out = two_phase_agg(
        li,
        "l_suppkey",
        {
            "total_qty": ("sum", F.sum(money("l_quantity"))),
            "n_items": ("sum", F.count(F.lit(1))),
        },
        salt=8,
        unique_col="l_orderkey",
    )
    return out.select(
        "l_suppkey", F.col("total_qty").cast("double").alias("total_qty"), "n_items"
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE months(month_start) AS (
      SELECT date_trunc('month', (SELECT min(o_orderdate) FROM orders))
      UNION ALL
      SELECT month_start + INTERVAL 1 MONTH FROM months
      WHERE month_start + INTERVAL 1 MONTH
            <= (SELECT max(o_orderdate) FROM orders)
    )
    SELECT CAST(month_start AS TIMESTAMP) AS month_start,
           count(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders
      ON date_trunc('month', o_orderdate) = month_start
    GROUP BY month_start
    """,
)
def sql_recursive_cte(spark, sf_dir):
    """Recursive CTE (Spark 4 WITH RECURSIVE): build a contiguous month
    spine from min to max order date, then left-join order counts so empty
    months appear with 0. The recursion materializes ~80 driver-light rows
    (one per month — bounded by calendar span, not data volume); the
    spine-to-fact join is a broadcastable equi-join on the truncated date,
    so the only full-scan work is one pass over orders."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH RECURSIVE months(month_start) AS (
          SELECT date_trunc('month', (SELECT min(o_orderdate) FROM orders))
          UNION ALL
          SELECT month_start + INTERVAL '1' MONTH FROM months
          WHERE month_start + INTERVAL '1' MONTH
                <= (SELECT max(o_orderdate) FROM orders)
        )
        SELECT month_start, count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders
          ON date_trunc('month', o_orderdate) = month_start
        GROUP BY month_start
        """
    )


_SQL_Q21 = """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """


@query("sql_q21_waiting_suppliers", oracle=_SQL_Q21)
def sql_q21_waiting_suppliers(spark, sf_dir):
    """Suppliers who alone held up multi-supplier orders (TPC-H-Q21 shape,
    lateness adapted to this schema's l_shipdate — the generator carries no
    receipt/commit dates): an EXISTS plus a doubly-correlated NOT EXISTS
    over the same fact table. Catalyst decorrelates both into semi/anti
    joins on l_orderkey — the plan is three joins over one lineitem scan
    family, never a per-row subquery loop; the hardest decorrelation case
    in the classic suite."""
    register_views(spark, sf_dir, ["supplier", "lineitem", "orders"])
    return spark.sql(_SQL_Q21)
