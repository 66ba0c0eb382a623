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
