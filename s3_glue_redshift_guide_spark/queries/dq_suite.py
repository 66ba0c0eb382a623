"""Data-quality profiling and constraint checking (SURVEY.md §2.11).

The reference pipeline trusts its crawler to "classify data to determine
the format, schema and associated properties" — production pipelines pair
that with *content* checks before loading a warehouse. These two operators
are the engine-side equivalents (the Deequ/expectations shape) expressed
as plain aggregates so they run in one pass at any scale:

* ``dq_profile`` — per-column completeness/cardinality/extrema computed in
  a SINGLE aggregate over the table (every metric partial-aggregates, so
  the shuffle is one row per partition), then melted to one row per column
  with ``stack``. No per-column scan loop — 100 TB is read once.
* ``dq_constraints`` — five constraint families (pk uniqueness, not-null,
  referential integrity, accepted values, numeric range) each reduced to a
  violation count; unioned into one tidy report. Anti-join for the FK
  check (no row explosion), aggregates elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from .registry import query


@query(
    "dq_profile",
    oracle="""
    WITH m AS (
      SELECT count(*) AS n_rows,
             count(l_quantity) AS nn_qty,
             count(DISTINCT l_quantity) AS nd_qty,
             min(l_quantity) AS mn_qty, max(l_quantity) AS mx_qty,
             count(l_extendedprice) AS nn_price,
             count(DISTINCT l_extendedprice) AS nd_price,
             min(l_extendedprice) AS mn_price, max(l_extendedprice) AS mx_price,
             count(l_returnflag) AS nn_flag,
             count(DISTINCT l_returnflag) AS nd_flag,
             min(l_returnflag) AS mn_flag, max(l_returnflag) AS mx_flag,
             count(l_linestatus) AS nn_mode,
             count(DISTINCT l_linestatus) AS nd_mode,
             min(l_linestatus) AS mn_mode, max(l_linestatus) AS mx_mode
      FROM lineitem)
    SELECT 'l_quantity' AS column_name, n_rows,
           n_rows - nn_qty AS n_nulls, nd_qty AS n_distinct,
           mn_qty AS min_num, mx_qty AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM m
    UNION ALL
    SELECT 'l_extendedprice', n_rows, n_rows - nn_price, nd_price,
           mn_price, mx_price, NULL, NULL FROM m
    UNION ALL
    SELECT 'l_returnflag', n_rows, n_rows - nn_flag, nd_flag,
           NULL, NULL, mn_flag, mx_flag FROM m
    UNION ALL
    SELECT 'l_linestatus', n_rows, n_rows - nn_mode, nd_mode,
           NULL, NULL, mn_mode, mx_mode FROM m
    """,
)
def dq_profile(spark, sf_dir):
    """Column profiler: completeness, cardinality, extrema for four
    lineitem columns in ONE aggregate pass (all metrics partial-aggregate;
    the scan is read once however many columns are profiled), melted to a
    tidy per-column report with stack(). Numeric extrema are selected
    values (bit-exact, no arithmetic); string extrema ride separate
    columns so the melted frame stays typed."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("nn_qty"),
        F.countDistinct("l_quantity").alias("nd_qty"),
        F.min("l_quantity").alias("mn_qty"),
        F.max("l_quantity").alias("mx_qty"),
        F.count("l_extendedprice").alias("nn_price"),
        F.countDistinct("l_extendedprice").alias("nd_price"),
        F.min("l_extendedprice").alias("mn_price"),
        F.max("l_extendedprice").alias("mx_price"),
        F.count("l_returnflag").alias("nn_flag"),
        F.countDistinct("l_returnflag").alias("nd_flag"),
        F.min("l_returnflag").alias("mn_flag"),
        F.max("l_returnflag").alias("mx_flag"),
        F.count("l_linestatus").alias("nn_mode"),
        F.countDistinct("l_linestatus").alias("nd_mode"),
        F.min("l_linestatus").alias("mn_mode"),
        F.max("l_linestatus").alias("mx_mode"),
    )
    return m.selectExpr(
        """stack(4,
             'l_quantity', n_rows, n_rows - nn_qty, nd_qty,
               mn_qty, mx_qty, CAST(NULL AS STRING), CAST(NULL AS STRING),
             'l_extendedprice', n_rows, n_rows - nn_price, nd_price,
               mn_price, mx_price, CAST(NULL AS STRING), CAST(NULL AS STRING),
             'l_returnflag', n_rows, n_rows - nn_flag, nd_flag,
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_flag, mx_flag,
             'l_linestatus', n_rows, n_rows - nn_mode, nd_mode,
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_mode, mx_mode
           ) AS (column_name, n_rows, n_nulls, n_distinct,
                 min_num, max_num, min_str, max_str)"""
    )


@query(
    "dq_constraints",
    oracle="""
    SELECT 'pk_unique_lineitem' AS constraint_name,
           count(*) - count(DISTINCT l_orderkey * 16 + l_linenumber)
             AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'not_null_custkey', count(*) FILTER (WHERE o_custkey IS NULL)
    FROM orders
    UNION ALL
    SELECT 'fk_orders_customer', count(*)
    FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'accepted_values_returnflag',
           count(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R'))
    FROM lineitem
    UNION ALL
    SELECT 'range_discount', count(*)
           FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
    FROM lineitem
    """,
)
def dq_constraints(spark, sf_dir):
    """Constraint verification report: five families reduced to violation
    counts — composite-key uniqueness (count vs distinct, no self-join),
    not-null, referential integrity (left-anti join: unmatched rows only,
    nothing explodes), accepted values, numeric range. Each leg is a
    partial-aggregatable scan or an anti-join; the union is of 1-row
    frames."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    pk = li.agg(
        (
            F.count(F.lit(1))
            - F.countDistinct(
                F.col("l_orderkey") * 16 + F.col("l_linenumber")
            )
        ).alias("n_violations")
    ).select(F.lit("pk_unique_lineitem").alias("constraint_name"), "n_violations")

    nn = orders.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_violations")
    ).select(F.lit("not_null_custkey").alias("constraint_name"), "n_violations")

    fk = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.lit("fk_orders_customer").alias("constraint_name"), "n_violations"
        )
    )

    av = li.agg(
        F.count(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1)
        ).alias("n_violations")
    ).select(
        F.lit("accepted_values_returnflag").alias("constraint_name"),
        "n_violations",
    )

    rng = li.agg(
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
        ).alias("n_violations")
    ).select(F.lit("range_discount").alias("constraint_name"), "n_violations")

    return pk.unionByName(nn).unionByName(fk).unionByName(av).unionByName(rng)


@query(
    "dq_observe_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
             AS n_nonpositive,
           round(max(o_totalprice), 2) AS price_max,
           round(sum(o_totalprice), 2) AS price_total
    FROM orders
    """,
)
def dq_observe_metrics(spark, sf_dir):
    """Zero-cost pipeline observability via ``df.observe`` (the
    Observation API): data-quality counters are computed as accumulator-
    style metrics DURING the write/action pass — no second scan of the
    input, which is the only affordable posture at 100 TB (a separate
    validation query would double the read). The query drives one action
    over orders with four observed metrics and returns them as the
    result frame; the oracle recomputes each metric with plain SQL. In
    production the same Observation attaches to the real sink action and
    feeds alerting."""
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias(
            "n_nonpositive"
        ),
        F.round(F.max("o_totalprice"), 2).alias("price_max"),
        F.round(F.sum("o_totalprice"), 2).alias("price_total"),
    )
    # the action the metrics piggyback on (a real pipeline's sink write)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_nonpositive"]),
                float(m["price_max"]),
                float(m["price_total"]),
            )
        ],
        "n_rows bigint, n_nonpositive bigint, price_max double, "
        "price_total double",
    )
