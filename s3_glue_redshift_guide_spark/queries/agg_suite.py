"""A1-A7 — aggregation coverage (SURVEY.md §2.4).

Catalyst plans every groupBy here as partial (map-side) + final aggregation
automatically — the 100 TB behavior is the default. Approximate aggregates
(HLL distinct, quantile sketches) have no bit-exact oracle; they register
without oracle SQL (rows-only driver check) and carry tolerance self-checks
in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from .registry import query
from .util import dsum, money


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4)         AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(min(l_extendedprice), 2)         AS min_price,
           round(max(l_extendedprice), 2)         AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    """Statistical aggregates (A2): stddev/variance/correlation per flag."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark, sf_dir):
    """Exact multi-column distinct counting (A2) — Catalyst expands to
    a single pass with per-distinct-column aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT o_orderstatus,
           max_by(o_orderkey, o_totalprice) AS top_order,
           min_by(o_orderkey, o_totalprice) AS bottom_order,
           round(max(o_totalprice), 2) AS top_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_minmax_by(spark, sf_dir):
    """max_by/min_by argmax aggregates (A2)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("top_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("bottom_order"),
        F.round(F.max("o_totalprice"), 2).alias("top_price"),
    )


@query(
    "agg_collect_set",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect_set(spark, sf_dir):
    """collect_set with a deterministic sort (A2) — set semantics, then
    sort_array so the value is order-stable; projected as a joined string
    (the grading harness hashes scalar cells, not arrays)."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("n_name"))).alias("nations")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
           CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals with grouping indicators (A5)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        dsum(money("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE: all grouping-set combinations (A5)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum(money("l_extendedprice")).alias("sum_price")
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS "O",
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS "F"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot (A7) with an explicit value list — no extra distinct-scan, and
    the column set is stable at any data size."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(money("l_quantity")).cast("double"))
    )


@query(
    "agg_dedup_distinct",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def agg_dedup_distinct(spark, sf_dir):
    """distinct() as dedup-by-all-columns (A6)."""
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


# ---- approximate aggregates: derived-fact oracles ---------------------------
# A sketch value is engine-specific, so the oracle checks the DERIVED facts:
# the exact value (reproducible in DuckDB) plus an in-tolerance boolean that
# encodes the sketch's accuracy guarantee (oracle side: literal TRUE). The
# boolean is deterministic — Spark's HLL++/GK sketches are seed-free — so the
# gate genuinely exercises the approximation error bound.


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           1 AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """HLL++ approximate distinct (A3): exact count + |approx-exact| within
    3x the configured rsd, as the oracle-checkable derived fact."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    tol = F.lit(3 * 0.02) * F.col("exact_parts").cast("double")
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (F.abs(F.col("approx_parts") - F.col("exact_parts")).cast("double") <= tol)
        .cast("int")
        .alias("within_tol"),
    )


@query(
    "agg_approx_quantiles",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price,
           1 AS p25_ok, 1 AS p50_ok, 1 AS p75_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_quantiles(spark, sf_dir):
    """Approximate quantiles (A4) via percentile_approx (GK sketch,
    accuracy=10000 => rank error <= n/10000). Each approx quartile is
    checked against the exact percentile band p +/- 0.01 — 100x looser than
    the sketch guarantee, so the boolean is robustly deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    ]
    for p in (25, 50, 75):
        q = p / 100.0
        aggs += [
            F.percentile_approx("l_extendedprice", q, 10000).alias(f"__ap{p}"),
            F.expr(f"percentile(l_extendedprice, {q - 0.01})").alias(f"__lo{p}"),
            F.expr(f"percentile(l_extendedprice, {q + 0.01})").alias(f"__hi{p}"),
        ]
    agg = li.groupBy("l_returnflag").agg(*aggs)
    return agg.select(
        "l_returnflag",
        "n_rows",
        "min_price",
        "max_price",
        *[
            (
                (F.col(f"__ap{p}") >= F.col(f"__lo{p}"))
                & (F.col(f"__ap{p}") <= F.col(f"__hi{p}"))
            )
            .cast("int")
            .alias(f"p{p}_ok")
            for p in (25, 50, 75)
        ],
    )


@query(
    "agg_histogram",
    oracle="""
    WITH b AS (
      SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin
      FROM lineitem)
    SELECT bin,
           CAST(bin * 5000.0 AS DOUBLE) AS bin_lo,
           CAST((bin + 1) * 5000.0 AS DOUBLE) AS bin_hi,
           count(*) AS n
    FROM b GROUP BY bin
    """,
)
def agg_histogram(spark, sf_dir):
    """Equi-width histogram (A8): integer binning via floor division — a
    plain partial-aggregatable groupBy whose shuffle is one row per bin,
    the profiling primitive for distribution sketches at any scale. Bin
    edges are exact multiples of the width (no float accumulation)."""
    li = _t(spark, sf_dir, "lineitem")
    bin_ = F.floor(F.col("l_extendedprice") / 5000.0).cast("bigint")
    return (
        li.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("bin") * 5000.0).cast("double").alias("bin_lo"),
            ((F.col("bin") + 1) * 5000.0).cast("double").alias("bin_hi"),
            "n",
        )
    )


@query(
    "agg_linear_fit",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           round(corr(l_extendedprice, l_quantity), 6)           AS corr_xy,
           round(covar_samp(l_extendedprice, l_quantity), 2)     AS covar_xy,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_linear_fit(spark, sf_dir):
    """Regression aggregate family (§2.4): per-group OLS slope/intercept,
    R², correlation, covariance — the in-engine `ANALYZE`-grade statistics
    every feature-QA pass runs. All regr_*/corr/covar aggregates partial-
    aggregate (sums of x, y, xy, x², y²), so one shuffle row per group per
    partition at any scale; rounded on both sides because the final
    division is float."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.corr(y, x), 6).alias("corr_xy"),
        F.round(F.covar_samp(y, x), 2).alias("covar_xy"),
        F.regr_count(y, x).cast("bigint").alias("n_pairs"),
    )


@query(
    "agg_freq_items",
    oracle="""
    WITH ex AS (
      SELECT o_orderpriority AS item, count(*) AS exact_count FROM orders
      GROUP BY 1),
    tot AS (SELECT count(*) AS t FROM orders)
    SELECT item, exact_count, TRUE AS reported
    FROM ex, tot WHERE exact_count > 0.15 * t
    """,
)
def agg_freq_items(spark, sf_dir):
    """Heavy hitters (§2.4, approximate family): ``freqItems`` (the
    Karp-Papadimitriou-Shenker single-pass sketch) must report every item
    with support > s; false positives are allowed and engine-specific, so
    the derived-fact output is the EXACT above-threshold items with their
    exact counts plus the sketch's superset guarantee as a boolean — the
    oracle reproduces the exact side and TRUE. The sketch result is
    bounded (≤ 1/s items) so collecting it is O(1)."""
    orders = load_table(spark, sf_dir, "orders")
    # one scan for the exact side: the per-item counts are cached (bounded
    # by the key cardinality) and the grand total is re-aggregated from
    # them instead of re-scanning orders — the returned plan reads the fact
    # table at most once; the sketch pass below is its own single scan
    ex = (
        orders.groupBy(F.col("o_orderpriority").alias("item"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .cache()
    )
    reported = set(
        orders.stat.freqItems(["o_orderpriority"], support=0.15)
        .collect()[0][0]
    )
    tot = ex.agg(F.sum("exact_count").alias("t"))
    return (
        ex.crossJoin(tot)
        .filter(F.col("exact_count") > 0.15 * F.col("t"))
        .select(
            "item",
            "exact_count",
            F.col("item").isin(list(reported)).alias("reported"),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """A5 completed: arbitrary GROUPING SETS (rollup/cube are just the
    dense special cases) with grouping() flags disambiguating real NULL
    group values from aggregated-away dimensions. Catalyst expands the
    sets into one Expand + single hash aggregate — the input is read
    ONCE for all three granularities (vs one scan per set if composed
    manually), and the aggregate stays partial+final so the shuffle
    carries group states, not rows."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
               count(*) AS n_rows
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )
