"""CBO statistics + stats-driven join planning (stats.py, stats_suite)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from s3_glue_redshift_guide_spark.catalog import load_table
from s3_glue_redshift_guide_spark.queries import REGISTRY
from s3_glue_redshift_guide_spark.stats import (
    ROW_OVERHEAD,
    TableStats,
    choose_strategy,
    collect_stats,
    plan_join,
)
from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.parity import run_pair


def test_collect_stats_exact_small_frame(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, s="ab", x=1.5),
            Row(k=2, s=None, x=2.5),
            Row(k=2, s="cdef", x=None),
        ]
    )
    st = collect_stats(df, exact=True)
    assert st.n_rows == 3
    assert st.columns["k"].n_distinct == 2
    assert st.columns["k"].n_nulls == 0
    assert st.columns["s"].n_nulls == 1
    assert st.columns["s"].total_bytes == 6  # "ab" + "cdef"
    assert st.columns["x"].total_bytes == 2 * 8  # two non-null doubles
    assert st.data_bytes == 3 * 8 + 6 + 16  # k is long here
    assert st.est_bytes == st.data_bytes + 3 * ROW_OVERHEAD


def test_choose_strategy_branches():
    small = TableStats(n_rows=10, data_bytes=100, columns={})
    big = TableStats(n_rows=10**7, data_bytes=10**10, columns={})
    mid = TableStats(n_rows=10**5, data_bytes=50 * 1024 * 1024, columns={})
    assert choose_strategy(small, big) == "broadcast_left"
    assert choose_strategy(big, small) == "broadcast_right"
    assert choose_strategy(mid, big) == "shuffle_hash_left"
    assert choose_strategy(big, big) == "sort_merge"


def test_plan_join_broadcasts_small_dim(spark):
    nation = load_table(spark, SF_SMOKE, "nation")
    cust = load_table(spark, SF_SMOKE, "customer")
    joined, decision = plan_join(
        cust, nation, cust["c_nationkey"] == nation["n_nationkey"]
    )
    assert decision == "broadcast_right"
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_plan_join_shuffle_hash_and_sort_merge(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    cond = orders["o_orderkey"] == li["l_orderkey"]
    joined, decision = plan_join(
        orders, li, cond, broadcast_bytes=1, shuffle_hash_factor=10**9
    )
    assert decision == "shuffle_hash_left"
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan

    # sort_merge = "no hint, Catalyst owns the choice": at sf0.001 Spark's
    # own conf threshold still broadcasts, which is exactly the wanted
    # behavior (the planner defers rather than forcing a worse plan)
    joined, decision = plan_join(
        orders, li, cond, broadcast_bytes=1, shuffle_hash_factor=1
    )
    assert decision == "sort_merge"
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" not in plan


def test_plan_join_degrades_illegal_outer_side(spark):
    nation = load_table(spark, SF_SMOKE, "nation")
    cust = load_table(spark, SF_SMOKE, "customer")
    # right outer wants to preserve the right (small) side; broadcasting the
    # preserved side is illegal, so the planner must fall back
    joined, decision = plan_join(
        cust, nation, cust["c_nationkey"] == nation["n_nationkey"], "right"
    )
    assert decision == "sort_merge"
    # every nation row is preserved even without a customer match
    assert joined.count() >= nation.count()


def test_stats_table_sizing_matches_collect_stats(spark):
    """The registry query's integer formula equals collect_stats on the
    same table (same size_bytes_expr), and the strategy column exercises
    every branch at sf0.01."""
    rows = {
        r["table_name"]: r
        for r in REGISTRY["stats_table_sizing"].fn(spark, SF_CORRECT).collect()
    }
    li = collect_stats(load_table(spark, SF_CORRECT, "lineitem"))
    assert rows["lineitem"]["n_rows"] == li.n_rows
    assert rows["lineitem"]["data_bytes"] == li.data_bytes
    assert rows["lineitem"]["est_bytes"] == li.est_bytes
    strategies = {r["join_strategy"] for r in rows.values()}
    assert strategies == {"broadcast", "shuffle_hash", "sort_merge"}


def test_stats_table_sizing_oracle_parity(spark, duck):
    problems = run_pair(
        spark, duck(SF_CORRECT), REGISTRY["stats_table_sizing"], SF_CORRECT
    )
    assert problems == []
