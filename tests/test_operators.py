"""Self-checks for operators whose queries have no (or weak) SQL oracles:
approximate aggregates vs exact, composite joins vs brute-force equivalents,
and plan-shape assertions (broadcast, pushdown) for the scale posture."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.catalog import load_table
from s3_glue_redshift_guide_spark.operators.joins import as_of_join, range_join
from s3_glue_redshift_guide_spark.queries import REGISTRY

from .conftest import SF_SMOKE


def test_approx_count_distinct_within_rsd(spark):
    rows = REGISTRY["agg_approx_distinct"].fn(spark, SF_SMOKE).collect()
    assert rows
    # the derived-fact projection already encodes |approx-exact| <= 3*rsd
    for r in rows:
        assert r["within_tol"] == 1, r


def test_approx_quantiles_bracket_exact_median(spark):
    rows = REGISTRY["agg_approx_quantiles"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["min_price"] <= r["max_price"]
        assert r["p25_ok"] == r["p50_ok"] == r["p75_ok"] == 1, r


def test_range_join_matches_bruteforce(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    a = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("aid"), F.col("user_id").alias("au"), "ts"
    )
    b = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("bid"), F.col("user_id").alias("bu"),
        F.col("ts").alias("bts"),
    )
    fast = range_join(a, b, "ts", "bts", -600, 600, 1200,
                      extra_on=[("au", "bu")]).select("aid", "bid")
    slow = a.join(
        b,
        (a.au == b.bu)
        & (b.bts >= a.ts - F.expr("INTERVAL 600 SECONDS"))
        & (b.bts < a.ts + F.expr("INTERVAL 600 SECONDS")),
    ).select("aid", "bid")
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_range_join_left_rowlevel_matches_bruteforce(spark):
    # VERDICT wart fix: how="left" must emit exactly one null-extended row
    # per never-matched left row (not one per candidate bucket)
    ev = load_table(spark, SF_SMOKE, "events")
    a = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("aid"), F.col("user_id").alias("au"), "ts"
    )
    b = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("bid"), F.col("user_id").alias("bu"),
        F.col("ts").alias("bts"),
    )
    fast = range_join(a, b, "ts", "bts", 0, 600, 600,
                      extra_on=[("au", "bu")], how="left").select("aid", "bid")
    slow = a.join(
        b,
        (a.au == b.bu)
        & (b.bts >= a.ts)
        & (b.bts < a.ts + F.expr("INTERVAL 600 SECONDS")),
        "left",
    ).select("aid", "bid")
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_range_join_rejects_semi_anti(spark):
    import pytest as _pytest

    ev = load_table(spark, SF_SMOKE, "events")
    with _pytest.raises(ValueError):
        range_join(ev, ev, "ts", "ts", 0, 60, 60, how="left_semi")


def test_asof_join_matches_window_bruteforce(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    left = ev.filter(F.col("event_type") == "view")
    right = ev.filter(F.col("event_type") == "error")
    fast = as_of_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                      value_cols=["event_id"])
    # brute force: max event ts <= right.ts per right row via non-equi join
    l2 = left.select(F.col("user_id").alias("lu"), F.col("ts").alias("lts"),
                     F.col("event_id").alias("l_eid"))
    slow = (
        right.alias("r")
        .join(l2, (F.col("r.user_id") == F.col("lu")) & (F.col("lts") <= F.col("r.ts")), "left")
        .groupBy("r.event_id")
        .agg(F.max_by("l_eid", "lts").alias("expect_eid"))
    )
    got = {r["event_id"]: r["asof_event_id"] for r in fast.collect()}
    want = {r["event_id"]: r["expect_eid"] for r in slow.collect()}
    assert got == want


def test_flagship_join_is_broadcast(spark):
    plan = REGISTRY["q5_regional_revenue"].fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark):
    df = REGISTRY["p_filter_predicates"].fn(spark, SF_SMOKE)
    scan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in scan and "GreaterThanOrEqual" in scan
