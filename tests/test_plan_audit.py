"""The plan advisor must flag the classic scale anti-patterns and give a
clean bill to the engine's own headline plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.catalog import load_table
from s3_glue_redshift_guide_spark.plans import audit_plan
from s3_glue_redshift_guide_spark.queries import REGISTRY

from .conftest import SF_SMOKE


def _codes(warnings):
    return {w.code for w in warnings}


def test_flags_cartesian_join(spark):
    a = load_table(spark, SF_SMOKE, "nation")
    b = load_table(spark, SF_SMOKE, "region")
    bad = a.join(b, a["n_nationkey"] > b["r_regionkey"])  # theta, no equi-key
    assert "cartesian" in _codes(audit_plan(bad))


def test_flags_row_python_udf(spark):
    from pyspark.sql.types import StringType

    shout = F.udf(lambda s: s.upper(), StringType())
    df = load_table(spark, SF_SMOKE, "nation").select(shout("n_name"))
    assert "python-row-udf" in _codes(audit_plan(df))


def test_flags_unpushed_filter(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    # wrapping the column in a non-pushable expression blocks pushdown
    df = li.filter(F.sha2(F.col("l_returnflag"), 256).startswith("a"))
    assert "unpushed-filter" in _codes(audit_plan(df))


def test_flags_mid_pipeline_global_sort(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    # (a sort feeding an aggregate is eliminated by Catalyst outright —
    # also the right call; this one survives because it orders the output)
    df = li.orderBy("l_extendedprice").withColumn(
        "rank_hint", F.monotonically_increasing_id()
    )
    assert "global-sort" in _codes(audit_plan(df))


def test_headline_queries_audit_clean_of_high_severity(spark):
    # the engine's own flagship plans must never trip a high-severity rule
    for name in (
        "q1_pricing_summary",
        "q5_regional_revenue",
        "join_range_events",
        "join_asof_events",
        "llm_exact_dedup",
        "ts_gap_fill",
        "dq_profile",
    ):
        warnings = audit_plan(REGISTRY[name].fn(spark, SF_SMOKE))
        highs = [w for w in warnings if w.severity == "high"]
        assert not highs, f"{name}: {highs}"
