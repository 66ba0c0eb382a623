"""Bucketing (SURVEY.md §1.2 partitioning discipline): two tables bucketed
on the join key co-locate — the join plans WITHOUT a shuffle on either
side, the prerequisite for repeated large-fact joins at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.catalog import load_table

from .conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders")
    # the in-memory catalog forgets tables between sessions but their
    # warehouse directories persist — clear both sides
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_b", "o_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey").saveAsTable("li_b"))
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
       .sortBy("o_orderkey").saveAsTable("o_b"))

    lb, ob = spark.table("li_b"), spark.table("o_b")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
        "o_orderstatus"
    ).agg(F.count(F.lit(1)).alias("n"))

    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not shuffle either side: the only allowed
    # exchange is the final single aggregation's
    join_part = plan.split("Join")[1] if "Join" in plan else plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan

    # and the result matches the unbucketed join
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))
