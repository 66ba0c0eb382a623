"""S11 — partitioned parquet sink: partitionBy layout + partition pruning on
read-back (the scan must touch only the selected partition's files)."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.catalog import load_table

from .conftest import SF_SMOKE


def test_partitioned_write_and_pruned_read(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    out = str(tmp_path / "li_part")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == li.count()

    pruned = back.filter(F.col("l_returnflag") == "A")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the predicate lands in PartitionFilters (directory-level pruning),
    # not PushedFilters — no data files outside l_returnflag=A are opened
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan
    want = li.filter(F.col("l_returnflag") == "A").count()
    assert pruned.count() == want > 0
