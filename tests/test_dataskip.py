"""File-level min/max data skipping: the index must prune files (not just
directories), keep every matching row, and conservatively retain
null-stat files."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.catalog import load_table
from s3_glue_redshift_guide_spark.operators.dataskip import (
    file_stats_index,
    pruned_files,
    read_pruned,
)

from .conftest import SF_SMOKE


def test_prunes_files_and_keeps_all_rows(spark):
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    base = tempfile.mkdtemp(prefix="spark_dataskip_t_")
    (
        o.withColumn("fid", F.year("od") - F.lit(1995))
        .repartition("fid")
        .write.partitionBy("fid")
        .mode("overwrite")
        .parquet(base)
    )
    back = spark.read.parquet(base)
    index = file_stats_index(back, ["od"])
    n_files = index.count()
    assert n_files == 7  # one file per order-year 1995..2001

    lo, hi = "1997-03-15", "1998-06-30"
    files = pruned_files(index, "od", lo, hi)
    assert 0 < len(files) < n_files  # genuine skipping
    assert len(files) == 2  # year-aligned layout: 1997 + 1998 only

    got = (
        read_pruned(spark, base, files)
        .filter(F.col("od").between(F.lit(lo), F.lit(hi)))
        .agg(F.count(F.lit(1)), F.sum("o_orderkey"))
        .collect()[0]
    )
    want = (
        o.filter(F.col("od").between(F.lit(lo), F.lit(hi)))
        .agg(F.count(F.lit(1)), F.sum("o_orderkey"))
        .collect()[0]
    )
    assert tuple(got) == tuple(want)


def test_null_stats_files_are_kept(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "k int, v int"
    )
    base = tempfile.mkdtemp(prefix="spark_dataskip_n_")
    df.coalesce(1).write.mode("overwrite").parquet(base)
    back = spark.read.parquet(base)
    index = file_stats_index(back, ["v"])
    # all-null stats column: conservatively NOT skippable
    assert len(pruned_files(index, "v", 100, 200)) == 1


def test_fully_pruned_read_returns_empty_frame(spark):
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    base = tempfile.mkdtemp(prefix="spark_dataskip_e_")
    o.coalesce(1).write.mode("overwrite").parquet(base)
    index = file_stats_index(spark.read.parquet(base), ["od"])
    files = pruned_files(index, "od", "2030-01-01", "2031-01-01")
    assert files == []
    empty = read_pruned(spark, base, files)
    assert empty.count() == 0
    assert set(empty.columns) == {"o_orderkey", "od"}
