"""File-level min/max statistics index + data skipping (Delta/Iceberg-style).

Hive partition pruning (``src_partition_pruning``) skips *directories*;
this module skips *files* using per-file min/max statistics on a DATA
column — the mechanism behind Delta's ``add``-file stats, Iceberg
manifests, and Redshift zone maps. On a 100 TB table clustered (sorted or
range-bucketed) by a filter column, a range predicate touches the few
files whose [min, max] interval intersects it; everything else is skipped
*before* any task is scheduled.

Scale notes:

* The index is one row per FILE (metadata scale: a 100 TB table at 1 GB
  files is ~100k index rows), built with one distributed scan grouped on
  ``input_file_name()`` — no driver data movement until the final
  metadata-sized collect.
* ``pruned_files`` collects the *surviving file list* to the driver —
  exactly what every table-format reader (Delta, Iceberg) does at plan
  time; the collected payload is file paths, never data rows.
* In production the index would be persisted and incrementally maintained
  per ingest batch (same shape as ``operators/rollup.py``); here it is
  rebuilt per call because the gate tables are tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def file_stats_index(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-file min/max/count index over ``cols``.

    ``df`` must be a *file-backed* DataFrame (fresh ``spark.read``), so
    ``input_file_name()`` is populated. One shuffle keyed on the file name
    — #files groups, metadata scale.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(*aggs)
        .withColumnRenamed("__file", "file")
    )


def pruned_files(index: DataFrame, col: str, lo, hi) -> list[str]:
    """Files whose [min, max] interval intersects [lo, hi].

    Interval-overlap test ``max >= lo AND min <= hi``; files with null
    stats (all-null column chunks) are conservatively kept, as every
    zone-map implementation must. Collects only file-path strings —
    plan-time metadata, identical to what a Delta/Iceberg scan ships to
    the scheduler.
    """
    keep = index.filter(
        (F.col(f"max_{col}") >= F.lit(lo)) & (F.col(f"min_{col}") <= F.lit(hi))
        | F.col(f"min_{col}").isNull()
    )
    return [r["file"] for r in keep.select("file").collect()]


def read_pruned(
    spark: SparkSession, base: str, files: list[str]
) -> DataFrame:
    """Read only the surviving files, keeping partition-dir columns via
    ``basePath``. The residual predicate must still be applied by the
    caller — stats admit false positives (a file may straddle the range),
    never false negatives. A fully-pruned read (no file intersects the
    predicate) returns an EMPTY frame with the table's schema — the
    zero-task fast path, not an error."""
    if not files:
        schema = spark.read.option("basePath", base).parquet(base).schema
        return spark.createDataFrame([], schema)
    return spark.read.option("basePath", base).parquet(*files)
