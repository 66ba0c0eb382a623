"""Small-file compaction — rewrite a fragmented table into sized files.

Incremental pipelines (the reference's per-upload job runs, streaming
``foreachBatch`` loads, hourly partitions) accumulate thousands of tiny
files; at 100 TB the file count — not the byte count — becomes the
bottleneck: every scan pays per-file open/footer costs, the driver pays
O(files) listing and memory, and shuffle planning degrades. Compaction is
the standing maintenance job that rewrites a prefix into files near a
target size.

Sizing comes from the filesystem's OWN metadata (``getContentSummary`` —
one namenode/liststatus call, no data read), so the operator is
O(metadata) + one distributed rewrite:

* unsorted mode: ``repartition(n)`` — round-robin, maximally even files.
* clustered mode (``sort_by``): ``repartitionByRange(n) +
  sortWithinPartitions`` — each output file covers a tight, mostly
  disjoint range of the cluster key, so parquet row-group min/max stats
  prune reads for range predicates (poor man's Z-order; exactly what a
  time-series or id-ranged table wants).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _tree_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FS API (metadata only)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(hpath).getLength())


def plan_file_count(spark: SparkSession, path: str, target_file_bytes: int) -> int:
    """Number of output files that lands each near ``target_file_bytes``."""
    return max(1, math.ceil(_tree_bytes(spark, path) / target_file_bytes))


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite the parquet tree at ``in_path`` into ``out_path`` as ~N files
    of ``target_file_bytes`` each; returns N.

    With ``sort_by``, output is range-clustered on those columns (file i
    holds keys below file i+1's), which tightens row-group statistics so
    later range/equality filters skip whole files.
    """
    n = plan_file_count(spark, in_path, target_file_bytes)
    df: DataFrame = spark.read.parquet(in_path)
    if sort_by:
        df = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(out_path)
    return n
