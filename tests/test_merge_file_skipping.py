"""MERGE source-hull file skipping engaged end-to-end (VERDICT-r8
directive #3): a key-clustered target + narrow-hull source must scan a
strict subset of files, and a stats-less target must conservatively
scan them all — same results either way."""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import (
    MERGE_METRICS,
    SnapshotTable,
)


def _clustered(spark, stats_cols):
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="mskip_")
    )
    for i in range(8):
        rows = [(k, float(k)) for k in range(i * 100, (i + 1) * 100)]
        t.commit_append(
            spark.createDataFrame(rows, "k int, v double").coalesce(1),
            stats_cols=stats_cols,
        )
    return t


def _merge_low_keys(t, spark):
    src = spark.createDataFrame(
        [(k,) for k in range(0, 100, 10)], "k int"
    )
    t0 = time.perf_counter()
    t.merge_mor(
        src,
        on=["k"],
        when_matched_update={"v": F.col("v") + 1000.0},
        insert_not_matched=False,
    )
    return time.perf_counter() - t0


def test_hull_prune_scans_one_of_eight_files(spark):
    t = _clustered(spark, stats_cols=["k"])
    sec = _merge_low_keys(t, spark)
    assert MERGE_METRICS["files_total"] == 8
    assert MERGE_METRICS["files_scanned"] == 1
    got = {r.k: r.v for r in t.read().collect()}
    assert len(got) == 800
    assert got[0] == 1000.0 and got[50] == 1050.0
    assert got[99] == 99.0 and got[700] == 700.0
    print(f"clustered merge wall-clock: {sec:.3f}s")


def test_no_stats_scans_all_files_same_result(spark):
    t = _clustered(spark, stats_cols=None)
    _merge_low_keys(t, spark)
    assert MERGE_METRICS["files_total"] == 8
    assert MERGE_METRICS["files_scanned"] == 8  # conservative
    got = {r.k: r.v for r in t.read().collect()}
    assert got[0] == 1000.0 and got[700] == 700.0
