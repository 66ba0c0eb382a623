"""autoCompact (the ``auto.compact`` table property): a fragmented
partition compacts synchronously after the append that crossed the
threshold — rows identical, scoped to touched partitions, off by
default."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import (
    SnapshotTable,
    load_manifest,
    partition_values_from_path,
)


def _tiny(spark, lo, n=5):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k")
    ).coalesce(1)


def test_auto_compact_bounds_file_count(spark):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="ac_flat_"))
    t.commit_append(_tiny(spark, 0))
    t.set_tblproperties(
        {"auto.compact": "true", "auto.compact.min.files": "5"}
    )
    for i in range(1, 9):
        t.commit_append(_tiny(spark, i * 10))
    d = t.detail()
    # 9 appends would leave 9 files without compaction
    assert d["n_files"] < 9
    assert sorted(
        r["k"] for r in t.read().collect()
    ) == sorted(k for i in range(9) for k in range(i * 10, i * 10 + 5))
    ops = [r["operation"] for r in t.history().collect()]
    assert "OPTIMIZE" in ops
    # off by default: a plain table just fragments
    t2 = SnapshotTable(spark, tempfile.mkdtemp(prefix="ac_off_"))
    for i in range(9):
        t2.commit_append(_tiny(spark, i * 10))
    assert t2.detail()["n_files"] == 9


def test_auto_compact_scopes_to_touched_partition(spark):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="ac_part_"))
    t.create_table(
        "k BIGINT, day STRING",
        partition_by=["day"],
        properties={
            "auto.compact": "true",
            "auto.compact.min.files": "4",
        },
    )
    def batch(lo, day):
        return spark.range(lo, lo + 3).select(
            F.col("id").alias("k"), F.lit(day).alias("day")
        ).coalesce(1)
    for i in range(4):
        t.commit_append(batch(i * 10, "A"))
    t.commit_append(batch(100, "B"))
    t.commit_append(batch(110, "B"))
    m = load_manifest(t.root, t.current_version())
    per = {}
    for f in m["files"]:
        per.setdefault(
            partition_values_from_path(f).get("day"), []
        ).append(f)
    # day A crossed min.files=4 and compacted to one file; day B (2
    # files, under threshold) was never touched by A's compaction
    assert len(per["A"]) == 1
    assert len(per["B"]) == 2
    assert t.read().count() == 18
