"""CONVERT TO snapshot: an existing plain-parquet directory becomes a
snapshot table in place — nothing rewritten, full table features from
v1 on, originals never garbage-collected."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import (
    SnapshotTable,
    load_manifest,
)


def _plain_dir(spark, n=100):
    d = tempfile.mkdtemp(prefix="convert_src_")
    spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_convert_in_place_no_rewrite(spark):
    d = _plain_dir(spark)
    before = {
        p: os.path.getmtime(p)
        for p in (
            os.path.join(wr, f)
            for wr, _x, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )
    }
    t = SnapshotTable.convert_parquet_dir(spark, d, stats_cols=["k"])
    assert t.current_version() == 1
    m = load_manifest(d, 1)
    assert sorted(m["files"]) == sorted(before)
    # bytes untouched: same paths, same mtimes
    assert all(os.path.getmtime(p) == ts for p, ts in before.items())
    assert sorted(r["k"] for r in t.read().collect()) == list(range(100))
    # footer stats banked → zone pruning works immediately
    keep, total = t.pruned_files("k", 1000, 2000)
    assert total == 4 and len(keep) == 0
    # the log is live: DML works from v1
    t.delete_where(F.col("k") < 10)
    assert t.read().count() == 90
    assert t.read(1).count() == 100  # time travel to the converted set
    ops = [r["operation"] for r in t.history().collect()]
    assert ops[-1] == "CONVERT"


def test_convert_refuses_twice_and_empty(spark):
    import pytest

    d = _plain_dir(spark, 10)
    SnapshotTable.convert_parquet_dir(spark, d)
    with pytest.raises(ValueError, match="already a snapshot"):
        SnapshotTable.convert_parquet_dir(spark, d)
    empty = tempfile.mkdtemp(prefix="convert_empty_")
    with pytest.raises(ValueError, match="no parquet files"):
        SnapshotTable.convert_parquet_dir(spark, empty)


def test_convert_originals_survive_vacuum(spark):
    d = _plain_dir(spark)
    t = SnapshotTable.convert_parquet_dir(spark, d)
    originals = list(load_manifest(d, 1)["files"])
    # compact into data/ — the originals age out of the log
    t.commit_rewrite(t.read().coalesce(1))
    deleted = t.vacuum(retain_versions=1, orphan_grace_seconds=0.0)
    assert not any(p in deleted for p in originals)
    assert all(os.path.exists(p) for p in originals)
    assert t.read().count() == 100
