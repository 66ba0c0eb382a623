"""Snapshot table: version reads are frozen by their manifest, commits are
O(new files), and a rewrite never disturbs historical readers."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.catalog import load_table
from s3_glue_redshift_guide_spark.sources.snapshots import SnapshotTable

from .conftest import SF_SMOKE


def test_time_travel_and_isolation_across_rewrite(spark):
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_t_"))
    assert t.current_version() == 0
    v1 = t.commit_append(o.filter(F.col("o_orderkey") < 100).repartition(2))
    v2 = t.commit_append(
        o.filter((F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 200))
        .repartition(2)
    )
    assert (v1, v2) == (1, 2)
    n1, n2 = t.read(1).count(), t.read(2).count()
    assert n1 < n2
    assert t.file_count(2) == 4

    # compaction rewrite: same rows, new layout
    t.commit_rewrite(t.read(2).coalesce(1))
    assert t.file_count(3) == 1
    assert t.read(3).count() == n2
    # historical reads unchanged after the rewrite
    assert t.read(1).count() == n1
    assert t.file_count(1) == 2
    # default read = latest
    assert t.read().count() == n2


def test_failed_writer_leaves_no_visible_commit(spark):
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey").limit(10)
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_f_"))
    t.commit_append(o)
    # simulate a crashed commit: data files written, manifest never
    # published — the table must still serve version 1 untouched
    t._write_files(o)
    assert t.current_version() == 1
    assert t.read().count() == 10
