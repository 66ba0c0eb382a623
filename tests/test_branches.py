"""Branches, tags, and write-audit-publish on the snapshot table.

A branch is a full SnapshotTable forked at a main version (own manifest
log under ``_branches/<name>``, data shared by absolute path); a tag is
an immutable named version that pins VACUUM retention. Fork and
fast-forward copy the manifest VERBATIM, so every metadata family —
deletion vectors, schema maps, constraints, row tracking, the txn map,
the COPY INTO ledger — survives the ref machinery by construction.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pytest

from s3_glue_redshift_guide_spark.sources.snapshots import (
    CommitConflict,
    SnapshotTable,
    load_manifest,
    latest_version,
)


def _range(spark, lo, hi, col="k"):
    return spark.range(lo, hi).withColumnRenamed("id", col)


@pytest.fixture()
def table(spark):
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="branch_t_"), clock=lambda: 1000.0
    )
    t.commit_append(_range(spark, 0, 10))
    return t


def test_branch_isolation_both_directions(spark, table):
    table.create_branch("dev")
    b = table.branch("dev")
    assert b.read().count() == 10  # fork sees the fork-point snapshot
    b.commit_append(_range(spark, 100, 105))
    assert b.read().count() == 15
    assert table.read().count() == 10  # branch commits invisible on main
    table.commit_append(_range(spark, 200, 203))
    assert b.read().count() == 15  # main commits invisible on branch
    assert table.branches() == {"dev": 1}


def test_wap_fast_forward_publishes_atomically(spark, table):
    table.create_branch("wap")
    b = table.branch("wap")
    b.commit_append(_range(spark, 100, 105))
    # audit step: checks run against the BRANCH, main untouched
    assert b.read().where("k IS NULL").count() == 0
    v = table.fast_forward("wap")
    assert v == table.current_version()
    assert table.read().count() == 15
    ops = [
        r.operation
        for r in table.history().orderBy("version").collect()
    ]
    assert ops[-1] == "FAST_FORWARD"


def test_fast_forward_requires_ancestry(spark, table):
    table.create_branch("stale")
    table.branch("stale").commit_append(_range(spark, 100, 101))
    table.commit_append(_range(spark, 200, 201))  # main advances
    with pytest.raises(CommitConflict):
        table.fast_forward("stale")


def test_ff_carries_every_metadata_family_verbatim(spark, table):
    # main accumulates one of each family before the fork
    table.delete_where("k >= 8")  # deletion vectors
    table.add_constraint("nonneg", "k >= 0")  # CHECK constraints
    table.copy_into(_src_parquet(spark, table))  # COPY INTO ledger
    table.create_branch("wap")
    b = table.branch("wap")
    # the branch enforces main's writer contract
    with pytest.raises(ValueError, match="nonneg"):
        b.commit_append(_range(spark, -5, -1))
    b.commit_append(_range(spark, 100, 103))
    table.fast_forward("wap")
    m = load_manifest(table.root, table.current_version())
    assert m.get("constraints", {}).get("nonneg") == "k >= 0"
    assert m["dv"], "deletion vectors survived fork + fast-forward"
    assert m.get("copied"), "COPY ledger survived fork + fast-forward"
    # the tombstoned rows (k=8,9) stay deleted after the publish;
    # k=42 is the COPY INTO row, not a resurrection
    assert table.read().where("k >= 8 AND k < 42").count() == 0
    assert table.read().count() == 8 + 1 + 3  # 10-2 kept, 1 copied, 3 branch


def _src_parquet(spark, table):
    d = os.path.join(table.root, "copy_src")
    _range(spark, 42, 43).coalesce(1).write.mode("overwrite").parquet(d)
    return sorted(
        glob.glob(os.path.join(d, "*.parquet"))
    )


def test_tag_read_and_vacuum_pinning(spark, table):
    table.create_tag("v1.0")
    table.commit_append(_range(spark, 100, 110))
    table.commit_append(_range(spark, 200, 210))
    assert table.read(tag="v1.0").count() == 10
    table.vacuum(retain_versions=1)
    # the tagged snapshot survives a window that would collect it
    assert table.read(tag="v1.0").count() == 10
    assert table.read().count() == 30
    # releasing the tag releases the pin
    table.delete_tag("v1.0")
    table.vacuum(retain_versions=1)
    with pytest.raises(Exception):
        table.read(version=1).count()


def test_tags_are_immutable_and_validated(spark, table):
    table.create_tag("rel")
    with pytest.raises(ValueError, match="already exists"):
        table.create_tag("rel")
    with pytest.raises(ValueError, match="no such tag"):
        table.tag_version("ghost")
    with pytest.raises(ValueError, match="invalid ref"):
        table.create_tag("../escape")
    with pytest.raises(ValueError, match="invalid ref"):
        table.create_branch("a/b")
    assert table.tags() == {"rel": 1}


def test_dropped_branch_files_reclaim_published_survive(spark, table):
    # published branch: its files become main's after fast-forward
    table.create_branch("keep")
    table.branch("keep").commit_append(_range(spark, 100, 105))
    table.fast_forward("keep")
    kept = [
        f
        for f in load_manifest(table.root, table.current_version())["files"]
        if "_branches" in f
    ]
    assert kept, "fast-forwarded files live under the branch dir"
    # abandoned branch: dropping the log makes its files collectable
    table.create_branch("tmp")
    table.branch("tmp").commit_append(_range(spark, 300, 310))
    orphans = glob.glob(
        os.path.join(
            table.root, "_branches", "tmp", "data", "**", "*.parquet"
        ),
        recursive=True,
    )
    assert orphans
    # a LIVE branch is a GC root: vacuum must not touch its files
    table.vacuum(retain_versions=50)
    assert all(os.path.exists(f) for f in orphans)
    table.drop_branch("tmp")
    table.vacuum(retain_versions=50)
    assert all(not os.path.exists(f) for f in orphans)
    assert all(os.path.exists(f) for f in kept)
    assert table.read().count() == 15


def test_branch_is_a_full_table(spark, table):
    """Every operator works on a branch — it IS a SnapshotTable."""
    table.create_branch("dev")
    b = table.branch("dev")
    b.delete_where("k < 2")
    from pyspark.sql import functions as F

    b.update_where("k = 5", {"k": F.lit(50).cast("long")})
    b.optimize_small_files(
        small_threshold=1 << 20, target_bytes=1 << 24
    )
    assert sorted(r.k for r in b.read().collect()) == [
        2, 3, 4, 6, 7, 8, 9, 50,
    ]
    assert table.read().count() == 10  # main never flinched
    table.fast_forward("dev")
    assert sorted(r.k for r in table.read().collect()) == [
        2, 3, 4, 6, 7, 8, 9, 50,
    ]


def test_row_tracking_survives_fork_and_ff(spark, table):
    table.enable_row_tracking()
    table.create_branch("dev")
    b = table.branch("dev")
    b.commit_append(_range(spark, 100, 105))
    ids_branch = {
        r._row_id for r in b.read_with_row_ids().collect()
    }
    assert len(ids_branch) == 15  # unique ids across fork + branch commit
    table.fast_forward("dev")
    ids_main = {
        r._row_id for r in table.read_with_row_ids().collect()
    }
    assert ids_main == ids_branch
    # main's next commit allocates PAST the branch's watermark
    table.commit_append(_range(spark, 200, 203))
    ids2 = {r._row_id for r in table.read_with_row_ids().collect()}
    assert len(ids2) == 18


def test_branch_from_historical_version(spark, table):
    table.commit_append(_range(spark, 100, 105))
    table.create_branch("hotfix", version=1)
    b = table.branch("hotfix")
    assert b.read().count() == 10  # v1, not head
    assert latest_version(b.root) == 1


def test_connector_reads_branches_and_tags(spark, table):
    """The engine surface reads refs: .option('branch', name) reads a
    branch head, .option('tag', name) an immutable version — Iceberg's
    ref reads through the registered format."""
    from s3_glue_redshift_guide_spark.sources.pyds import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    table.create_tag("v1")
    table.create_branch("dev")
    table.branch("dev").commit_append(_range(spark, 100, 105))
    table.commit_append(_range(spark, 200, 202))

    rd = lambda **opts: (  # noqa: E731
        spark.read.format("pysnapshot")
        .options(root=table.root, **opts)
        .load()
    )
    assert rd().count() == 12  # main head
    assert rd(branch="dev").count() == 15  # fork(10) + branch(5)
    assert rd(tag="v1").count() == 10  # the tagged snapshot
    import pytest as _pytest

    with _pytest.raises(Exception, match="no such branch"):
        rd(branch="ghost").count()
    with _pytest.raises(Exception, match="no such tag"):
        rd(tag="ghost").count()


def test_connector_writes_and_streams_branches(spark, table):
    """WAP through the engine surface: df.write with
    .option('branch', name) commits onto the branch (main untouched),
    a readStream with the same option follows the branch's log, and
    writing to a tag or a nonexistent branch fails loudly."""
    import tempfile as _tf

    from s3_glue_redshift_guide_spark.sources.pyds import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    table.create_branch("wap")
    (
        _range(spark, 100, 105)
        .write.format("pysnapshot")
        .mode("append")
        .options(root=table.root, branch="wap")
        .save()
    )
    assert table.branch("wap").read().count() == 15
    assert table.read().count() == 10, "main untouched by branch write"
    table.fast_forward("wap")
    assert table.read().count() == 15
    # the branch log streams: a fresh stream over the branch drains its
    # appends (fork copy = v1, connector append = v2)
    table.create_branch("feed")
    (
        _range(spark, 300, 303)
        .write.format("pysnapshot")
        .mode("append")
        .options(root=table.root, branch="feed")
        .save()
    )
    got = (
        spark.readStream.format("pysnapshot")
        .options(root=table.root, branch="feed")
        .load()
    )
    q = (
        got.writeStream.format("memory")
        .queryName("branch_stream")
        .outputMode("append")
        .option(
            "checkpointLocation", _tf.mkdtemp(prefix="br_stream_ck_")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # bootstrap covers the fork copy (15 rows at branch v1) plus the
    # branch-side append (3 rows at v2)
    bs = spark.table("branch_stream")
    assert bs.count() == 18
    assert bs.where("k >= 300").count() == 3
    import pytest as _pytest

    table.create_tag("rel")
    with _pytest.raises(Exception, match="immutable"):
        (
            _range(spark, 0, 1)
            .write.format("pysnapshot")
            .mode("append")
            .options(root=table.root, tag="rel")
            .save()
        )
    with _pytest.raises(Exception, match="no such branch"):
        (
            _range(spark, 0, 1)
            .write.format("pysnapshot")
            .mode("append")
            .options(root=table.root, branch="ghost")
            .save()
        )
