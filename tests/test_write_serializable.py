"""Write-serializable DML rebase: delete_where/update_where publish on
top of a concurrent pure APPEND (the DML serializes first — appended
rows are not subject to it), and refuse anything that touched rows
they read."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import (
    CommitConflict,
    SnapshotTable,
)


def _kv(spark, lo, n=10):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1)


def _race_once(monkeypatch, spark, root, action):
    """Arrange for ``action`` (a concurrent commit through a second
    handle) to land between the victim DML's read and its publish —
    the first _publish of the victim sees a moved head."""
    orig = SnapshotTable._publish
    state = {"fired": False}

    def racy(self, *a, **k):
        if not state["fired"]:
            state["fired"] = True
            action(SnapshotTable(spark, root))
        return orig(self, *a, **k)

    monkeypatch.setattr(SnapshotTable, "_publish", racy)


def test_delete_rebases_over_concurrent_append(spark, monkeypatch):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="ws_del_"))
    t.commit_append(_kv(spark, 0))
    _race_once(
        monkeypatch, spark, t.root,
        lambda o: o.commit_append(_kv(spark, 100)),
    )
    v = t.delete_where(F.col("k") % 2 == 0)
    # both commits landed: the append's version + the delete's
    assert v == 3
    rows = sorted(r["k"] for r in t.read().collect())
    # old evens deleted; the CONCURRENT append's rows all survive —
    # including its evens (the delete serialized BEFORE the append)
    assert rows == [1, 3, 5, 7, 9] + list(range(100, 110))


def test_update_rebases_over_concurrent_append(spark, monkeypatch):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="ws_upd_"))
    t.commit_append(_kv(spark, 0))
    _race_once(
        monkeypatch, spark, t.root,
        lambda o: o.commit_append(_kv(spark, 100)),
    )
    v = t.update_where(F.col("k") < 3, {"v": F.lit(-1).cast("bigint")})
    assert v == 3
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[0] == got[1] == got[2] == -1
    assert got[5] == 10            # untouched old row
    assert got[100] == 200          # concurrent append intact
    assert len(got) == 20


def test_delete_conflicts_with_concurrent_rewrite(spark, monkeypatch):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="ws_rw_"))
    t.commit_append(_kv(spark, 0))
    _race_once(
        monkeypatch, spark, t.root,
        lambda o: o.commit_rewrite(o.read().coalesce(1)),
    )
    with pytest.raises(CommitConflict):
        t.delete_where(F.col("k") % 2 == 0)
    # nothing half-applied: the rewrite's state is intact
    assert t.read().count() == 10


def test_delete_conflicts_with_concurrent_delete(spark, monkeypatch):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="ws_dd_"))
    t.commit_append(_kv(spark, 0))
    _race_once(
        monkeypatch, spark, t.root,
        lambda o: o.delete_where(F.col("k") == 3),
    )
    with pytest.raises(CommitConflict):
        t.delete_where(F.col("k") % 2 == 0)
    assert sorted(r["k"] for r in t.read().collect()) == [
        0, 1, 2, 4, 5, 6, 7, 8, 9
    ]


def test_delete_conflicts_with_concurrent_constraint(spark, monkeypatch):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="ws_con_"))
    t.commit_append(_kv(spark, 0))
    _race_once(
        monkeypatch, spark, t.root,
        lambda o: o.add_constraint("pos", "v >= 0"),
    )
    with pytest.raises(CommitConflict):
        t.delete_where(F.col("k") % 2 == 0)


def test_merge_rebases_over_concurrent_append(spark, monkeypatch):
    """MERGE gets the same allowance: a blind append landing inside
    the merge's publish window does not fail it — the merge serializes
    first, the appended rows (even same-key ones) belong to the append."""
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="ws_mrg_"))
    t.commit_append(_kv(spark, 0))
    _race_once(
        monkeypatch, spark, t.root,
        lambda o: o.commit_append(_kv(spark, 100)),
    )
    src = spark.range(5, 15).select(
        F.col("id").alias("k"), F.lit(-5).cast("bigint").alias("v")
    )
    v = t.merge_mor(
        src, on=["k"],
        when_matched_update={"v": F.col("__src_v")},
        insert_not_matched=True,
    )
    assert v == 3
    got = {r["k"]: r["v"] for r in t.read().collect()}
    # matched 5..9 updated, 10..14 inserted, concurrent 100..109 intact
    assert all(got[k] == -5 for k in range(5, 15))
    assert got[0] == 0 and got[100] == 200
    assert len(got) == 25


def test_merge_conflicts_with_concurrent_rewrite(spark, monkeypatch):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="ws_mrw_"))
    t.commit_append(_kv(spark, 0))
    _race_once(
        monkeypatch, spark, t.root,
        lambda o: o.commit_rewrite(o.read().coalesce(1)),
    )
    src = spark.range(5, 8).select(
        F.col("id").alias("k"), F.lit(-5).cast("bigint").alias("v")
    )
    with pytest.raises(CommitConflict):
        t.merge_mor(
            src, on=["k"],
            when_matched_update={"v": F.col("__src_v")},
            insert_not_matched=False,
        )
    assert t.read().count() == 10
