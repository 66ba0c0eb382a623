"""Persisted ANN index (llm/ann_index.py): build/refresh/probe
lifecycle, manifest carry, VACUUM reachability, and the zero-training
probe contract."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.llm import similarity as sim
from s3_glue_redshift_guide_spark.llm.ann_index import (
    ann_index_build,
    ann_index_refresh,
    ann_probe,
)
from s3_glue_redshift_guide_spark.sources.snapshots import (
    SnapshotTable,
    load_manifest,
)

DIM = 8


def _vecs(spark, n=40, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                F.sin(F.col("id") * 0.7 + j * 1.3) + 0.001 * j
            ).cast("double"),
        ).alias("embedding"),
    )


@pytest.fixture(scope="module")
def indexed(spark):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="annidx_"))
    t.commit_append(_vecs(spark))
    ann_index_build(t, dim=DIM, n_lists=4, m=4, k_codes=8)
    return t


def test_probe_trains_nothing_and_matches_inquery(spark, indexed):
    from s3_glue_redshift_guide_spark.llm.similarity import ivfpq_topk

    q = _vecs(spark, 5)
    expected = sorted(
        map(tuple, ivfpq_topk(
            q, _vecs(spark), dim=DIM, k=3, n_lists=4, n_probe=2,
            m=4, k_codes=8,
        ).collect())
    )
    sim.TRAIN_METRICS["lloyd_rounds"] = 0
    got = sorted(
        map(tuple, ann_probe(indexed, q, k=3, n_probe=2).collect())
    )
    assert sim.TRAIN_METRICS["lloyd_rounds"] == 0
    assert got == expected


def test_refresh_is_encode_only_and_incremental(spark, indexed):
    t = indexed
    ann0 = load_manifest(t.root, t.current_version())["ann"]
    # no churn: cursor advance only, no new generation
    t.add_constraint("c_noop", "vec_id IS NOT NULL")
    ann_index_refresh(t)
    ann1 = load_manifest(t.root, t.current_version())["ann"]
    assert ann1["codes"] == ann0["codes"]
    # churn: one new generation holding exactly the appended rows
    t.commit_append(_vecs(spark, 3, start=500))
    sim.TRAIN_METRICS["lloyd_rounds"] = 0
    ann_index_refresh(t)
    assert sim.TRAIN_METRICS["lloyd_rounds"] == 0
    ann2 = load_manifest(t.root, t.current_version())["ann"]
    assert len(ann2["codes"]) == len(ann0["codes"]) + 1
    gen = spark.read.parquet(ann2["codes"][-1])
    assert sorted(r["neighbor_id"] for r in gen.collect()) == [
        500, 501, 502
    ]
    # the fresh vectors are probe-visible (each equals its source row)
    got = ann_probe(t, _vecs(spark, 3, start=500), k=3, n_probe=2)
    assert got.count() == 9


def test_vacuum_keeps_referenced_index_and_sweeps_orphans(
    spark, indexed
):
    t = indexed
    ann = load_manifest(t.root, t.current_version())["ann"]
    orphan = os.path.join(t.root, "_indexes", "ann_orphan")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("x")
    # a fresh never-referenced dir could be a racing writer's staging:
    # the default orphan grace keeps it; explicit grace=0 sweeps it
    deleted = t.vacuum(retain_versions=50)
    assert orphan not in deleted and os.path.isdir(orphan)
    deleted = t.vacuum(retain_versions=50, orphan_grace_seconds=0.0)
    assert orphan in deleted
    assert os.path.isdir(ann["dir"])  # referenced: survives
    assert not os.path.isdir(orphan)


def test_optimize_compacts_generations_probe_unchanged(spark, indexed):
    t = indexed
    from s3_glue_redshift_guide_spark.llm.ann_index import (
        ann_index_optimize,
    )

    # ensure >1 generation exists (the refresh test may have run first,
    # but module fixture order isn't guaranteed — make churn here)
    t.commit_append(_vecs(spark, 2, start=900))
    ann_index_refresh(t)
    q = _vecs(spark, 4)
    before = sorted(
        map(tuple, ann_probe(t, q, k=3, n_probe=2).collect())
    )
    ann_index_optimize(t)
    ann = load_manifest(t.root, t.current_version())["ann"]
    assert len(ann["codes"]) == 1
    after = sorted(
        map(tuple, ann_probe(t, q, k=3, n_probe=2).collect())
    )
    assert after == before
    # idempotent: second optimize is a no-op commit-wise
    v = t.current_version()
    assert ann_index_optimize(t) == v


def test_restore_timestamp_sql_and_ann_refresh_stream(spark):
    """RESTORE ... TO TIMESTAMP AS OF resolves through version_as_of;
    ann_refresh_stream keeps the index covered as the table commits."""
    from s3_glue_redshift_guide_spark.llm.ann_index import (
        ann_refresh_stream,
    )
    from s3_glue_redshift_guide_spark.sql_dml import snapshot_sql

    ticks = iter(float(i) for i in range(1, 30))
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="annstream_"),
        clock=lambda: next(ticks),
    )
    t.commit_append(_vecs(spark, 20))
    ann_index_build(t, dim=DIM, n_lists=4, m=4, k_codes=8)
    ckpt = tempfile.mkdtemp(prefix="annstream_ck_")
    ann_refresh_stream(t, ckpt, available_now=True)
    # a new commit, then the stream drains again: index covers head
    t.commit_append(_vecs(spark, 3, start=700))
    sim.TRAIN_METRICS["lloyd_rounds"] = 0
    ann_refresh_stream(t, ckpt, available_now=True)
    assert sim.TRAIN_METRICS["lloyd_rounds"] == 0
    ann = load_manifest(t.root, t.current_version())["ann"]
    # the refresh commit itself advances head by one, so coverage is
    # exactly the pre-refresh head (which includes the 700-block)
    assert int(ann["covered_version"]) == t.current_version() - 1
    got = ann_probe(t, _vecs(spark, 2, start=700), k=2, n_probe=2)
    assert got.count() == 4
    # RESTORE TIMESTAMP AS OF rewinds to the pre-append version
    v_before = 2  # v1 append, v2 ann build
    import datetime as _dt

    ts = _dt.datetime.fromtimestamp(
        2.5, tz=_dt.timezone.utc
    ).replace(tzinfo=None).isoformat()
    snapshot_sql(
        spark,
        f"RESTORE pysnapshot.`{t.root}` TO TIMESTAMP AS OF '{ts}'",
    )
    assert t.read().count() == 20  # the 700-block is gone


def test_optimize_moves_to_fresh_dir_and_old_ages_out(spark):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="annopt_"))
    t.commit_append(_vecs(spark, 20))
    ann_index_build(t, dim=DIM, n_lists=4, m=4, k_codes=8)
    old_dir = load_manifest(t.root, t.current_version())["ann"]["dir"]
    t.commit_append(_vecs(spark, 2, start=300))
    ann_index_refresh(t)
    from s3_glue_redshift_guide_spark.llm.ann_index import (
        ann_index_optimize,
    )

    ann_index_optimize(t)
    new_dir = load_manifest(t.root, t.current_version())["ann"]["dir"]
    assert new_dir != old_dir
    # within retention both dirs are reachable; past it the old dir
    # (and its superseded generations) reclaims, the new one survives
    deleted = t.vacuum(retain_versions=1)
    assert old_dir in deleted and not os.path.isdir(old_dir)
    assert os.path.isdir(new_dir)
    got = ann_probe(t, _vecs(spark, 2), k=2, n_probe=2)
    assert got.count() == 4
