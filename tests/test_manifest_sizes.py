"""Manifest-banked file sizes: every commit records its files' byte
sizes, so OPTIMIZE planning and the join advisor read pure metadata
instead of issuing per-file stat calls against object storage."""

from __future__ import annotations

import os
import tempfile

from s3_glue_redshift_guide_spark.operators.advisor import (
    table_size_bytes,
)
from s3_glue_redshift_guide_spark.sources.snapshots import (
    SnapshotTable,
    load_manifest,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def test_every_commit_banks_sizes(spark):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="sizes_t_"))
    t.commit_append(_df(spark, 0, 100).repartition(3))
    t.commit_append(_df(spark, 100, 200).repartition(2))
    m = load_manifest(t.root, t.current_version())
    assert set(m["sizes"]) == set(m["files"])
    for f, s in m["sizes"].items():
        assert s == os.path.getsize(f)
    # advisor answers from the banked map — byte-identical to stat
    assert table_size_bytes(t.root) == sum(m["sizes"].values())


def test_optimize_plans_from_banked_sizes(spark, monkeypatch):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="sizes_o_"))
    t.commit_append(_df(spark, 0, 100).repartition(4))
    # planning must read banked sizes only: the ONLY legitimate stat
    # calls during OPTIMIZE are for the freshly-compacted output files
    # (banked by the publish) — never the existing, already-banked set
    import s3_glue_redshift_guide_spark.sources.snapshots as snap_mod

    banked_files = set(
        load_manifest(t.root, t.current_version())["files"]
    )
    real_getsize = os.path.getsize

    def guarded(path):
        assert path not in banked_files, (
            "OPTIMIZE stat-ed a file whose size is banked"
        )
        return real_getsize(path)

    monkeypatch.setattr(snap_mod.os.path, "getsize", guarded)
    try:
        r = t.optimize_small_files(
            small_threshold=1 << 20, target_bytes=1 << 24
        )
    finally:
        monkeypatch.undo()
    assert r["n_files_after"] < r["n_files_before"]
    assert t.read().count() == 100


def test_pre_banking_manifest_falls_back_to_stat(spark):
    import json

    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="sizes_f_"))
    t.commit_append(_df(spark, 0, 50).repartition(2))
    # simulate a manifest written before size banking existed
    p = t._manifest_path(t.current_version())
    m = json.load(open(p))
    m.pop("sizes")
    os.unlink(p)
    json.dump(m, open(p, "w"))
    assert table_size_bytes(t.root) == sum(
        os.path.getsize(f) for f in m["files"]
    )
    r = t.optimize_small_files(
        small_threshold=1 << 20, target_bytes=1 << 24
    )
    assert r["n_files_after"] <= r["n_files_before"]


def test_connector_commit_banks_sizes(spark):
    from s3_glue_redshift_guide_spark.sources.pyds import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="sizes_c_"))
    t.commit_append(_df(spark, 0, 50).coalesce(1))
    (
        _df(spark, 50, 80)
        .write.format("pysnapshot")
        .mode("append")
        .option("root", t.root)
        .save()
    )
    m = load_manifest(t.root, t.current_version())
    assert set(m["sizes"]) == set(m["files"])
    assert table_size_bytes(t.root) == sum(m["sizes"].values())
