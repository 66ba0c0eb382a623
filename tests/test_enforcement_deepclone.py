"""Strict schema enforcement and DEEP CLONE on the snapshot table."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import (
    SnapshotTable,
    load_manifest,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


@pytest.fixture()
def table(spark):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="enf_t_"))
    t.commit_append(_df(spark, 0, 10))
    return t


def test_strict_rejects_new_columns_additive_allows(spark, table):
    table.set_schema_enforcement("strict")
    with pytest.raises(ValueError, match="strict"):
        table.commit_append(
            _df(spark, 10, 12).withColumn("extra", F.lit(1))
        )
    # known columns still append; MISSING columns stay legal
    table.commit_append(_df(spark, 10, 12))
    assert table.read().count() == 12
    table.set_schema_enforcement("additive")
    table.commit_append(
        _df(spark, 12, 14).withColumn("extra", F.lit(1))
    )
    assert "extra" in table.read().columns
    with pytest.raises(ValueError, match="additive.*strict|strict|'"):
        table.set_schema_enforcement("off")


def test_strict_survives_clone_branch_and_connector(spark, table):
    from s3_glue_redshift_guide_spark.sources.pyds import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    table.set_schema_enforcement("strict")
    clone = table.clone_shallow(tempfile.mkdtemp(prefix="enf_c_"))
    with pytest.raises(ValueError, match="strict"):
        clone.commit_append(
            _df(spark, 10, 12).withColumn("x", F.lit(1))
        )
    table.create_branch("dev")
    with pytest.raises(ValueError, match="strict"):
        table.branch("dev").commit_append(
            _df(spark, 10, 12).withColumn("x", F.lit(1))
        )
    # the connector refuses unknown columns at construction
    with pytest.raises(Exception, match="strict"):
        (
            _df(spark, 10, 12)
            .withColumn("x", F.lit(1))
            .write.format("pysnapshot")
            .mode("append")
            .option("root", table.root)
            .save()
        )
    # and accepts the known schema
    (
        _df(spark, 10, 12)
        .write.format("pysnapshot")
        .mode("append")
        .option("root", table.root)
        .save()
    )
    assert table.read().count() == 12
    m = load_manifest(table.root, table.current_version())
    assert m.get("evolution") == "strict"  # connector carried the mode


def test_strict_respects_renames(spark, table):
    table.rename_column("k", "key")
    table.set_schema_enforcement("strict")
    # the CURRENT logical name is legal, the retired one is not
    table.commit_append(
        spark.range(10, 12).withColumnRenamed("id", "key")
    )
    with pytest.raises(ValueError, match="strict"):
        table.commit_append(_df(spark, 12, 14))  # old name 'k'
    assert table.read().count() == 12


def test_deep_clone_owns_its_bytes(spark, table):
    table.delete_where("k >= 8")  # live tombstones must copy
    clone = table.clone_deep(tempfile.mkdtemp(prefix="deep_c_"))
    assert sorted(r.k for r in clone.read().collect()) == list(range(8))
    mc = load_manifest(clone.root, 1)
    ms = load_manifest(table.root, table.current_version())
    assert not set(mc["files"]) & set(ms["files"]), "no shared paths"
    assert all(f.startswith(clone.root) for f in mc["files"])
    # the shallow-clone caveat is GONE: vacuum the source to nothing,
    # the deep clone still reads
    table.commit_replace(ms["files"], _df(spark, 100, 105))
    table.vacuum(retain_versions=1)
    assert sorted(r.k for r in clone.read().collect()) == list(range(8))
    # clone diverges freely
    clone.commit_append(_df(spark, 200, 202))
    assert clone.read().count() == 10
    assert table.read().count() == 5


def test_deep_clone_preserves_partition_layout_and_row_ids(spark):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="deep_p_"))
    t.set_partition_spec(["bucket"])
    t.enable_row_tracking()
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("bucket")
    )
    t.commit_append(df)
    src_ids = {
        (r.k, r._row_id) for r in t.read_with_row_ids().collect()
    }
    clone = t.clone_deep(tempfile.mkdtemp(prefix="deep_pc_"))
    m = load_manifest(clone.root, 1)
    assert all("__part_bucket=" in f for f in m["files"]), (
        "copies keep the partition-path layout"
    )
    got = clone.read_partition({"bucket": 2})
    assert sorted(r.k for r in got.collect()) == [
        k for k in range(40) if k % 4 == 2
    ]
    assert {
        (r.k, r._row_id) for r in clone.read_with_row_ids().collect()
    } == src_ids, "copied rows keep their permanent ids"


def test_merge_not_matched_by_source_delete_syncs(spark):
    """MERGE with all four branches = full table SYNC: the target
    becomes exactly the source in ONE atomic merge-on-read commit."""
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="sync_t_"))
    t.commit_append(
        spark.createDataFrame(
            [(k, float(k)) for k in range(10)], "k long, v double"
        ).coalesce(1)
    )
    src = spark.createDataFrame(
        # keep 0-4 (values bumped), drop 5-9, add 20-22
        [(k, k + 0.5) for k in range(5)]
        + [(k, float(k)) for k in (20, 21, 22)],
        "k long, v double",
    )
    t.merge_mor(
        src,
        on=["k"],
        when_matched_update={"v": F.col("__src_v")},
        when_not_matched_by_source_delete=True,
    )
    got = {(r.k, r.v) for r in t.read().collect()}
    want = {(k, k + 0.5) for k in range(5)} | {
        (k, float(k)) for k in (20, 21, 22)
    }
    assert got == want


def test_merge_nmbs_conditional(spark):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="sync_c_"))
    t.commit_append(
        spark.createDataFrame(
            [(k, float(k)) for k in range(10)], "k long, v double"
        ).coalesce(1)
    )
    src = spark.createDataFrame([(0, 0.5)], "k long, v double")
    # only unmatched rows with k >= 8 delete; 1-7 stay
    t.merge_mor(
        src,
        on=["k"],
        when_matched_update={"v": F.col("__src_v")},
        when_not_matched_by_source_delete=F.col("k") >= 8,
    )
    got = {(r.k, r.v) for r in t.read().collect()}
    want = {(0, 0.5)} | {(k, float(k)) for k in range(1, 8)}
    assert got == want


def test_cluster_by_append_tightens_zone_maps(spark):
    """cluster_by on commit_append (the liquid-clustering write shape):
    clustered appends prune MORE files on either column than the same
    rows appended unclustered."""
    import random as _random

    rng = _random.Random(7)
    rows = [
        (rng.randrange(1000), rng.randrange(1000)) for _ in range(4000)
    ]
    df = lambda: spark.createDataFrame(  # noqa: E731
        rows, "x long, y long"
    ).repartition(8)

    plain = SnapshotTable(spark, tempfile.mkdtemp(prefix="zc_p_"))
    plain.commit_append(df(), stats_cols=["x", "y"])
    clus = SnapshotTable(spark, tempfile.mkdtemp(prefix="zc_c_"))
    clus.commit_append(
        df(), stats_cols=["x", "y"], cluster_by=("x", "y")
    )

    def n_pruned(t):
        kept_x, total = t.pruned_files("x", 0, 49)
        kept_y, _ = t.pruned_files("y", 0, 49)
        return total - len(kept_x), total - len(kept_y)

    px, py = n_pruned(plain)
    cx, cy = n_pruned(clus)
    assert cx > px and cy > py, f"plain=({px},{py}) clustered=({cx},{cy})"
    # same rows either way
    assert clus.read().count() == plain.read().count() == 4000


def test_cdf_update_images(spark):
    """CDF with update pre/post images: an MOR UPDATE surfaces as a
    correlated update_preimage/update_postimage pair (same permanent
    row id), a compaction surfaces as NOTHING, deletes and inserts as
    themselves."""
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="cdfimg_"))
    t.enable_row_tracking()
    t.commit_append(
        spark.createDataFrame(
            [(k, float(k)) for k in range(10)], "k long, v double"
        ).repartition(2)
    )
    v1 = t.current_version()
    t.update_where(F.col("k") % 3 == 0, {"v": F.col("v") + 100.0})
    v2 = t.current_version()
    ch = t.read_changes_images(v1, v2)
    rows = {(r.k, r.v, r._change_type) for r in ch.collect()}
    want = set()
    for k in range(10):
        if k % 3 == 0:
            want.add((k, float(k), "update_preimage"))
            want.add((k, float(k) + 100.0, "update_postimage"))
    assert rows == want
    # pure-layout commit: zero changes
    t.optimize_small_files(1 << 20, 1 << 24)
    v3 = t.current_version()
    assert t.read_changes_images(v2, v3).count() == 0
    # deletes and inserts keep their plain types
    t.delete_where("k = 1")
    t.commit_append(
        spark.createDataFrame([(50, 5.0)], "k long, v double")
    )
    v5 = t.current_version()
    got = {
        (r.k, r._change_type)
        for r in t.read_changes_images(v3, v5).collect()
    }
    assert got == {(1, "delete"), (50, "insert")}


def test_cdf_update_images_requires_tracking(spark):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="cdfimg_n_"))
    t.commit_append(_df(spark, 0, 5))
    with pytest.raises(ValueError, match="row tracking"):
        t.read_changes_images(0, t.current_version())


def test_merge_insert_condition(spark):
    """WHEN NOT MATCHED AND <cond> THEN INSERT: only unmatched source
    rows satisfying the condition insert."""
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="insc_"))
    t.commit_append(
        spark.createDataFrame(
            [(k, float(k)) for k in range(5)], "k long, v double"
        ).coalesce(1)
    )
    src = spark.createDataFrame(
        [(0, 9.0), (10, 1.0), (11, -1.0)], "k long, v double"
    )
    t.merge_mor(
        src,
        on=["k"],
        when_matched_update={"v": F.col("__src_v")},
        insert_not_matched=F.col("__src_v") > 0,
    )
    got = {(r.k, r.v) for r in t.read().collect()}
    want = {(0, 9.0)} | {(k, float(k)) for k in range(1, 5)} | {
        (10, 1.0)
    }  # k=11 filtered by the insert condition
    assert got == want
    # empty-table path honors the condition too
    t2 = SnapshotTable(spark, tempfile.mkdtemp(prefix="insc2_"))
    t2.merge_mor(src, on=["k"], insert_not_matched=F.col("__src_v") > 0)
    assert {(r.k, r.v) for r in t2.read().collect()} == {
        (0, 9.0),
        (10, 1.0),
    }


def test_optimize_scoped_to_partition(spark):
    """OPTIMIZE ... WHERE: only the named partition's files compact;
    other partitions' layout is untouched."""
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="optw_"))
    t.set_partition_spec(["bucket"])
    for lo in (0, 100, 200):  # 3 commits x 2 partitions = fragmented
        t.commit_append(
            spark.range(lo, lo + 20).select(
                F.col("id").alias("k"), (F.col("id") % 2).alias("bucket")
            )
        )
    m0 = load_manifest(t.root, t.current_version())
    other_before = [f for f in m0["files"] if "__part_bucket=1" in f]
    r = t.optimize_small_files(
        1 << 20, 1 << 24, where_eq={"bucket": 0}
    )
    assert r["n_files_after"] < r["n_files_before"]
    m1 = load_manifest(t.root, t.current_version())
    assert [
        f for f in m1["files"] if "__part_bucket=1" in f
    ] == other_before, "out-of-scope partition untouched"
    assert t.read().count() == 60
    assert (
        len([f for f in m1["files"] if "__part_bucket=0" in f]) == 1
    ), "in-scope partition compacted to one file"


def test_strict_composes_with_type_widening(spark, table):
    """Strict enforcement on a WIDENED table must use the banked reader
    schema — a mergeSchema footer union over mixed-width files crashes,
    which is exactly what the banked schema exists to avoid."""
    table.commit_append(
        spark.range(10, 12).select(F.col("id").cast("int").alias("w"))
    )
    table.widen_column("w", "bigint")
    table.commit_append(
        spark.range(12, 14).select(
            F.col("id").alias("k"), F.col("id").alias("w")
        )
    )  # mixed-width eras now coexist
    table.set_schema_enforcement("strict")
    table.commit_append(_df(spark, 14, 16))  # known column: fine
    with pytest.raises(ValueError, match="strict"):
        table.commit_append(
            _df(spark, 16, 18).withColumn("zzz", F.lit(1))
        )
    assert table.read().count() == 16
