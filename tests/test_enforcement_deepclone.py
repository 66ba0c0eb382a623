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
