"""Bucketed snapshot layout → shuffle-free co-partitioned joins
(VERDICT-r8 directive #2, the storage-partitioned-join posture).

The contract under test: a table with the ``bucket.by = col:n``
property writes every commit through Spark's native bucketed writer,
``register_bucketed_view`` surfaces the live snapshot as a catalog
bucketed table, and a join of two co-bucketed tables runs with ZERO
hash-partitioning Exchange — plus the refusal cases where the catalog
scan cannot represent snapshot semantics (renames, deletion vectors).
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import SnapshotTable


def _bucketed(spark, col, n, prefix):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix=prefix))
    t.set_tblproperties({"bucket.by": f"{col}:{n}"})
    return t


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_zero_shuffle(spark):
    ta = _bucketed(spark, "k", 4, "cp_a_")
    ta.commit_append(
        spark.createDataFrame([(i, i * 10) for i in range(50)], "k int, a int")
    )
    ta.commit_append(
        spark.createDataFrame(
            [(i, i * 10) for i in range(50, 100)], "k int, a int"
        )
    )
    tb = _bucketed(spark, "k", 4, "cp_b_")
    tb.commit_append(
        spark.createDataFrame([(i, i * 3) for i in range(80)], "k int, b int")
    )
    va = ta.register_bucketed_view("cpj_a")
    vb = tb.register_bucketed_view("cpj_b")
    j = (
        spark.table(va)
        .select("k", "a")
        .join(spark.table(vb).select("k", "b"), "k")
        .groupBy("k")
        .agg(F.sum(F.col("a") + F.col("b")).alias("s"))
    )
    rows = j.collect()
    assert len(rows) == 80
    assert sum(r.s for r in rows) == sum(i * 13 for i in range(80))
    p = _plan(j)
    assert "Bucketed: true" in p
    # join AND per-key aggregate both ride the storage distribution
    assert p.count("Exchange hashpartitioning") == 0


def test_bucketed_view_isolates_dead_files_after_delete(spark):
    t = _bucketed(spark, "k", 4, "cp_del_")
    t.commit_append(
        spark.createDataFrame([(i, i) for i in range(40)], "k int, v int")
    )
    t.delete_where(F.col("k") % 2 == 0)  # MOR tombstones first...
    t.materialize_deletes()  # ...folded into a bucketed CoW rewrite
    v = t.register_bucketed_view("cpj_del")
    got = sorted(r.k for r in spark.table(v).select("k").collect())
    assert got == [i for i in range(40) if i % 2 == 1]
    # the rewrite kept the bucket contract: rejoining on k still
    # elides the shuffle
    j = spark.table(v).join(spark.table(v).select("k"), "k")
    j.collect()
    assert _plan(j).count("Exchange hashpartitioning") == 0


def test_bucketed_view_serves_nonlayout_rename_shuffle_free(spark):
    # round 10 (VERDICT-r9 #4): renaming a NON-layout column no longer
    # forfeits the zero-Exchange join — the catalog table declares the
    # physical union schema and a coalesce view surfaces current names
    t = _bucketed(spark, "k", 4, "cp_ren_ok_")
    t.commit_append(
        spark.createDataFrame(
            [(i, 10 * i) for i in range(8)], "k int, v int"
        )
    )
    t.rename_column("v", "w")
    t.commit_append(
        spark.createDataFrame(
            [(i, 10 * i) for i in range(8, 12)], "k int, w int"
        )
    )
    v = t.register_bucketed_view("cpj_ren_ok")
    rows = sorted(
        (r["k"], r["w"]) for r in spark.table(v).collect()
    )
    # pre-rename rows surface under the NEW name, value-intact
    assert rows == [(i, 10 * i) for i in range(12)]
    j = (
        spark.table(v)
        .join(spark.table(v).select("k"), "k")
        .groupBy("k")
        .count()
    )
    j.collect()
    assert _plan(j).count("Exchange hashpartitioning") == 0


def test_bucketed_view_serves_dv_masked_shuffle_free(spark):
    # round 10: MoR point deletes ride the view as a row-index filter —
    # deleted rows vanish, the bucket distribution (and zero-Exchange
    # join) survives
    t2 = _bucketed(spark, "k", 4, "cp_dv_")
    t2.commit_append(
        spark.createDataFrame(
            [(i, i) for i in range(10)], "k int, v int"
        )
    )
    t2.delete_where(F.col("k") == 3)  # MOR: leaves a DV sidecar
    v = t2.register_bucketed_view("cpj_dv_ok")
    got = sorted(r["k"] for r in spark.table(v).collect())
    assert got == [0, 1, 2, 4, 5, 6, 7, 8, 9]
    j = (
        spark.table(v)
        .join(spark.table(v).select("k"), "k")
        .groupBy("k")
        .count()
    )
    j.collect()
    assert _plan(j).count("Exchange hashpartitioning") == 0


def test_bucketed_view_refuses_oversized_dv(spark):
    from s3_glue_redshift_guide_spark.sources import snapshots as _sn

    t = _bucketed(spark, "k", 4, "cp_dvbig_")
    t.commit_append(
        spark.createDataFrame(
            [(i, i) for i in range(40)], "k int, v int"
        )
    )
    t.delete_where(F.col("k") % 2 == 0)  # 20 DV positions
    # shrink the budget instead of writing 10k+ real tombstones
    import unittest.mock as _mock

    m = _sn.load_manifest(t.root, t.current_version())
    # unreadable sidecar dirs make the byte gate assume oversized —
    # past even the round-11 broadcast anti-join tier, where the only
    # named recovery is a physical rewrite
    big = {f: ["/nonexistent/dv_sidecars"] for f in m["files"][:2]}
    with _mock.patch.object(
        _sn, "load_manifest", return_value={**m, "dv": big}
    ):
        with pytest.raises(ValueError, match="REWRITE PHYSICAL"):
            t.register_bucketed_view("cpj_dvbig")


def test_bucket_property_validation(spark):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="cp_val_"))
    t.set_tblproperties({"bucket.by": "k"})  # missing :n
    with pytest.raises(ValueError, match="bucket.by"):
        t.commit_append(spark.createDataFrame([(1,)], "k int"))

    t2 = SnapshotTable(spark, tempfile.mkdtemp(prefix="cp_val2_"))
    t2.set_tblproperties({"bucket.by": "k:8", "cluster.by": "k,v"})
    with pytest.raises(ValueError, match="mutually exclusive"):
        t2.commit_append(spark.createDataFrame([(1, 2)], "k int, v int"))


def test_bucket_spec_cannot_change_over_existing_files(spark):
    # r9 self-review: the bucket spec IS the join-time hash mapping —
    # declaring (or changing) it over files written under a different
    # spec would serve a WRONG murmur3 mapping to every bucketed join
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="cp_pre_"))
    t.commit_append(spark.createDataFrame([(1, 2)], "k int, v int"))
    with pytest.raises(ValueError, match="bucket.by cannot change"):
        t.set_tblproperties({"bucket.by": "k:4"})
    t2 = _bucketed(spark, "k", 4, "cp_chg_")
    t2.commit_append(spark.createDataFrame([(1, 2)], "k int, v int"))
    with pytest.raises(ValueError, match="bucket.by cannot change"):
        t2.set_tblproperties({"bucket.by": "k:8"})
    # re-asserting the SAME spec is a no-op, not a change
    t2.set_tblproperties({"bucket.by": "k:4"})


def test_bucketed_files_carry_bucket_ids(spark):
    t = _bucketed(spark, "k", 4, "cp_ids_")
    t.commit_append(
        spark.createDataFrame([(i, i) for i in range(20)], "k int, v int")
    )
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )

    m = load_manifest(t.root, t.current_version())
    import re

    ids = {
        re.search(r"_(\d{5})\.", os.path.basename(f)).group(1)
        for f in m["files"]
    }
    assert len(ids) == len(m["files"])  # one file per bucket
    assert ids <= {f"{i:05d}" for i in range(4)}


def test_create_table_clustered_by_sets_bucket_property(spark):
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )
    from s3_glue_redshift_guide_spark.sql_dml import snapshot_sql

    root = tempfile.mkdtemp(prefix="cp_ddl_") + "/t"
    snapshot_sql(
        spark,
        f"CREATE TABLE pysnapshot.`{root}` (k int, v int) "
        "CLUSTERED BY (k) INTO 4 BUCKETS",
    )
    t = SnapshotTable(spark, root)
    m = load_manifest(root, t.current_version())
    assert (m.get("properties") or {}).get("bucket.by") == "k:4"
    t.commit_append(
        spark.createDataFrame([(i, i) for i in range(20)], "k int, v int")
    )
    v = t.register_bucketed_view("cpj_ddl")
    assert spark.table(v).count() == 20


def test_ctas_clustered_by_writes_bucketed(spark):
    from s3_glue_redshift_guide_spark.sql_dml import snapshot_sql

    spark.createDataFrame(
        [(i, i * 2) for i in range(16)], "k int, v int"
    ).createOrReplaceTempView("cp_ctas_src")
    root = tempfile.mkdtemp(prefix="cp_ctas_") + "/t"
    snapshot_sql(
        spark,
        f"CREATE TABLE pysnapshot.`{root}` "
        "CLUSTERED BY (k) INTO 4 BUCKETS "
        "AS SELECT k, v FROM cp_ctas_src",
    )
    t = SnapshotTable(spark, root)
    v = t.register_bucketed_view("cpj_ctas")
    assert spark.table(v).count() == 16


def test_clustered_by_and_cluster_by_conflict(spark):
    from s3_glue_redshift_guide_spark.sql_dml import snapshot_sql

    root = tempfile.mkdtemp(prefix="cp_ddl2_") + "/t"
    with pytest.raises(ValueError, match="mutually exclusive"):
        snapshot_sql(
            spark,
            f"CREATE TABLE pysnapshot.`{root}` (k int, v int) "
            "CLUSTERED BY (k) INTO 4 BUCKETS CLUSTER BY (k, v)",
        )


def test_cross_family_type_drift_refused_in_view(spark):
    # round 10 serves in-family widening (see
    # test_bucketed_view_serves_widened_nonkey_column); what stays
    # refused is physical type drift that does NOT widen to the banked
    # type — simulate by banking a cross-family reader type
    from s3_glue_redshift_guide_spark.sources import snapshots as _sn

    t = _bucketed(spark, "k", 4, "cp_drift_")
    t.commit_append(
        spark.createDataFrame([(1, 2)], "k int, v int")
    )
    import unittest.mock as _mock

    m = _sn.load_manifest(t.root, t.current_version())
    with _mock.patch.object(
        _sn,
        "load_manifest",
        return_value={**m, "types": {"k": "int", "v": "double"}},
    ):
        with pytest.raises(ValueError, match="does not widen"):
            t.register_bucketed_view("cpj_drift")


def test_zorder_write_clause_conflicts_with_buckets(spark):
    t = _bucketed(spark, "k", 4, "cp_zc_")
    t.commit_append(
        spark.createDataFrame(
            [(i, i) for i in range(10)], "k int, v int"
        )
    )
    with pytest.raises(ValueError, match="Z-order"):
        t.commit_append(
            spark.createDataFrame([(11, 11)], "k int, v int"),
            cluster_by=("k", "v"),
        )
    # plain compaction still flows through the bucketed writer
    t.optimize_small_files(1 << 30, 1 << 30)
    v = t.register_bucketed_view("cpj_zc")
    assert spark.table(v).count() == 10


def test_vacuum_sweeps_aged_view_farms_keeps_fresh(spark):
    t = _bucketed(spark, "k", 4, "cp_vac_")
    t.commit_append(
        spark.createDataFrame([(i, i) for i in range(8)], "k int, v int")
    )
    t.register_bucketed_view("cpj_vac1")
    farms = os.path.join(t.root, "_bucket_views")
    assert len(os.listdir(farms)) == 1
    # fresh farm survives the default grace window
    t.vacuum(retain_versions=1)
    assert len(os.listdir(farms)) == 1
    # aged farm (grace 0) sweeps; a re-register serves again
    t.vacuum(retain_versions=1, orphan_grace_seconds=0)
    assert os.listdir(farms) == []
    v = t.register_bucketed_view("cpj_vac2")
    assert spark.table(v).count() == 8


def test_rename_of_layout_column_carries_into_properties(spark):
    # r9 self-review: renaming the bucket/cluster column previously
    # wedged every subsequent append (the property kept the old name)
    t = _bucketed(spark, "k", 4, "cp_ren_")
    t.commit_append(
        spark.createDataFrame([(i, i) for i in range(8)], "k int, v int")
    )
    t.rename_column("k", "kk")
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )

    m = load_manifest(t.root, t.current_version())
    assert m["properties"]["bucket.by"] == "kk:4"
    # appends keep flowing under the new logical name (values hash
    # identically — the files stay bucket-correct)
    t.commit_append(
        spark.createDataFrame([(100, 100)], "kk int, v int")
    )
    assert t.read().count() == 9
    # the catalog view honestly refuses (physical names differ now)
    with pytest.raises(ValueError, match="renamed"):
        t.register_bucketed_view("cpj_ren")

    t2 = SnapshotTable(spark, tempfile.mkdtemp(prefix="cp_ren2_"))
    t2.set_tblproperties({"cluster.by": "a,b"})
    t2.commit_append(
        spark.createDataFrame([(1, 2)], "a int, b int")
    )
    t2.rename_column("b", "bb")
    m2 = load_manifest(t2.root, t2.current_version())
    assert m2["properties"]["cluster.by"] == "a,bb"
    t2.commit_append(spark.createDataFrame([(3, 4)], "a int, bb int"))
    assert t2.read().count() == 2


def test_drop_of_layout_column_rejected(spark):
    t = _bucketed(spark, "k", 4, "cp_drop_")
    t.commit_append(
        spark.createDataFrame([(1, 2)], "k int, v int")
    )
    with pytest.raises(ValueError, match="layout column"):
        t.drop_column("k")
    t.drop_column("v")  # non-layout columns still drop fine


def test_bucketed_view_serves_widened_nonkey_column(spark):
    # round 10: a widened NON-bucket column reads through the catalog
    # table at the banked width (Spark 4 parquet upcast), join stays
    # Exchange-free
    t = _bucketed(spark, "k", 4, "cp_wide_")
    t.commit_append(
        spark.createDataFrame(
            [(i, i) for i in range(8)], "k int, v int"
        )
    )
    t.widen_column("v", "bigint")
    t.commit_append(
        spark.createDataFrame(
            [(i, 10 * i) for i in range(8, 12)], "k int, v bigint"
        )
    )
    v = t.register_bucketed_view("cpj_wide_ok")
    assert dict(spark.table(v).dtypes)["v"] == "bigint"
    rows = sorted((r["k"], r["v"]) for r in spark.table(v).collect())
    assert rows == [(i, i) for i in range(8)] + [
        (i, 10 * i) for i in range(8, 12)
    ]
    j = (
        spark.table(v)
        .join(spark.table(v).select("k"), "k")
        .groupBy("k")
        .count()
    )
    j.collect()
    assert _plan(j).count("Exchange hashpartitioning") == 0


def test_widen_bucket_column_rejected(spark):
    # murmur3(int) != murmur3(bigint): widening the bucket column would
    # split the bucket mapping across eras — engine-level rejection
    t = _bucketed(spark, "k", 4, "cp_widekey_")
    t.commit_append(
        spark.createDataFrame([(1, 2)], "k int, v int")
    )
    with pytest.raises(ValueError, match="bucket.by"):
        t.widen_column("k", "bigint")


def test_reregistration_across_view_and_plain_paths(spark):
    # DV -> view path; OPTIMIZE folds the DVs -> plain path; the stale
    # __phys companion must not linger in the catalog
    t = _bucketed(spark, "k", 4, "cp_rereg_")
    t.commit_append(
        spark.createDataFrame(
            [(i, i) for i in range(12)], "k int, v int"
        )
    )
    t.delete_where(F.col("k") == 5)
    v = t.register_bucketed_view("cpj_rereg")
    assert spark.catalog.tableExists("cpj_rereg__phys")
    assert spark.table(v).count() == 11
    t.materialize_deletes()  # folds the DVs into rewritten files
    v = t.register_bucketed_view("cpj_rereg")
    assert spark.table(v).count() == 11
    assert not spark.catalog.tableExists("cpj_rereg__phys")


def test_renamed_and_dv_compose_in_view(spark):
    # both evolution axes at once: rename a non-layout column AND carry
    # a DV — coalesce projection + row-index filter in one view
    t = _bucketed(spark, "k", 4, "cp_rendv_")
    t.commit_append(
        spark.createDataFrame(
            [(i, 10 * i) for i in range(10)], "k int, v int"
        )
    )
    t.rename_column("v", "w")
    t.commit_append(
        spark.createDataFrame(
            [(i, 10 * i) for i in range(10, 14)], "k int, w int"
        )
    )
    t.delete_where(F.col("k").isin(3, 12))
    v = t.register_bucketed_view("cpj_rendv")
    rows = sorted((r["k"], r["w"]) for r in spark.table(v).collect())
    assert rows == [
        (i, 10 * i) for i in range(14) if i not in (3, 12)
    ]
    j = spark.table(v).join(spark.table(v).select("k"), "k")
    j.collect()
    assert _plan(j).count("Exchange hashpartitioning") == 0


def test_foreign_phys_name_collision_blocks_only_view_path(spark):
    # an unrelated user table named {name}__phys must not block the
    # PLAIN registration path (which never touches that name) — but
    # the view path, which needs it, still refuses
    spark.sql("DROP TABLE IF EXISTS cpj_coll__phys")
    spark.range(3).write.saveAsTable("cpj_coll__phys")
    try:
        t = _bucketed(spark, "k", 4, "cp_coll_")
        t.commit_append(
            spark.createDataFrame([(1, 2)], "k int, v int")
        )
        v = t.register_bucketed_view("cpj_coll")  # plain path: OK
        assert spark.table(v).count() == 1
        assert spark.table("cpj_coll__phys").count() == 3  # untouched
        t.rename_column("v", "w")  # now the view path NEEDS __phys
        t.commit_append(
            spark.createDataFrame([(2, 3)], "k int, w int")
        )
        with pytest.raises(ValueError, match="not created by"):
            t.register_bucketed_view("cpj_coll")
    finally:
        spark.sql("DROP TABLE IF EXISTS cpj_coll__phys")
        spark.sql("DROP TABLE IF EXISTS cpj_coll")
