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


def test_surgical_replace_keeps_untouched_file_identity(spark):
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("yr")
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_r_"))
    for yr in (1995, 1996, 1997):
        t.commit_append(o.filter(F.col("yr") == yr).coalesce(1))
    before = set(t._load_manifest(3))
    assert len(before) == 3
    victim = sorted(before)[0]
    kept_rows_before = t.read().count()
    removed = spark.read.parquet(victim).count()
    t.commit_replace([victim], spark.read.parquet(victim).limit(0))
    after = set(t._load_manifest(t.current_version()))
    # two untouched files keep their byte identity; victim gone
    assert len(before & after) == 2 and victim not in after
    assert t.read().count() == kept_rows_before - removed
    # pre-delete version remains fully readable (audit trail)
    assert t.read(3).count() == kept_rows_before


def test_concurrent_commit_conflict_detected(spark):
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        CommitConflict,
    )

    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey").limit(5)
    root = tempfile.mkdtemp(prefix="snap_c_")
    a, b = SnapshotTable(spark, root), SnapshotTable(spark, root)
    a.commit_append(o)
    # writer B computes its commit against v1, writer A lands v2 first
    files_b = b._write_files(o)
    a.commit_append(o)
    import pytest as _pt

    with _pt.raises(CommitConflict):
        # B still believes current==1 → tries v2, which now exists
        b._publish(b._load_manifest(1) + files_b, base_version=1)
    # the standard retry: re-read state, publish against the new head
    assert b.commit_append(o) == 3


def test_vacuum_reclaims_unreferenced_files_only(spark):
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_v_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 100).repartition(2))
    t.commit_rewrite(t.read(1).coalesce(1))  # v2: compacted layout
    n = t.read(2).count()
    deleted = t.vacuum(retain_versions=1)
    assert len(deleted) == 2  # the two pre-compaction files
    # latest still fully readable; old version is out of retention
    assert t.read(2).count() == n
    import pytest as _pt

    from s3_glue_redshift_guide_spark.sources.snapshots import LogTruncated

    with _pt.raises(LogTruncated):
        t._load_manifest(1)


def test_merge_rewrites_only_affected_files(spark):
    """The MERGE composition (mirrors sink_snapshot_merge at smoke SF):
    only files whose key range intersects the log rewrite; the rest keep
    byte identity."""
    from s3_glue_redshift_guide_spark.operators.dataskip import (
        file_stats_index,
    )
    from s3_glue_redshift_guide_spark.sinks.upsert import apply_cdc

    o = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_m_"))
    for lo in range(0, 2000, 500):
        t.commit_append(
            o.filter((F.col("k") >= lo) & (F.col("k") < lo + 500)).coalesce(1)
        )
    before = set(t._load_manifest(t.current_version()))

    log = o.filter((F.col("k") >= 600) & (F.col("k") < 700)).select(
        "k", F.lit(1).alias("v"), F.lit("U").alias("op"),
        F.lit("UU").alias("status"),
    )
    index = file_stats_index(t.read(), ["k"])
    hit = (
        log.select("k")
        .join(
            F.broadcast(index.select("file", "min_k", "max_k")),
            (F.col("k") >= F.col("min_k")) & (F.col("k") <= F.col("max_k")),
        )
        .select("file")
        .distinct()
    )
    affected = [r["file"].removeprefix("file://") for r in hit.collect()]
    assert len(affected) == 1  # only the [500,1000) file

    base_rows = spark.read.parquet(*affected).select(
        "k", F.lit(0).alias("v"), F.lit("I").alias("op"), "status"
    )
    merged = apply_cdc(base_rows.unionByName(log), ["k"], "v").select(
        "k", "status"
    )
    t.commit_replace(affected, merged)
    after = set(t._load_manifest(t.current_version()))
    assert len(before & after) == 3  # three untouched files kept identity
    got = {
        r["k"]: r["status"]
        for r in t.read().filter(
            (F.col("k") >= 590) & (F.col("k") < 710)
        ).collect()
    }
    for k, st in got.items():
        assert st == ("UU" if 600 <= k < 700 else st)
    assert t.read().count() == o.filter(F.col("k") < 2000).count()


def test_additive_schema_evolution_across_commits(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_ev_"))
    t.commit_append(
        o.filter(F.col("o_orderkey") < 50).select("o_orderkey").coalesce(1)
    )
    # a later commit ADDS a column; older files surface it as NULL
    t.commit_append(
        o.filter((F.col("o_orderkey") >= 50) & (F.col("o_orderkey") < 100))
        .select("o_orderkey", "o_orderstatus")
        .coalesce(1)
    )
    cur = t.read()
    assert set(cur.columns) == {"o_orderkey", "o_orderstatus"}
    nulls = cur.filter(
        F.col("o_orderstatus").isNull() & (F.col("o_orderkey") < 50)
    ).count()
    assert nulls == cur.filter(F.col("o_orderkey") < 50).count() > 0
    # time travel to v1 shows the ORIGINAL schema
    assert t.read(1).columns == ["o_orderkey"]


def test_change_feed_reads_only_churned_files(spark):
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_cdf_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 100).coalesce(1))
    t.commit_append(
        o.filter(F.col("o_orderkey").between(100, 199)).coalesce(1)
    )
    # append-only changes: all inserts, no deletes
    chg = t.read_changes(1, 2)
    assert chg.filter(F.col("_change_type") == "delete").count() == 0
    assert (
        chg.filter(F.col("_change_type") == "insert").count()
        == o.filter(F.col("o_orderkey").between(100, 199)).count()
    )
    # compaction rewrite: zero changes (rows cancel via EXCEPT ALL)
    t.commit_rewrite(t.read(2).coalesce(1))
    assert t.read_changes(2, 3).count() == 0
    # update = delete/insert pair, and the untouched file is not scanned:
    # the scan's input files must exclude the file shared by both versions
    f3 = t._load_manifest(3)
    upd = t.read(3).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1
    )
    t.commit_replace(f3, upd.coalesce(1))
    pair = t.read_changes(3, 4)
    n = t.read(3).count()
    assert pair.filter(F.col("_change_type") == "insert").count() == n
    assert pair.filter(F.col("_change_type") == "delete").count() == n


def test_change_feed_skips_shared_files_and_aligns_evolved_schema(spark):
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_cdfe_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 100).coalesce(1))
    # additive evolution: the appended file carries an extra column
    t.commit_append(
        o.filter(F.col("o_orderkey").between(100, 149))
        .withColumn("flag", F.lit(1))
        .coalesce(1)
    )
    chg = t.read_changes(1, 2)
    # schema aligned to the to-version (includes the evolved column)
    assert "flag" in chg.columns
    rows = chg.collect()
    assert all(r["_change_type"] == "insert" for r in rows)
    assert all(r["flag"] == 1 for r in rows)
    # only the churned file is in the scan: the v1 file is shared by both
    # manifests and must not appear in the change-feed plan's input
    shared = set(t._load_manifest(1))
    scanned = {
        f.removeprefix("file:")
        for f in chg.inputFiles()
    }
    assert not (shared & scanned)


def test_manifest_stats_prune_and_carry_forward(spark):
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("yr")
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_ms_"))
    for yr in (1995, 1996, 1997):
        t.commit_append(
            o.filter(F.col("yr") == yr).coalesce(1),
            stats_cols=["o_orderkey", "yr"],
        )
    # manifest-only pruning: exactly the 1996 file survives a yr in
    # [1996,1996] predicate, with zero Spark jobs
    files, total = t.pruned_files("yr", 1996, 1996)
    assert total == 3 and len(files) == 1
    assert t.read_where("yr", 1996, 1996).count() == o.filter(
        F.col("yr") == 1996
    ).count()
    # surgical replace: carried-forward files keep their banked stats,
    # replacement files get fresh footer stats automatically
    survivors = spark.read.parquet(*files).filter(
        F.col("o_orderkey") % 2 == 0
    )
    t.commit_replace(files, survivors.coalesce(1))
    files2, total2 = t.pruned_files("yr", 1996, 1996)
    assert total2 == 3 and len(files2) == 1 and files2 != files
    # a column never tracked prunes nothing (conservative keep-all)
    allf, _ = t.pruned_files("no_such_col", 0, 1)
    assert len(allf) == 3
    # out-of-range predicate prunes everything; read stays empty+typed
    none_files, _ = t.pruned_files("yr", 2050, 2060)
    assert none_files == []
    assert t.read_where("yr", 2050, 2060).count() == 0


def test_changes_since_exactly_once_per_version(spark):
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_cs_"))
    assert t.changes_since(0) == (None, 0)  # empty table: no work
    t.commit_append(o.filter(F.col("o_orderkey") < 100).coalesce(1))
    df1, c1 = t.changes_since(0)
    n1 = df1.count()
    assert c1 == 1 and n1 == o.filter(F.col("o_orderkey") < 100).count()
    # caught up: nothing to do, cursor unchanged
    assert t.changes_since(c1) == (None, 1)
    # two commits between polls arrive as one combined batch
    t.commit_append(
        o.filter(F.col("o_orderkey").between(100, 149)).coalesce(1)
    )
    t.commit_append(
        o.filter(F.col("o_orderkey").between(150, 199)).coalesce(1)
    )
    df2, c2 = t.changes_since(c1)
    assert c2 == 3
    assert df2.count() == o.filter(
        F.col("o_orderkey").between(100, 199)
    ).count()


def test_optimize_small_files_noop_and_isolation(spark):
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_opt_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 50).coalesce(1))
    t.commit_append(
        o.filter(F.col("o_orderkey").between(50, 299)).coalesce(1)
    )
    import os

    sizes = [os.path.getsize(f) for f in t._load_manifest(2)]
    # threshold below every file: nothing to do, no commit published
    facts = t.optimize_small_files(min(sizes), 1 << 30)
    assert facts["version"] == 2 and facts["n_files_after"] == 2
    # threshold above both: both pack into one file in ONE new commit;
    # the pre-OPTIMIZE version still reads its old layout
    n_before = t.read().count()
    facts = t.optimize_small_files(max(sizes) + 1, 1 << 30)
    assert facts["version"] == 3 and facts["n_files_after"] == 1
    assert t.read().count() == n_before
    assert t.file_count(2) == 2 and t.read(2).count() == n_before


def test_optimize_zorder_clusters_both_dimensions(spark):
    """OPTIMIZE ... ZORDER BY: the compacted files must each own a
    bounded region in BOTH clustering dimensions, so a point filter on
    either column admits fewer files than scattered input would."""
    import os

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_optz_"))
    # six scattered small commits: each spans the FULL range of both
    # columns (hash-sliced), the worst case for any pruning
    for i in range(6):
        t.commit_append(
            o.filter(F.col("o_orderkey") % 6 == i).coalesce(1),
            stats_cols=["o_orderkey", "o_custkey"],
        )
    sizes = [os.path.getsize(f) for f in t._load_manifest(6)]
    total = sum(sizes)
    # 8+ output files: with only ~4, one point probe occasionally
    # lands inside every file's (coarse) curve segment under unlucky
    # range-sampling — smaller segments make both-dimension pruning
    # robust, which is the property under test
    facts = t.optimize_small_files(
        max(sizes) + 1, total // 8, z_cols=("o_custkey", "o_orderkey")
    )
    assert facts["n_small"] == 6 and facts["n_files_after"] >= 6
    # post-OPTIMIZE manifest stats: a mid-range point in either
    # dimension must be admitted by fewer files than exist
    kept_k, n = t.pruned_files(
        "o_orderkey", 300, 300, version=facts["version"]
    )
    kept_c, _ = t.pruned_files(
        "o_custkey", 80, 80, version=facts["version"]
    )
    assert n == facts["n_files_after"]
    assert len(kept_k) < n and len(kept_c) < n
    # content unchanged by the layout commit
    assert t.read().count() == o.count()


def test_distributed_footer_stats_matches_driver_path(spark):
    """Past the threshold, footer-stat collection fans out as a Spark
    job; the stats it banks must be identical to the driver-side loop."""
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_dstats_"))
    t.commit_append(
        o.filter(F.col("o_orderkey") < 2000).repartition(4),
        stats_cols=["o_orderkey"],
    )
    files = t._load_manifest(1)
    driver_side = t._footer_stats(files, ["o_orderkey"])
    old = SnapshotTable.DISTRIBUTED_STATS_THRESHOLD
    SnapshotTable.DISTRIBUTED_STATS_THRESHOLD = 1
    try:
        exec_side = t._footer_stats(files, ["o_orderkey"])
    finally:
        SnapshotTable.DISTRIBUTED_STATS_THRESHOLD = old
    assert exec_side == driver_side
    assert all(st.get("o_orderkey") for st in exec_side.values())


def test_changes_since_past_retention_raises_log_truncated(spark):
    import pytest

    from s3_glue_redshift_guide_spark.sources.snapshots import LogTruncated

    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_lt_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 50).coalesce(1))
    t.commit_append(
        o.filter(F.col("o_orderkey").between(50, 99)).coalesce(1)
    )
    t.commit_rewrite(t.read().coalesce(1))
    t.vacuum(retain_versions=1)
    # a consumer whose cursor predates retention gets a TYPED signal to
    # re-bootstrap, never a raw FileNotFoundError mid-poll
    with pytest.raises(LogTruncated):
        t.changes_since(1)
    # head-relative consumption still works
    df, c = t.changes_since(t.current_version())
    assert df is None and c == 3


def _dv_table(spark, tmp_path, name):
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, str(tmp_path / name))
    for lo, hi in ((0, 199), (200, 399), (400, 599)):
        t.commit_append(
            o.filter(F.col("o_orderkey").between(lo, hi)).coalesce(1),
            stats_cols=["o_orderkey"],
        )
    return o, t


def test_delete_where_is_merge_on_read(spark, tmp_path):
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )

    o, t = _dv_table(spark, tmp_path, "mor")
    v0 = t.current_version()
    v1 = t.delete_where(F.col("o_orderkey") % 7 == 0)
    m0, m1 = load_manifest(t.root, v0), load_manifest(t.root, v1)
    # data files BYTE-IDENTICAL (same paths, untouched), only dv added
    assert m0["files"] == m1["files"]
    assert len(m1["dv"]) == 3 and not m0["dv"]
    want = o.filter(
        (F.col("o_orderkey") < 600) & (F.col("o_orderkey") % 7 != 0)
    ).count()
    assert t.read().count() == want
    # history intact: the pre-delete version still shows every row
    assert t.read(v0).count() == 600
    # replaying the delete is a no-op commit (DV-masked matching scan)
    assert t.delete_where(F.col("o_orderkey") % 7 == 0) == v1


def test_delete_where_cost_is_o_of_deletes(spark, tmp_path):
    import os

    _, t = _dv_table(spark, tmp_path, "cost")
    data_bytes = sum(
        os.path.getsize(f) for f in t._load_manifest(t.current_version())
    )
    t.delete_where(F.col("o_orderkey").isin(3, 77, 501))
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )

    m = load_manifest(t.root, t.current_version())
    dv_dirs = {d for lst in m["dv"].values() for d in lst}
    dv_bytes = sum(
        os.path.getsize(os.path.join(d, f))
        for d in dv_dirs
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    # the commit wrote a position ledger, not data: orders of magnitude
    # under the table (3 rows of (path, pos) vs 600 rows of data)
    assert dv_bytes < data_bytes
    assert t.read().count() == 597


def test_materialize_deletes_folds_dvs(spark, tmp_path):
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )

    _, t = _dv_table(spark, tmp_path, "mat")
    t.delete_where(F.col("o_orderkey") % 7 == 0)
    n = t.read().count()
    v = t.materialize_deletes()
    m = load_manifest(t.root, v)
    assert not m["dv"] and t.read().count() == n


def test_change_feed_reports_dv_deletes(spark, tmp_path):
    _, t = _dv_table(spark, tmp_path, "cdfdv")
    v0 = t.current_version()
    v1 = t.delete_where(F.col("o_orderkey") % 7 == 0)
    chg = t.read_changes(v0, v1)
    assert chg.filter(F.col("_change_type") == "insert").count() == 0
    deleted = chg.filter(F.col("_change_type") == "delete")
    assert deleted.count() == 86  # keys 0,7,...,595
    assert deleted.filter(F.col("o_orderkey") % 7 != 0).count() == 0


def test_rename_round_trips_across_commits(spark, tmp_path):
    o, t = _dv_table(spark, tmp_path, "ren")
    t.rename_column("o_totalprice", "price")
    # append AFTER the rename under the new physical name
    t.commit_append(
        o.filter(F.col("o_orderkey").between(600, 699))
        .withColumnRenamed("o_totalprice", "price")
        .coalesce(1),
        stats_cols=["o_orderkey"],
    )
    df = t.read()
    assert df.columns == ["o_orderkey", "price"]
    got = {r["o_orderkey"]: r["price"] for r in df.collect()}
    exp = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in o.filter(F.col("o_orderkey") < 700).collect()
    }
    assert got == exp  # BOTH eras read under the new name, values exact
    # manifest pruning works under the renamed logical name
    keep, total = t.pruned_files("o_orderkey", 0, 50)
    assert (len(keep), total) == (1, 4)
    # old name is gone; reusing a historical name is rejected
    import pytest

    with pytest.raises(KeyError):
        t.rename_column("o_totalprice", "x")
    with pytest.raises(ValueError):
        t.rename_column("o_orderkey", "o_totalprice")


def test_drop_column_is_metadata_only(spark, tmp_path):
    import os

    _, t = _dv_table(spark, tmp_path, "drop")
    before = {
        f: os.path.getmtime(f)
        for f in t._load_manifest(t.current_version())
    }
    t.drop_column("o_totalprice")
    assert t.read().columns == ["o_orderkey"]
    after = {
        f: os.path.getmtime(f)
        for f in t._load_manifest(t.current_version())
    }
    assert before == after  # zero data files touched


def test_update_where_is_one_atomic_mor_commit(spark, tmp_path):
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )

    o, t = _dv_table(spark, tmp_path, "morupd")
    v0 = t.current_version()
    v1 = t.update_where(
        F.col("o_orderkey") % 10 == 3,
        {"o_totalprice": F.col("o_totalprice") + F.lit(1000.0)},
    )
    assert v1 == v0 + 1  # tombstone + reinsert in ONE commit
    m0, m1 = load_manifest(t.root, v0), load_manifest(t.root, v1)
    # every base file still visible (byte identity), plus the post-image
    # files; tombstones mask exactly the matched pre-images
    assert set(m0["files"]) < set(m1["files"])
    assert len(m1["dv"]) == 3
    got = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in t.read().select("o_orderkey", "o_totalprice").collect()
    }
    exp = {
        r["o_orderkey"]: (
            r["o_totalprice"] + 1000.0
            if r["o_orderkey"] % 10 == 3
            else r["o_totalprice"]
        )
        for r in o.filter(F.col("o_orderkey") < 600).collect()
    }
    assert got == exp
    assert len(got) == 600  # row count preserved: update, not upsert
    # history: pre-update version unchanged
    pre = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in t.read(v0).collect()
    }
    assert pre == {
        r["o_orderkey"]: r["o_totalprice"]
        for r in o.filter(F.col("o_orderkey") < 600).collect()
    }
    # change feed reports the update as delete/insert pairs
    chg = t.read_changes(v0, v1)
    n_upd = sum(1 for k in pre if k % 10 == 3)
    assert (
        chg.filter(F.col("_change_type") == "delete").count() == n_upd
    )
    assert (
        chg.filter(F.col("_change_type") == "insert").count() == n_upd
    )


def test_restore_is_a_metadata_commit(spark, tmp_path):
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )

    o, t = _dv_table(spark, tmp_path, "restore")
    v3 = t.current_version()
    t.delete_where(F.col("o_orderkey") % 7 == 0)
    t.commit_append(
        o.filter(F.col("o_orderkey").between(600, 699)).coalesce(1)
    )
    assert t.read().count() == 514 + 100
    v_restored = t.restore(v3)
    assert v_restored == t.current_version()
    # head now shows exactly version 3's content...
    assert t.read().count() == 600
    m = load_manifest(t.root, v_restored)
    assert m["files"] == load_manifest(t.root, v3)["files"]
    # ...and the restore is itself a commit: the pre-restore head is
    # still addressable (auditable, revertible)
    assert t.read(v_restored - 1).count() == 614


def test_shallow_clone_is_zero_copy_and_diverges(spark, tmp_path):
    import os

    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )

    o, t = _dv_table(spark, tmp_path, "clsrc")
    t.delete_where(F.col("o_orderkey") % 7 == 0)
    clone = t.clone_shallow(str(tmp_path / "cltgt"))
    # zero copy: the clone's manifest references the SOURCE's files,
    # and no data lives under the clone's root
    m = load_manifest(clone.root, 1)
    assert m["files"] == load_manifest(t.root, t.current_version())["files"]
    assert not os.path.isdir(os.path.join(clone.root, "data")) or not any(
        os.scandir(os.path.join(clone.root, "data"))
    )
    # content identical, deletion vectors included
    assert clone.read().count() == t.read().count() == 514
    # divergence: a commit to the clone never touches the source
    src_v = t.current_version()
    clone.commit_append(
        o.filter(F.col("o_orderkey").between(600, 649)).coalesce(1)
    )
    assert clone.read().count() == 564
    assert t.current_version() == src_v and t.read().count() == 514
    # and source commits don't leak into the clone
    t.delete_where(F.col("o_orderkey") % 11 == 0)
    assert clone.read().count() == 564


def test_check_constraints_enforced_on_every_write(spark, tmp_path):
    import pytest

    o, t = _dv_table(spark, tmp_path, "chk")
    # adding a constraint the current data violates is rejected
    with pytest.raises(ValueError, match="violated by"):
        t.add_constraint("pricey", "o_totalprice > 100000")
    t.add_constraint("key_range", "o_orderkey >= 0 AND o_orderkey < 10000")
    t.add_constraint("price_pos", "o_totalprice > 0")
    # a clean append passes; a violating one is rejected with counts
    t.commit_append(
        o.filter(F.col("o_orderkey").between(600, 649)).coalesce(1)
    )
    with pytest.raises(ValueError, match="key_range.*50 row"):
        t.commit_append(
            o.filter(F.col("o_orderkey").between(650, 699))
            .withColumn("o_orderkey", F.col("o_orderkey") + 100_000)
            .coalesce(1)
        )
    # NULL evaluations are conservative violations
    with pytest.raises(ValueError, match="price_pos"):
        t.commit_append(
            o.filter(F.col("o_orderkey").between(650, 651))
            .withColumn("o_totalprice", F.lit(None).cast("double"))
            .coalesce(1)
        )
    # constraints survive unrelated commits and update paths
    t.delete_where(F.col("o_orderkey") % 97 == 0)
    with pytest.raises(ValueError, match="price_pos"):
        t.update_where(
            F.col("o_orderkey") == 3,
            {"o_totalprice": F.lit(-1.0)},
        )
    # drop lifts the contract
    t.drop_constraint("key_range")
    t.commit_append(
        o.filter(F.col("o_orderkey").between(650, 659))
        .withColumn("o_orderkey", F.col("o_orderkey") + 100_000)
        .coalesce(1)
    )


def test_vacuum_orphan_grace_protects_inflight_writes(spark):
    """A file in data/ that NO manifest has ever referenced is
    indistinguishable from a racing writer's staged-but-unpublished
    output — VACUUM must not unlink it until it is older than the
    orphan grace window. Files that aged OUT of the log stay
    immediately collectable (they are provably dead), and grace=0
    restores unconditional sweeping for crash-cleanup jobs."""
    import os

    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_og_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 100).repartition(2))
    t.commit_rewrite(t.read(1).coalesce(1))  # v1's two files age out
    # simulate a concurrent writer: staged parquet, publish not yet run
    staged = os.path.join(t.root, "data", "staged-inflight.parquet")
    o.limit(5).coalesce(1).write.mode("overwrite").parquet(staged + ".d")
    src = next(
        f for f in os.listdir(staged + ".d") if f.endswith(".parquet")
    )
    os.rename(os.path.join(staged + ".d", src), staged)
    deleted = t.vacuum(retain_versions=1)
    # the two ever-referenced v1 files reclaim; the fresh orphan stays
    assert len(deleted) == 2
    assert os.path.exists(staged)
    # dry-run agrees with the real sweep's grace decision
    assert staged not in t.vacuum(retain_versions=1, dry_run=True)
    # explicit zero grace: the orphan is now collectable
    deleted = t.vacuum(retain_versions=1, orphan_grace_seconds=0.0)
    assert staged in deleted
    assert not os.path.exists(staged)
