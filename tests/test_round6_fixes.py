"""Round-6 regression tests: the connector commit path carries the FULL
manifest metadata (dv / schema map / constraints), alias-coalesced reads
after rename + compaction, dropped-name tombstones, constraint-aware
schema edits, single-pass CHECK enforcement, pinned update_where,
distributed DV sidecars, commit timestamps (TIMESTAMP AS OF), and
streaming admission control."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.pyds import (
    SnapshotStreamReader,
    register_snapshot_source,
)
from s3_glue_redshift_guide_spark.sources.snapshots import (
    SnapshotTable,
    load_manifest,
    version_as_of,
    zone_prune,
)


def _tmp(pfx):
    return tempfile.mkdtemp(prefix=f"r6_{pfx}_")


def _kv(spark, n=100, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


# ------------------------------------------------------------------ #
# 1. connector commit path: metadata families survive connector writes
# ------------------------------------------------------------------ #

def test_connector_append_preserves_deletion_vectors(spark):
    """The reproduced wrong-answer bug: delete 10 of 100 rows via DV,
    then append 5 rows THROUGH THE CONNECTOR — the deleted rows must
    stay deleted (95 + 5 = 100 visible, never 105)."""
    register_snapshot_source(spark)
    t = SnapshotTable(spark, _tmp("dvkeep"))
    t.commit_append(_kv(spark, 100))
    t.delete_where(F.col("k") < 10)
    assert t.read().count() == 90
    _kv(spark, 5, start=1000).write.format("pysnapshot").option(
        "root", t.root
    ).mode("append").save()
    m = load_manifest(t.root, t.current_version())
    assert m.get("dv"), "connector append dropped the dv map"
    assert t.read().count() == 95
    assert (
        spark.read.format("pysnapshot").option("root", t.root).load()
        .count()
        == 95
    )


def test_connector_append_preserves_schema_map(spark):
    register_snapshot_source(spark)
    t = SnapshotTable(spark, _tmp("smkeep"))
    t.commit_append(_kv(spark, 50))
    t.rename_column("v", "val")
    assert t.read().columns == ["k", "val"]
    # connector append writes the CURRENT logical names
    spark.range(50, 60).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    ).write.format("pysnapshot").option("root", t.root).mode(
        "append"
    ).save()
    m = load_manifest(t.root, t.current_version())
    assert m.get("schema"), "connector append dropped the schema map"
    df = t.read()
    assert df.columns == ["k", "val"]
    assert df.count() == 60
    assert df.filter(F.col("val").isNull()).count() == 0
    # connector read agrees
    cdf = spark.read.format("pysnapshot").option("root", t.root).load()
    assert sorted(cdf.columns) == ["k", "val"]
    assert cdf.where("val IS NULL").count() == 0


def test_connector_write_enforces_and_preserves_constraints(spark):
    register_snapshot_source(spark)
    t = SnapshotTable(spark, _tmp("conskeep"))
    t.commit_append(_kv(spark, 20))
    t.add_constraint("k_nonneg", "k >= 0")
    v_before = t.current_version()
    # violating connector write: rejected BEFORE any manifest publish
    bad = spark.range(5).select(
        (F.col("id") - 10).alias("k"), F.col("id").alias("v")
    )
    with pytest.raises(Exception, match="k_nonneg"):
        bad.write.format("pysnapshot").option("root", t.root).mode(
            "append"
        ).save()
    assert t.current_version() == v_before
    assert t.read().count() == 20
    # clean write lands and the constraint SURVIVES the commit
    _kv(spark, 5, start=500).write.format("pysnapshot").option(
        "root", t.root
    ).mode("append").save()
    m = load_manifest(t.root, t.current_version())
    assert m.get("constraints") == {"k_nonneg": "k >= 0"}
    assert t.read().count() == 25
    # and the table-side writer still enforces it afterwards
    with pytest.raises(ValueError, match="k_nonneg"):
        t.commit_append(
            spark.range(1).select(
                F.lit(-5).alias("k"), F.lit(0).cast("long").alias("v")
            )
        )


def test_connector_overwrite_clears_dv_legitimately(spark):
    register_snapshot_source(spark)
    t = SnapshotTable(spark, _tmp("dvow"))
    t.commit_append(_kv(spark, 40))
    t.delete_where(F.col("k") < 5)
    _kv(spark, 10).write.format("pysnapshot").option(
        "root", t.root
    ).mode("overwrite").save()
    m = load_manifest(t.root, t.current_version())
    assert not m.get("dv")
    assert t.read().count() == 10


# ------------------------------------------------------------------ #
# 2. mixed-era files after rename + OPTIMIZE (ADVICE high)
# ------------------------------------------------------------------ #

def _mixed_era_table(spark):
    """rename, append under the new name, then compact pre+post files
    into MIXED files that physically carry BOTH column names."""
    t = SnapshotTable(spark, _tmp("mixed"))
    t.commit_append(_kv(spark, 100).coalesce(1), stats_cols=["v"])
    t.rename_column("v", "val")
    spark.range(100, 200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    ).coalesce(1).write.format("pysnapshot").option(
        "root", t.root
    ).option("statsCols", "val").mode("append").save()
    res = t.optimize_small_files(
        small_threshold=1 << 30, target_bytes=1 << 30
    )
    assert res["n_files_after"] == 1
    return t


def test_connector_read_coalesces_aliases_in_mixed_files(spark):
    register_snapshot_source(spark)
    t = _mixed_era_table(spark)
    df = spark.read.format("pysnapshot").option("root", t.root).load()
    assert df.count() == 200
    # pre-rename rows must carry their values, not NULL
    assert df.where("val IS NULL").count() == 0
    assert df.agg(F.sum("val")).collect()[0][0] == sum(
        2 * i for i in range(200)
    )


def test_rowgroup_and_zone_pruning_keep_old_era_values(spark):
    """A pushed bound whose matches live ONLY under the old physical
    name must still surface them from a mixed-era file."""
    register_snapshot_source(spark)
    t = _mixed_era_table(spark)
    # v==val in [0, 50): exclusively pre-rename rows
    got = (
        spark.read.format("pysnapshot").option("root", t.root).load()
        .where("val < 50")
        .count()
    )
    assert got == 25  # val = 2k for k in 0..24


def test_zone_prune_alias_groups():
    stats = {
        "old_only.parquet": {"v": [0, 10]},
        "new_only.parquet": {"val": [100, 200]},
        "mixed.parquet": {"v": [0, 10], "val": [100, 200]},
        "none.parquet": {},
    }
    files = list(stats)
    aliases = {"val": ["v"]}
    # bound hits only the OLD era: mixed must be KEPT (its matches live
    # under the old name), new_only prunes, old_only keeps
    keep = zone_prune(files, stats, {"val": (0, 5)}, aliases)
    assert "mixed.parquet" in keep
    assert "old_only.parquet" in keep
    assert "new_only.parquet" not in keep
    assert "none.parquet" in keep  # absent stats: conservative keep
    # bound outside BOTH eras: mixed prunes too
    keep2 = zone_prune(files, stats, {"val": (500, 600)}, aliases)
    assert keep2 == ["none.parquet"]


# ------------------------------------------------------------------ #
# 3. dropped-name tombstones
# ------------------------------------------------------------------ #

def test_dropped_column_name_cannot_be_reused(spark):
    t = SnapshotTable(spark, _tmp("tomb"))
    t.commit_append(_kv(spark, 30))
    t.drop_column("v")
    assert t.read().columns == ["k"]
    with pytest.raises(ValueError, match="DROPPED"):
        t.commit_append(_kv(spark, 5, start=100))  # re-adds "v"
    # and through the connector too
    register_snapshot_source(spark)
    with pytest.raises(Exception, match="DROPPED|dropped"):
        _kv(spark, 5, start=100).write.format("pysnapshot").option(
            "root", t.root
        ).mode("append").save()
    # a genuinely new name is fine
    v = t.commit_append(
        spark.range(5).select(
            (F.col("id") + 200).alias("k"), F.col("id").alias("w")
        )
    )
    assert set(t.read(v).columns) == {"k", "w"}


def test_rename_drop_of_constrained_column_rejected(spark):
    t = SnapshotTable(spark, _tmp("consref"))
    t.commit_append(_kv(spark, 10))
    t.add_constraint("v_pos", "v >= 0")
    with pytest.raises(ValueError, match="v_pos"):
        t.rename_column("v", "value")
    with pytest.raises(ValueError, match="v_pos"):
        t.drop_column("v")
    # unconstrained column still renames
    t.rename_column("k", "key")
    assert t.read().columns == ["key", "v"]


def test_empty_snapshot_read_uses_logical_names(spark):
    t = SnapshotTable(spark, _tmp("emptysm"))
    t.commit_append(_kv(spark, 10))
    t.rename_column("v", "val")
    t.commit_rewrite(t.read().limit(0))  # empty head
    df = t.read()
    assert df.count() == 0
    assert df.columns == ["k", "val"]


# ------------------------------------------------------------------ #
# 4. single-pass constraint enforcement
# ------------------------------------------------------------------ #

def test_constraint_enforcement_is_single_pass(spark):
    t = SnapshotTable(spark, _tmp("onepass"))
    t.commit_append(_kv(spark, 10))
    t.add_constraint("k_nonneg", "k >= 0")
    acc = spark.sparkContext.accumulator(0)

    @F.udf("long")
    def tick(x):
        acc.add(1)
        return x

    df = spark.range(100, 200).select(
        tick(F.col("id")).alias("k"), F.col("id").alias("v")
    )
    t.commit_append(df)
    # observe-based enforcement rides the write pass: each row computes
    # ONCE (the old check-then-write evaluated the frame twice)
    assert acc.value == 100


def test_constraint_violation_rejected_pre_publish_no_orphans(spark):
    t = SnapshotTable(spark, _tmp("veto"))
    t.commit_append(_kv(spark, 10))
    t.add_constraint("k_nonneg", "k >= 0")
    v_before = t.current_version()
    data_root = os.path.join(t.root, "data")
    dirs_before = set(os.listdir(data_root))
    with pytest.raises(ValueError, match="k_nonneg"):
        t.commit_append(
            spark.range(5).select(
                (F.col("id") - 100).alias("k"), F.col("id").alias("v")
            )
        )
    assert t.current_version() == v_before
    # the staged commit dir was reclaimed — no orphan shards
    assert set(os.listdir(data_root)) == dirs_before


# ------------------------------------------------------------------ #
# 5. update_where pinned against nondeterministic predicates
# ------------------------------------------------------------------ #

def test_update_where_nondeterministic_predicate_not_torn(spark):
    t = SnapshotTable(spark, _tmp("pin"))
    t.commit_append(_kv(spark, 200).repartition(4))
    # rand() re-evaluates differently per pass; post-images derive from
    # the WRITTEN sidecar, so the delete and insert halves must agree
    t.update_where(F.rand() < 0.5, {"v": F.col("v") + 100000})
    df = t.read()
    assert df.count() == 200
    assert df.select("k").distinct().count() == 200
    # every row is either untouched (v = 2k) or updated (v = 2k + 1e5)
    bad = df.filter(
        (F.col("v") != F.col("k") * 2)
        & (F.col("v") != F.col("k") * 2 + 100000)
    )
    assert bad.count() == 0


def test_wide_delete_sidecar_is_distributed(spark):
    t = SnapshotTable(spark, _tmp("widedv"))
    t.commit_append(_kv(spark, 4000).repartition(8))
    t.delete_where(F.col("k") % 2 == 0)  # 50% selectivity
    m = load_manifest(t.root, t.current_version())
    dirs = {d for lst in m["dv"].values() for d in lst}
    assert len(dirs) == 1
    shards = [
        f for f in os.listdir(next(iter(dirs))) if f.endswith(".parquet")
    ]
    assert len(shards) > 1, "sidecar write funnelled through one task"
    assert t.read().count() == 2000


# ------------------------------------------------------------------ #
# 6. commit timestamps + TIMESTAMP AS OF
# ------------------------------------------------------------------ #

def test_timestamp_as_of_with_injected_clock(spark):
    ticks = iter([100.0, 200.0, 300.0])
    t = SnapshotTable(spark, _tmp("asof"), clock=lambda: next(ticks))
    t.commit_append(_kv(spark, 10))
    t.commit_append(_kv(spark, 10, start=10))
    t.commit_append(_kv(spark, 10, start=20))
    assert version_as_of(t.root, 100.0) == 1
    assert version_as_of(t.root, 250.0) == 2
    assert version_as_of(t.root, 1e9) == 3
    assert t.read(as_of_ts=250.0).count() == 20
    with pytest.raises(ValueError):
        version_as_of(t.root, 50.0)
    with pytest.raises(ValueError):
        t.read(version=1, as_of_ts=100.0)


def test_batch_cdf_carries_commit_timestamp(spark):
    register_snapshot_source(spark)
    ticks = iter([10.0, 20.0])
    t = SnapshotTable(spark, _tmp("cdfts"), clock=lambda: next(ticks))
    t.commit_append(_kv(spark, 5))
    t.delete_where(F.col("k") == 0)
    df = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .load()
    )
    rows = {
        (r["_change_type"], r["_commit_version"]): r["_commit_timestamp"]
        for r in df.select(
            "_change_type", "_commit_version", "_commit_timestamp"
        )
        .distinct()
        .collect()
    }
    assert rows[("insert", 1)].timestamp() == 10.0
    assert rows[("delete", 2)].timestamp() == 20.0


# ------------------------------------------------------------------ #
# 7. streaming admission control (maxVersionsPerTrigger)
# ------------------------------------------------------------------ #

def test_admission_control_caps_backlog(spark):
    t = SnapshotTable(spark, _tmp("admit"))
    for i in range(3):
        t.commit_append(_kv(spark, 10, start=i * 10).coalesce(1))
    r = SnapshotStreamReader(
        {"root": t.root, "maxversionspertrigger": "1"}, None, {}
    )
    # engine protocol: initialOffset → (latestOffset → partitions →
    # commit)* — a 3-version backlog drains in THREE capped batches
    start = r.initialOffset()
    seen = []
    for _ in range(3):
        end = r.latestOffset()
        parts = r.partitions(start, end)
        r.commit(end)
        seen.append((end["version"], len(parts)))
        start = end
    assert [v for v, _ in seen] == [1, 2, 3]
    assert all(n == 1 for _, n in seen)
    # caught up: the next poll stays at head
    assert r.latestOffset() == {"version": 3}
    # uncapped reader still delivers everything at once
    r2 = SnapshotStreamReader({"root": t.root}, None, {})
    r2.initialOffset()
    assert r2.latestOffset() == {"version": 3}


def test_restore_to_pre_rename_version_clears_schema_map(spark):
    t = SnapshotTable(spark, _tmp("restore_sm"))
    t.commit_append(_kv(spark, 10))
    t.rename_column("v", "val")
    assert t.read().columns == ["k", "val"]
    t.restore(1)
    m = load_manifest(t.root, t.current_version())
    assert m.get("schema") is None
    assert t.read().columns == ["k", "v"]  # restored-era names


def test_clone_carries_constraints(spark):
    t = SnapshotTable(spark, _tmp("clone_src"))
    t.commit_append(_kv(spark, 10))
    t.add_constraint("k_nonneg", "k >= 0")
    c = t.clone_shallow(_tmp("clone_dst"))
    m = load_manifest(c.root, c.current_version())
    assert m.get("constraints") == {"k_nonneg": "k >= 0"}
    with pytest.raises(ValueError, match="k_nonneg"):
        c.commit_append(
            spark.range(1).select(
                F.lit(-1).alias("k"), F.lit(0).cast("long").alias("v")
            )
        )


# ------------------------------------------------------------------ #
# 8. timestampAsOf / startingTimestamp / maxFilesPerTrigger options
# ------------------------------------------------------------------ #

def test_connector_timestamp_as_of_option(spark):
    register_snapshot_source(spark)
    ticks = iter([100.0, 200.0, 300.0])
    t = SnapshotTable(spark, _tmp("tsopt"), clock=lambda: next(ticks))
    for i in range(3):
        t.commit_append(_kv(spark, 10, start=i * 10).coalesce(1))
    got = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .option("timestampAsOf", "250")
        .load()
        .count()
    )
    assert got == 20
    with pytest.raises(Exception, match="not both"):
        spark.read.format("pysnapshot").option("root", t.root).option(
            "timestampAsOf", "250"
        ).option("version", "1").load().count()


def test_batch_cdf_starting_timestamp(spark):
    register_snapshot_source(spark)
    ticks = iter([100.0, 200.0, 300.0])
    t = SnapshotTable(spark, _tmp("cdfsts"), clock=lambda: next(ticks))
    for i in range(3):
        t.commit_append(_kv(spark, 10, start=i * 10).coalesce(1))
    df = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .option("startingTimestamp", "150")
        .load()
    )
    # base = newest version strictly before ts=150 (v1): changes are
    # v2 + v3's inserts only
    assert df.count() == 20
    assert df.agg(F.min("_commit_version")).collect()[0][0] == 2


def test_max_files_per_trigger_caps_batches(spark):
    t = SnapshotTable(spark, _tmp("fcap"))
    # v1 adds 2 files, v2 adds 2 files, v3 adds 2 files
    for i in range(3):
        t.commit_append(_kv(spark, 20, start=i * 20).repartition(2))
    r = SnapshotStreamReader(
        {"root": t.root, "maxfilespertrigger": "3"}, None, {}
    )
    start = r.initialOffset()
    ends = []
    for _ in range(3):
        end = r.latestOffset()
        if end == start:
            break
        r.partitions(start, end)
        r.commit(end)
        ends.append(end["version"])
        start = end
    # 2 files fit under cap 3, adding the next version's 2 would
    # exceed it: batches land at versions [1, 2, 3]
    assert ends == [1, 2, 3]


# ------------------------------------------------------------------ #
# 9. splitBy clustered connector writes
# ------------------------------------------------------------------ #

def test_splitby_write_one_file_per_value_and_nulls(spark):
    register_snapshot_source(spark)
    t_root = _tmp("splitby")
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 != 0, F.col("id") % 3).alias("g"),
    )
    (
        df.repartition("g")
        .write.format("pysnapshot")
        .option("root", t_root)
        .option("splitBy", "g")
        .option("statsCols", "g")
        .mode("append")
        .save()
    )
    t = SnapshotTable(spark, t_root)
    m = load_manifest(t_root, t.current_version())
    # one file per split value per task that saw it: values {1, 2, NULL}
    assert len(m["files"]) >= 3
    # every non-null file is single-valued (point-collapsed zone map)
    for st in m["stats"].values():
        mm = st.get("g")
        if mm is not None:
            assert mm[0] == mm[1]
    back = spark.read.format("pysnapshot").option("root", t_root).load()
    assert back.count() == 100
    assert back.where("g IS NULL").count() == 34  # ids 0,3,...,99
    # constraint enforcement still composes with splitBy
    t.add_constraint("k_nonneg", "k >= 0")
    with pytest.raises(Exception, match="k_nonneg"):
        spark.range(1).select(
            F.lit(-1).cast("long").alias("k"), F.lit(1).cast("long").alias("g")
        ).write.format("pysnapshot").option("root", t_root).option(
            "splitBy", "g"
        ).mode("append").save()


def test_vacuum_time_retention_extends_window(spark):
    ticks = iter([100.0, 200.0, 300.0, 400.0])
    t = SnapshotTable(spark, _tmp("vacts"), clock=lambda: next(ticks))
    for i in range(4):
        t.commit_append(_kv(spark, 5, start=i * 5).coalesce(1))
    # version-only retention would keep just v4; the time axis keeps
    # every version committed at ts >= 350-200=150 → v2..v4 survive
    deleted = t.vacuum(retain_versions=1, retain_seconds=200, now=350.0)
    assert t.read(2).count() == 10  # v2 still readable
    assert t.read(4).count() == 20
    with pytest.raises(Exception):
        t.read(1).count()  # v1's manifest is gone (outside both axes)
    # append-only history: every data file is still reachable from the
    # retained manifests, so no data is deleted — only old manifests
    assert deleted == []


# ------------------------------------------------------------------ #
# 10. per-commit table-level CDF + append auto-retry
# ------------------------------------------------------------------ #

def test_read_change_feed_per_commit_annotation(spark):
    ticks = iter([10.0, 20.0, 30.0])
    t = SnapshotTable(spark, _tmp("tblcdf"), clock=lambda: next(ticks))
    t.commit_append(_kv(spark, 5).coalesce(1))            # v1
    t.commit_append(_kv(spark, 5, start=5).coalesce(1))   # v2
    t.delete_where(F.col("k") == 0)                       # v3 (DV)
    feed = t.read_change_feed(0)
    rows = [
        (r["_change_type"], r["_commit_version"],
         r["_commit_timestamp"].timestamp())
        for r in feed.select(
            "_change_type", "_commit_version", "_commit_timestamp"
        ).collect()
    ]
    assert rows.count(("insert", 1, 10.0)) == 5
    assert rows.count(("insert", 2, 20.0)) == 5
    assert rows.count(("delete", 3, 30.0)) == 1
    # endpoint diff would cancel nothing here, but attribution differs:
    # the per-commit feed carries version numbers the endpoint cannot
    assert feed.count() == 11
    # bounded slice: only v2's commit
    assert t.read_change_feed(1, 2).count() == 5


def test_commit_append_auto_retries_on_conflict(spark):
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        publish_version,
    )

    t = SnapshotTable(spark, _tmp("autoretry"))
    t.commit_append(_kv(spark, 5).coalesce(1))  # v1

    # sabotage: when the append goes to publish, v2 already exists —
    # simulate by pre-publishing v2 from a racing writer between the
    # append's read and its publish via a current_version hook
    orig = SnapshotTable.current_version
    fired = {"done": False}

    def racing(self):
        v = orig(self)
        if not fired["done"] and v == 1:
            fired["done"] = True
            m = load_manifest(self.root, 1)
            publish_version(self.root, m["files"], 1, m["stats"])
        return v

    try:
        SnapshotTable.current_version = racing
        v = t.commit_append(_kv(spark, 5, start=5).coalesce(1))
    finally:
        SnapshotTable.current_version = orig
    # the append retried on top of the interloper's v2 and landed v3
    assert v == 3
    assert t.read().count() == 10


# ------------------------------------------------------------------ #
# 11. merge-on-read MERGE INTO + protocol versioning
# ------------------------------------------------------------------ #

def test_merge_mor_three_branches_one_commit(spark):
    t = SnapshotTable(spark, _tmp("merge"))
    t.commit_append(_kv(spark, 10).coalesce(1))  # k 0..9, v=2k
    v_before = t.current_version()
    # source: keys 5..14; delete k<7, update the rest matched, insert new
    src = spark.range(5, 15).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("v")
    )
    v = t.merge_mor(
        src,
        on=["k"],
        when_matched_update={"v": F.col("__src_v")},
        when_matched_delete=F.col("k") < 7,
    )
    assert v == v_before + 1  # ONE atomic commit
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    # 0..4 untouched, 5/6 deleted, 7..9 updated to 100k, 10..14 inserted
    assert set(rows) == set(range(5)) | set(range(7, 15))
    assert all(rows[k] == 2 * k for k in range(5))
    assert all(rows[k] == 100 * k for k in range(7, 15))
    # history intact: pre-merge version still shows 10 rows
    assert t.read(v_before).count() == 10


def test_merge_mor_unconditional_update_and_insert_only(spark):
    t = SnapshotTable(spark, _tmp("merge2"))
    t.commit_append(_kv(spark, 5).coalesce(1))
    # matched rows with NO clauses stay untouched; inserts still land
    src = spark.range(3, 8).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
    )
    t.merge_mor(src, on=["k"])  # insert-only merge
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert set(rows) == set(range(8))
    assert all(rows[k] == 2 * k for k in range(3, 5))  # untouched
    assert all(rows[k] == 0 for k in range(5, 8))      # inserted


def test_merge_mor_rejects_ambiguous_source(spark):
    t = SnapshotTable(spark, _tmp("merge3"))
    t.commit_append(_kv(spark, 5).coalesce(1))
    dup = spark.createDataFrame(
        [(2, 10), (2, 20)], "k long, v long"
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        t.merge_mor(
            dup, on=["k"], when_matched_update={"v": F.col("__src_v")}
        )


def test_protocol_versioning_guards_old_readers(spark, monkeypatch):
    import s3_glue_redshift_guide_spark.sources.snapshots as snap

    t = SnapshotTable(spark, _tmp("proto"))
    t.commit_append(_kv(spark, 5).coalesce(1))
    m = load_manifest(t.root, 1)
    assert m["protocol"] == {"reader": 1, "writer": 2}
    t.delete_where(F.col("k") == 0)  # DV commit → reader 2 required
    m2 = load_manifest(t.root, 2)
    assert m2["protocol"]["reader"] == 2
    # a downlevel reader must refuse, not silently resurrect rows
    monkeypatch.setattr(snap, "SUPPORTED_READER_VERSION", 1)
    with pytest.raises(snap.ProtocolError, match="reader version 2"):
        load_manifest(t.root, 2)
    # v1 (plain files) still readable by the old reader
    assert load_manifest(t.root, 1)["version"] == 1


# ------------------------------------------------------------------ #
# 12. generated columns (GENERATED ALWAYS AS)
# ------------------------------------------------------------------ #

def test_generated_column_computed_and_validated(spark):
    t = SnapshotTable(spark, _tmp("gen"))
    t.add_generated_column("v2x", "v * 2")  # registered on empty table
    t.commit_append(_kv(spark, 10).coalesce(1))  # batch omits v2x
    df = t.read()
    assert "v2x" in df.columns
    assert df.filter(F.col("v2x") != F.col("v") * 2).count() == 0
    # a batch SUPPLYING the column must agree, exactly
    good = spark.range(10, 15).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") * 4).alias("v2x"),
    )
    t.commit_append(good)
    assert t.read().count() == 15
    bad = spark.range(20, 22).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.lit(0).cast("long").alias("v2x"),
    )
    with pytest.raises(ValueError, match="__gen_v2x"):
        t.commit_append(bad)
    assert t.read().count() == 15
    # survives unrelated commits; rename/drop of involved cols rejected
    m = load_manifest(t.root, t.current_version())
    assert m["generated"] == {"v2x": "v * 2"}
    with pytest.raises(ValueError, match="generated"):
        t.rename_column("v", "value")
    with pytest.raises(ValueError, match="generated"):
        t.drop_column("v2x")
    # dropping the expression frees the column and the rename
    t.drop_generated_column_expr("v2x")
    t.rename_column("v", "value")


def test_generated_column_registration_validates_snapshot(spark):
    t = SnapshotTable(spark, _tmp("genreg"))
    t.commit_append(_kv(spark, 5).coalesce(1))
    with pytest.raises(ValueError, match="does not exist"):
        t.add_generated_column("v2x", "v * 2")
    with pytest.raises(ValueError, match="disagrees"):
        t.add_generated_column("v", "k * 3")  # v = 2k, not 3k
    t.add_generated_column("v", "k * 2")  # exact: v really is 2k
    with pytest.raises(ValueError, match="__gen_v"):
        t.commit_append(
            spark.range(100, 101).select(
                F.col("id").alias("k"), F.lit(7).cast("long").alias("v")
            )
        )


def test_connector_validates_generated_columns(spark):
    register_snapshot_source(spark)
    t = SnapshotTable(spark, _tmp("gencon"))
    t.add_generated_column("v2x", "v * 2")
    t.commit_append(_kv(spark, 5).coalesce(1))
    # connector write supplying an agreeing column: lands, metadata kept
    spark.range(5, 8).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") * 4).alias("v2x"),
    ).write.format("pysnapshot").option("root", t.root).mode(
        "append"
    ).save()
    m = load_manifest(t.root, t.current_version())
    assert m["generated"] == {"v2x": "v * 2"}
    assert t.read().count() == 8
    # disagreeing values: vetoed before publish
    v_before = t.current_version()
    with pytest.raises(Exception, match="__gen_v2x"):
        spark.range(8, 9).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("v"),
            F.lit(1).cast("long").alias("v2x"),
        ).write.format("pysnapshot").option("root", t.root).mode(
            "append"
        ).save()
    assert t.current_version() == v_before
    # omitting the column entirely: refused with guidance
    with pytest.raises(Exception, match="missing from the"):
        _kv(spark, 2, start=50).write.format("pysnapshot").option(
            "root", t.root
        ).mode("append").save()
    assert t.read().count() == 8


def test_clone_carries_generated_columns(spark):
    t = SnapshotTable(spark, _tmp("genclone"))
    t.add_generated_column("v2x", "v * 2")
    t.commit_append(_kv(spark, 4).coalesce(1))
    c = t.clone_shallow(_tmp("genclone_dst"))
    m = load_manifest(c.root, c.current_version())
    assert m["generated"] == {"v2x": "v * 2"}
    c.commit_append(_kv(spark, 2, start=10).coalesce(1))
    df = c.read()
    assert df.filter(F.col("v2x") != F.col("v") * 2).count() == 0


# ------------------------------------------------------------------ #
# 13. metadata-only aggregates (COUNT / MIN / MAX from the log)
# ------------------------------------------------------------------ #

def test_metadata_count_banked_footer_and_dv(spark):
    t = SnapshotTable(spark, _tmp("metacnt"))
    # commit 1: stats banked (the zero-footer-read path)
    t.commit_append(_kv(spark, 100).coalesce(1), stats_cols=["k"])
    assert t.metadata_count() == 100
    # commit 2: #nulls stats now carried for new files too
    t.commit_append(_kv(spark, 50, start=100).coalesce(2))
    assert t.metadata_count() == 150
    # DV delete subtracts exactly; re-delete stays idempotent
    t.delete_where(F.col("k") < 10)
    assert t.metadata_count() == 140
    t.delete_where(F.col("k") < 20)
    assert t.metadata_count() == 130
    assert t.read().count() == 130
    # historical version still answers pre-delete
    assert t.metadata_count(version=2) == 150
    # materialized deletes: DV gone, count unchanged
    t.materialize_deletes()
    assert t.metadata_count() == 130


def test_metadata_count_footer_fallback_without_stats(spark):
    t = SnapshotTable(spark, _tmp("metacnt_nostat"))
    t.commit_append(_kv(spark, 42).coalesce(3))  # no stats_cols at all
    m = load_manifest(t.root, 1)
    assert all(not st for st in m["stats"].values())
    assert t.metadata_count() == 42


def test_metadata_min_max_exact_and_refusals(spark):
    t = SnapshotTable(spark, _tmp("metamm"))
    t.commit_append(_kv(spark, 100).coalesce(2), stats_cols=["k", "v"])
    t.commit_append(_kv(spark, 50, start=200).coalesce(1))
    assert t.metadata_min_max("k") == (0, 249)
    assert t.metadata_min_max("v") == (0, 498)
    # live DVs: refuse (a tombstoned row may hold the extreme)
    t.delete_where(F.col("k") >= 240)
    assert t.metadata_min_max("k") is None
    # materialize → answerable again, with the new true max
    t.materialize_deletes()
    assert t.metadata_min_max("k") == (0, 239)


def test_metadata_min_max_alias_groups_after_rename(spark):
    t = SnapshotTable(spark, _tmp("metamm_ren"))
    t.commit_append(_kv(spark, 10).coalesce(1), stats_cols=["v"])
    t.rename_column("v", "val")
    # post-rename files physically carry the NEW name
    t.commit_append(
        spark.range(100, 110).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("val")
        ).coalesce(1)
    )
    # old files' stats live under "v", new under "val" — union of eras
    assert t.metadata_min_max("val") == (0, 218)
    with pytest.raises(ValueError, match="unknown column"):
        t.metadata_min_max("v")


def test_metadata_min_max_all_null_and_empty(spark):
    t = SnapshotTable(spark, _tmp("metamm_null"))
    df = spark.range(5).select(
        F.col("id").alias("k"),
        F.lit(None).cast("long").alias("v"),
    )
    t.commit_append(df.coalesce(1), stats_cols=["k", "v"])
    # answerable and NULL (no non-null values anywhere)
    assert t.metadata_min_max("v") == (None, None)
    assert t.metadata_min_max("k") == (0, 4)
    # a later file with real values lifts it
    t.commit_append(_kv(spark, 3, start=50).coalesce(1))
    assert t.metadata_min_max("v") == (100, 104)


# ------------------------------------------------------------------ #
# 14. per-file Bloom filter index (point lookups past zone maps)
# ------------------------------------------------------------------ #

def _interleaved(spark, lo, hi, shard, nshards):
    """Rows whose k values interleave across shards: every shard spans
    the full [lo, hi) domain, so zone maps cannot prune any file."""
    return (
        spark.range(lo, hi)
        .filter(F.col("id") % nshards == shard)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    )


def test_bloom_index_prunes_where_zone_maps_cannot(spark):
    t = SnapshotTable(spark, _tmp("bloom"))
    for s in range(4):
        t.commit_append(
            _interleaved(spark, 0, 4000, s, 4).coalesce(1),
            stats_cols=["k"],
        )
    # zone maps: all 4 files span [s, ~4000) — no pruning possible
    zk, total = t.pruned_files("k", 42, 42)
    assert total == 4 and len(zk) == 4
    t.add_bloom_index("k", fpp=0.001)
    files, zone_n, total = t.point_lookup_files("k", 42)
    assert zone_n == 4 and total == 4
    assert len(files) == 1  # the one shard that holds 42 (42 % 4 == 2)
    rows = t.read_where_eq("k", 42).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(42, 84)]
    # absent value: usually zero files, always zero rows
    assert t.read_where_eq("k", 999_999).count() == 0


def test_bloom_index_extends_on_append_and_survives_commits(spark):
    t = SnapshotTable(spark, _tmp("bloomext"))
    t.add_bloom_index("k")  # registered on empty table
    for s in range(3):
        t.commit_append(
            _interleaved(spark, 0, 3000, s, 3).coalesce(1),
            stats_cols=["k"],
        )
    m = load_manifest(t.root, t.current_version())
    assert len(m["blooms"]) == 3  # every appended file auto-indexed
    assert all("k" in v for v in m["blooms"].values())
    files, _, total = t.point_lookup_files("k", 100)
    assert total == 3 and len(files) == 1
    assert t.read_where_eq("k", 100).count() == 1
    # rewrite: replacement files re-indexed, old pointers dropped
    t.commit_rewrite(t.read().repartition(2), stats_cols=["k"])
    m = load_manifest(t.root, t.current_version())
    assert set(m["blooms"]) == set(m["files"])
    assert t.read_where_eq("k", 100).count() == 1


def test_bloom_index_conservative_without_sidecar(spark):
    """Files that a write path didn't index (MOR post-images) are READ,
    never pruned — blooms waste reads, never lose rows."""
    t = SnapshotTable(spark, _tmp("bloomcons"))
    t.commit_append(_kv(spark, 100).coalesce(1), stats_cols=["k"])
    t.add_bloom_index("k")
    t.update_where(F.col("k") == 7, {"v": F.lit(777).cast("bigint")})
    # the post-image file has no bloom -> still found
    rows = t.read_where_eq("k", 7).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(7, 777)]
    assert t.read_where_eq("k", 8).count() == 1


def test_bloom_index_follows_rename_aliases(spark):
    t = SnapshotTable(spark, _tmp("bloomren"))
    t.commit_append(_kv(spark, 50).coalesce(1), stats_cols=["k"])
    t.rename_column("k", "key")
    t.add_bloom_index("key")  # pre-rename file: values under "k"
    t.commit_append(
        spark.range(100, 150).select(
            F.col("id").alias("key"), (F.col("id") * 2).alias("v")
        ).coalesce(1)
    )
    assert t.read_where_eq("key", 10).count() == 1  # old-era value
    assert t.read_where_eq("key", 120).count() == 1  # new-era value
    files, _, total = t.point_lookup_files("key", 10)
    assert total == 2 and len(files) == 1  # bloom separates the eras


# ------------------------------------------------------------------ #
# 15. change-feed materialized view (retractable incremental MV)
# ------------------------------------------------------------------ #

def _mv_pair(spark, name):
    from s3_glue_redshift_guide_spark.operators.mv import (
        ChangeFeedMaterializedView,
    )

    src = SnapshotTable(spark, _tmp(f"{name}_src"))
    mv = ChangeFeedMaterializedView(
        spark,
        src,
        _tmp(f"{name}_mv"),
        keys=["g"],
        measures={"n": ("count",), "s": ("sum", "v")},
    )
    return src, mv


def _gkv(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 3).alias("g"),
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
    )


def _recompute(src):
    return {
        (r["g"], r["n"], r["s"])
        for r in src.read()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }


def _mv_rows(mv):
    return {(r["g"], r["n"], r["s"]) for r in mv.read().collect()}


def test_mv_insert_delete_update_matches_recompute(spark):
    src, mv = _mv_pair(spark, "mv1")
    src.commit_append(_gkv(spark, 0, 60).coalesce(1))
    assert mv.refresh() == 1
    assert _mv_rows(mv) == _recompute(src)
    # second batch + DV delete, one refresh folds both commits
    src.commit_append(_gkv(spark, 60, 90).coalesce(1))
    src.delete_where(F.col("k") % 7 == 0)
    assert mv.refresh() == 3
    assert _mv_rows(mv) == _recompute(src)
    # merge-on-read UPDATE arrives as its delete/insert pair
    src.update_where(F.col("k") == 5, {"v": F.lit(99999).cast("bigint")})
    mv.refresh()
    assert _mv_rows(mv) == _recompute(src)


def test_mv_fully_retracted_group_vanishes(spark):
    src, mv = _mv_pair(spark, "mv2")
    src.commit_append(_gkv(spark, 0, 30).coalesce(1))
    mv.refresh()
    assert len(_mv_rows(mv)) == 3
    src.delete_where(F.col("g") == 1)
    mv.refresh()
    rows = _mv_rows(mv)
    assert {r[0] for r in rows} == {0, 2}
    assert rows == _recompute(src)


def test_mv_cursor_is_atomic_and_idempotent(spark):
    src, mv = _mv_pair(spark, "mv3")
    src.commit_append(_gkv(spark, 0, 30).coalesce(1))
    v = mv.refresh()
    assert mv.last_refreshed_version() == v == src.current_version()
    state_v = mv.state.current_version()
    # no source movement: refresh is a no-op, no new state commit
    assert mv.refresh() == v
    assert mv.state.current_version() == state_v
    assert _mv_rows(mv) == _recompute(src)


def test_mv_rejects_unretractable_specs(spark):
    from s3_glue_redshift_guide_spark.operators.mv import (
        ChangeFeedMaterializedView,
    )

    src = SnapshotTable(spark, _tmp("mv4_src"))
    with pytest.raises(ValueError, match="retractable"):
        ChangeFeedMaterializedView(
            spark, src, _tmp("mv4"), ["g"], {"m": ("min", "v")}
        )
    # double sums drift under retraction: rejected at refresh
    mv = ChangeFeedMaterializedView(
        spark, src, _tmp("mv4b"), ["g"],
        {"s": ("sum", "dv")},
    )
    src.commit_append(
        _gkv(spark, 0, 10).withColumn(
            "dv", F.col("v").cast("double")
        ).coalesce(1)
    )
    with pytest.raises(ValueError, match="floating point"):
        mv.refresh()


def test_vacuum_reclaims_orphan_bloom_sidecars(spark):
    t = SnapshotTable(spark, _tmp("bloomvac"))
    t.commit_append(_kv(spark, 100).coalesce(2), stats_cols=["k"])
    t.add_bloom_index("k")
    idx = os.path.join(t.root, "_indexes")
    n0 = len(os.listdir(idx))
    assert n0 == 2
    # rewrite: old files' sidecars become unreferenced at the head
    t.commit_rewrite(t.read().repartition(3), stats_cols=["k"])
    assert len(os.listdir(idx)) == 5
    deleted = t.vacuum(retain_versions=1)
    assert len(os.listdir(idx)) == 3  # head files keep theirs
    assert sum(p.endswith(".bloom.json") for p in deleted) == 2
    assert t.read_where_eq("k", 10).count() == 1
    # dropping the index orphans the rest on the next vacuum
    t.drop_bloom_index("k")
    t.vacuum(retain_versions=1)
    assert len(os.listdir(idx)) == 0


def test_connector_prunes_partitions_with_bloom(spark):
    register_snapshot_source(spark)
    t = SnapshotTable(spark, _tmp("bloomconn"))
    for s in range(4):
        t.commit_append(
            _interleaved(spark, 0, 4000, s, 4).coalesce(1),
            stats_cols=["k"],
        )
    t.add_bloom_index("k", fpp=0.001)
    df = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .load()
        .filter(F.col("k") == 42)
    )
    rows = df.collect()
    assert [(r["k"], r["v"]) for r in rows] == [(42, 84)]
    # the scan planned exactly ONE partition (bloom-pruned): assert via
    # the planner directly — the runtime plan string doesn't expose
    # Python DataSource partition counts
    from pyspark.sql.datasource import EqualTo

    from s3_glue_redshift_guide_spark.sources.pyds import (
        SnapshotManifestReader,
    )

    sb = SnapshotManifestReader({"root": t.root})
    sb.pushFilters([EqualTo(("k",), 42)])
    assert len(sb.partitions()) == 1
    sb2 = SnapshotManifestReader({"root": t.root})
    sb2.pushFilters([])
    assert len(sb2.partitions()) == 4


def test_bloom_probe_kind_gate_is_conservative(spark):
    """A probe in a different value domain than the column (int vs the
    banked str kind) must KEEP the file — never a false negative."""
    t = SnapshotTable(spark, _tmp("bloomkind"))
    t.commit_append(
        spark.range(100).select(
            F.col("id").cast("string").alias("s"),
            F.col("id").alias("v"),
        ).coalesce(1),
        stats_cols=["s"],
    )
    t.add_bloom_index("s")
    files, _, _ = t.point_lookup_files("s", 42)  # int probe, str column
    assert len(files) == 1  # kept despite the bloom
    # the native-domain probe prunes the absent value
    files2, _, _ = t.point_lookup_files("s", "no-such-value")
    assert files2 == []


def test_mv_refresh_stream_exactly_once(spark):
    """Always-on MV maintenance over the connector's CDF STREAM: each
    epoch folds through the same retraction aggregation, the cursor
    guard drops redelivered/already-applied versions, and restarts can
    neither double-apply nor skip."""
    src, mv = _mv_pair(spark, "mvs")
    src.commit_append(_gkv(spark, 0, 30).coalesce(1))
    src.delete_where(F.col("k") % 5 == 0)
    src.commit_append(_gkv(spark, 30, 45).coalesce(1))
    ck = _tmp("mvs_ck")
    q = mv.refresh_stream(checkpoint=ck, available_now=True)
    q.awaitTermination()
    assert _mv_rows(mv) == _recompute(src)
    cursor1 = mv.last_refreshed_version()
    assert cursor1 == src.current_version()
    # more churn -> a RESTARTED stream (same checkpoint) folds only it
    src.update_where(F.col("k") == 31, {"v": F.lit(7).cast("bigint")})
    src.delete_where(F.col("g") == 2)
    q2 = mv.refresh_stream(checkpoint=ck, available_now=True)
    q2.awaitTermination()
    assert _mv_rows(mv) == _recompute(src)
    # idle restart: cursor and state version both unchanged
    sv = mv.state.current_version()
    q3 = mv.refresh_stream(checkpoint=ck, available_now=True)
    q3.awaitTermination()
    assert mv.state.current_version() == sv
    # mixed use: batch refresh() first, then a FRESH-checkpoint stream
    # (bootstraps from version 0) must not double-apply old versions
    src.commit_append(_gkv(spark, 100, 110).coalesce(1))
    mv.refresh()
    src.commit_append(_gkv(spark, 110, 120).coalesce(1))
    q4 = mv.refresh_stream(checkpoint=_tmp("mvs_ck2"), available_now=True)
    q4.awaitTermination()
    assert _mv_rows(mv) == _recompute(src)


def test_mv_tracks_source_through_restore(spark):
    """RESTORE publishes the rewind as a new commit, so its CDF legs
    retract the rolled-back rows — the MV follows without special
    cases."""
    src, mv = _mv_pair(spark, "mvres")
    src.commit_append(_gkv(spark, 0, 30).coalesce(1))
    mv.refresh()
    src.commit_append(_gkv(spark, 30, 60).coalesce(1))
    src.delete_where(F.col("k") < 5)
    mv.refresh()
    assert _mv_rows(mv) == _recompute(src)
    src.restore(1)  # back to the first 30 rows, as version 4
    mv.refresh()
    assert _mv_rows(mv) == _recompute(src)
    assert mv.last_refreshed_version() == src.current_version()


def test_mv_rebuilds_after_log_truncation(spark):
    src, mv = _mv_pair(spark, "mvtrunc")
    src.commit_append(_gkv(spark, 0, 30).coalesce(1))
    mv.refresh()
    src.commit_append(_gkv(spark, 30, 60).coalesce(1))
    src.delete_where(F.col("k") % 7 == 0)
    src.commit_append(_gkv(spark, 60, 75).coalesce(1))
    # retention drops every manifest the cursor would need
    src.vacuum(retain_versions=1)
    v = mv.refresh()  # falls back to the full rebuild, not an error
    assert v == src.current_version()
    assert _mv_rows(mv) == _recompute(src)
    # and incremental refresh resumes afterwards
    src.commit_append(_gkv(spark, 100, 110).coalesce(1))
    mv.refresh()
    assert _mv_rows(mv) == _recompute(src)


def test_cdf_stream_emits_resurrected_rows_after_restore(spark):
    """A RESTORE that only drops deletion-vector sidecars (same file
    set) must surface the resurrected positions as INSERTS in the CDF
    stream — previously it emitted nothing for such commits."""
    import uuid as _uuid

    register_snapshot_source(spark)
    t = SnapshotTable(spark, _tmp("cdfres"))
    t.commit_append(_kv(spark, 20).coalesce(1))      # v1
    t.delete_where(F.col("k") < 5)                    # v2: DV delete
    t.restore(1)                                      # v3: sidecars gone
    assert t.read().count() == 20
    stream = (
        spark.readStream.format("pysnapshot")
        .schema(
            "k bigint, v bigint, _change_type string, "
            "_commit_version bigint"
        )
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .load()
        .select("k", "v", "_change_type", "_commit_version")
    )
    name = f"cdfres_{_uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", _tmp("cdfres_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    v3 = [(r["k"], r["_change_type"]) for r in rows
          if r["_commit_version"] == 3]
    assert sorted(v3) == [(k, "insert") for k in range(5)]
    # the whole feed: 20 v1 inserts, 5 v2 deletes, 5 v3 inserts
    from collections import Counter

    c = Counter((r["_commit_version"], r["_change_type"]) for r in rows)
    assert c == {(1, "insert"): 20, (2, "delete"): 5, (3, "insert"): 5}


def test_bloom_survives_commit_replace_and_clone(spark):
    t = SnapshotTable(spark, _tmp("bloomcr"))
    for s in range(3):
        t.commit_append(
            _interleaved(spark, 0, 3000, s, 3).coalesce(1),
            stats_cols=["k"],
        )
    t.add_bloom_index("k", fpp=0.001)
    m = load_manifest(t.root, t.current_version())
    victim = sorted(m["files"])[0]
    # surgical rewrite: replacement file gets indexed, kept files keep
    # their pointers
    repl = spark.read.parquet(victim)
    t.commit_replace([victim], repl.coalesce(1))
    m2 = load_manifest(t.root, t.current_version())
    assert set(m2["blooms"]) == set(m2["files"])
    files, _, total = t.point_lookup_files("k", 100)
    assert total == 3 and len(files) == 1
    # shallow clone borrows index sidecars like data files
    c = t.clone_shallow(_tmp("bloomcr_dst"))
    mc = load_manifest(c.root, c.current_version())
    assert mc.get("bloom_cols") == {"k": 0.001}
    assert set(mc["blooms"]) == set(mc["files"])
    cf, _, ctot = c.point_lookup_files("k", 100)
    assert ctot == 3 and len(cf) == 1
    assert c.read_where_eq("k", 100).count() == 1
    # clone appends keep extending the borrowed index
    c.commit_append(_interleaved(spark, 3000, 3300, 0, 1).coalesce(1))
    mc2 = load_manifest(c.root, c.current_version())
    assert set(mc2["blooms"]) == set(mc2["files"])


def test_per_commit_feed_reports_restore_resurrections(spark):
    """read_change_feed (per-commit batch CDF) must show a restore's
    resurrected rows as inserts at the restore version."""
    t = SnapshotTable(spark, _tmp("feedres"))
    t.commit_append(_kv(spark, 20).coalesce(1))   # v1
    t.delete_where(F.col("k") < 5)                 # v2
    t.restore(1)                                   # v3
    feed = t.read_change_feed(0).select(
        "k", "_change_type", "_commit_version"
    ).collect()
    from collections import Counter

    c = Counter((r["_commit_version"], r["_change_type"]) for r in feed)
    assert c == {(1, "insert"): 20, (2, "delete"): 5, (3, "insert"): 5}
    assert sorted(
        r["k"] for r in feed if r["_commit_version"] == 3
    ) == list(range(5))


# ------------------------------------------------------------------ #
# 16. DESCRIBE HISTORY (operation-labeled audit view)
# ------------------------------------------------------------------ #

def test_history_labels_every_operation(spark):
    ticks = iter(float(i) for i in range(1, 100))
    t = SnapshotTable(spark, _tmp("hist"), clock=lambda: next(ticks))
    t.commit_append(_kv(spark, 50).coalesce(2), stats_cols=["k"])
    t.delete_where(F.col("k") < 5)
    t.update_where(F.col("k") == 10, {"v": F.lit(0).cast("bigint")})
    t.rename_column("v", "val")
    t.add_constraint("k_nonneg", "k >= 0")
    t.add_bloom_index("k")
    t.materialize_deletes()
    t.restore(2)
    h = {r["version"]: r for r in t.history().collect()}
    ops = {v: r["operation"] for v, r in h.items()}
    assert ops == {
        1: "APPEND", 2: "DELETE", 3: "UPDATE", 4: "RENAME COLUMN",
        5: "ADD CONSTRAINT", 6: "ADD BLOOM INDEX",
        7: "MATERIALIZE DELETES", 8: "RESTORE",
    }
    # newest first; injected clock surfaces; file/dv accounting sane
    versions = [r["version"] for r in t.history().collect()]
    assert versions == sorted(versions, reverse=True)
    assert h[1]["timestamp"] == 1.0 and h[1]["n_added"] == 2
    assert h[2]["n_dv_files"] >= 1 and h[2]["n_added"] == 0
    assert h[7]["n_removed"] >= 1  # materialize rewrote DV'd files
    # connector writes label themselves too
    register_snapshot_source(spark)
    _kv(spark, 3, start=500).selectExpr(
        "k", "v as val"
    ).write.format("pysnapshot").option("root", t.root).mode(
        "append"
    ).save()
    ops2 = {
        r["version"]: r["operation"] for r in t.history().collect()
    }
    assert ops2[t.current_version()] == "WRITE"


def test_history_respects_vacuum_horizon(spark):
    t = SnapshotTable(spark, _tmp("histvac"))
    for i in range(4):
        t.commit_append(_kv(spark, 5, start=i * 10).coalesce(1))
    t.vacuum(retain_versions=2)
    versions = [r["version"] for r in t.history().collect()]
    assert versions == [4, 3]


# ------------------------------------------------------------------ #
# 17. GENERATED columns x MOR writes: recompute, don't reject
# ------------------------------------------------------------------ #

def _gen_table(spark, prefix):
    t = SnapshotTable(spark, _tmp(prefix))
    t.commit_append(
        spark.createDataFrame(
            [(i, i * 10, i * 20) for i in range(10)],
            "k bigint, v bigint, v2x bigint",
        )
    )
    t.add_generated_column("v2x", "v * 2")
    return t


def test_update_where_recomputes_generated_columns(spark):
    """An UPDATE whose assignment changes a generation INPUT must land
    with the generated column recomputed (Delta's semantics) — before
    the fix the stale post-image value tripped the writer-side <=>
    validation and the update was rejected outright."""
    t = _gen_table(spark, "genupd")
    t.update_where(F.col("k") == 3, {"v": F.lit(999).cast("bigint")})
    row = t.read().filter("k = 3").collect()[0]
    assert (row["v"], row["v2x"]) == (999, 1998)
    # untouched rows keep their original (already-consistent) values
    other = t.read().filter("k = 4").collect()[0]
    assert (other["v"], other["v2x"]) == (40, 80)


def test_update_where_validates_explicit_generated_assignment(spark):
    """Assigning the generated column ITSELF stays validated: a
    consistent explicit pair lands, an inconsistent one is rejected."""
    t = _gen_table(spark, "genexp")
    t.update_where(
        F.col("k") == 2,
        {"v": F.lit(50).cast("bigint"),
         "v2x": F.lit(100).cast("bigint")},
    )
    assert t.read().filter("k = 2").collect()[0]["v2x"] == 100
    with pytest.raises(ValueError, match="constraint violation"):
        t.update_where(
            F.col("k") == 2,
            {"v": F.lit(7).cast("bigint"),
             "v2x": F.lit(999).cast("bigint")},
        )


def test_merge_mor_recomputes_generated_columns(spark):
    """MERGE with update+insert branches on a generated-column table:
    updated rows recompute from the new inputs, inserted rows (source
    omits the column) compute it fresh — and the two branches write
    separately so neither surfaces NULLs into the other's validation."""
    t = _gen_table(spark, "genmrg")
    src = spark.createDataFrame(
        [(3, 111), (77, 222)], "k bigint, nv bigint"
    )
    t.merge_mor(
        src.select("k", "nv"),
        on=["k"],
        when_matched_update={"v": F.col("__src_nv")},
    )
    got = {
        r["k"]: (r["v"], r["v2x"])
        for r in t.read().filter("k in (3, 77)").collect()
    }
    assert got[3] == (111, 222)
    # unmatched source row inserted; nv rides along as a new column,
    # v/v2x generated-null-free: v absent from source -> NULL v, and
    # the generated column computes from it (NULL * 2 = NULL)
    assert 77 in got


# ------------------------------------------------------------------ #
# 18. Table-level partition spec + partition evolution
# ------------------------------------------------------------------ #

def _mod3(spark, n=90, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("bucket"),
        (F.col("id") * 2).alias("v"),
    )


def test_partition_spec_clusters_writes_and_prunes(spark):
    t = SnapshotTable(spark, _tmp("pspec"))
    t.set_partition_spec(["bucket"])
    t.commit_append(_mod3(spark))
    m = load_manifest(t.root, t.current_version())
    # one file per live partition value, each path-encoding its tuple
    vals = sorted(
        t.partition_values(f).get("bucket") for f in m["files"]
    )
    assert vals == ["0", "1", "2"]
    pruned = t.partition_pruned_files({"bucket": 1})
    assert len(pruned) == 1
    assert t.partition_values(pruned[0]) == {"bucket": "1"}
    got = t.read_partition({"bucket": 1})
    assert got.count() == 30
    assert got.filter("bucket <> 1").count() == 0
    # data columns are RETAINED in the files: a plain read sees them
    assert t.read().count() == 90
    assert set(t.read().columns) == {"k", "bucket", "v"}


def test_partition_spec_evolution_is_metadata_only(spark):
    """Iceberg's partition evolution: changing the spec rewrites ZERO
    files — old-layout files miss the new segments and partition-pruned
    reads keep them conservatively."""
    t = SnapshotTable(spark, _tmp("pevol"))
    t.commit_append(_mod3(spark, 30).coalesce(1))          # unpartitioned
    t.set_partition_spec(["bucket"])
    t.commit_append(_mod3(spark, 30, start=100))           # partitioned
    files = load_manifest(t.root, t.current_version())["files"]
    old = [f for f in files if not t.partition_values(f)]
    new = [f for f in files if t.partition_values(f)]
    assert len(old) == 1 and len(new) == 3
    pruned = t.partition_pruned_files({"bucket": 2})
    # the old-layout file is conservatively kept, plus bucket=2's file
    assert set(pruned) == set(old) | {
        f for f in new if t.partition_values(f)["bucket"] == "2"
    }
    got = t.read_partition({"bucket": 2}).filter("bucket = 2")
    assert got.count() == 10 + 10
    # spec change is itself an audited metadata commit
    ops = {r["version"]: r["operation"] for r in t.history().collect()}
    assert "SET PARTITION SPEC" in ops.values()


def test_partition_spec_validation(spark):
    t = SnapshotTable(spark, _tmp("pval"))
    t.commit_append(
        spark.range(5).select(
            F.col("id").alias("k"), F.rand(7).alias("x")
        )
    )
    with pytest.raises(ValueError, match="round-trip"):
        t.set_partition_spec(["x"])            # double: no path fidelity
    with pytest.raises(KeyError):
        t.set_partition_spec(["nope"])
    t.set_partition_spec(["k"])
    with pytest.raises(ValueError, match="missing from the write"):
        t.commit_append(
            spark.range(3).select(F.col("id").alias("other"))
        )


def test_partition_spec_composes_with_dv_and_vacuum(spark):
    t = SnapshotTable(spark, _tmp("pdv"))
    t.set_partition_spec(["bucket"])
    t.commit_append(_mod3(spark))
    t.delete_where(F.col("k") < 9)             # 3 rows off each bucket
    assert t.read().count() == 81
    assert t.read_partition({"bucket": 0}).count() == 27
    # materialize folds the DVs into a REWRITE that stays partitioned
    t.materialize_deletes()
    m = t.current_version()
    files = load_manifest(t.root, m)["files"]
    assert all(t.partition_values(f).get("bucket") for f in files) or \
        sorted(t.partition_values(f)["bucket"] for f in files) == ["0", "1", "2"]
    # vacuum reclaims the pre-rewrite nested files (and the now-
    # unreferenced DV sidecar dir)
    deleted = t.vacuum(retain_versions=1)
    assert len([d for d in deleted if d.endswith(".parquet")]) == 3
    assert t.read().count() == 81


def test_partition_spec_connector_writes_land_spec_compliant(spark):
    """Round 7 replaced the connector's spec refusal with spec-routed
    writes: shards land under __part_ segments and prune."""
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        partition_values_from_path,
    )

    t = SnapshotTable(spark, _tmp("pconn"))
    t.set_partition_spec(["bucket"])
    t.commit_append(_mod3(spark, 30))
    register_snapshot_source(spark)
    # reads through the connector remain exact (nested paths are plain
    # per-file Arrow reads)
    conn = (
        spark.read.format("pysnapshot").option("root", t.root).load()
    )
    assert conn.count() == 30
    _mod3(spark, 6, start=500).write.format("pysnapshot").option(
        "root", t.root
    ).mode("append").save()
    m = load_manifest(t.root, t.current_version())
    new_files = [f for f in m["files"] if "__part_bucket=" in f]
    assert len(new_files) >= 6  # spec'd layout on BOTH write paths
    assert all(
        "bucket" in partition_values_from_path(f) for f in new_files
    )
    assert t.read().count() == 36


# ------------------------------------------------------------------ #
# 19. Partition spec: composition with schema edits, restore, clone
# ------------------------------------------------------------------ #

def test_spec_column_rename_drop_rejected(spark):
    """Renaming/dropping a partition-spec column would brick every
    subsequent write (the spec stores logical names) — rejected up
    front, same posture as constrained columns."""
    t = SnapshotTable(spark, _tmp("pschema"))
    t.set_partition_spec(["bucket"])
    t.commit_append(_mod3(spark, 30))
    with pytest.raises(ValueError, match="partition-spec"):
        t.rename_column("bucket", "b2")
    with pytest.raises(ValueError, match="partition-spec"):
        t.drop_column("bucket")
    # non-spec columns still rename/drop freely
    t.rename_column("v", "val")
    # and after evolving the spec away, the edit is allowed
    t.set_partition_spec([])
    t.rename_column("bucket", "b2")
    assert set(t.read().columns) == {"k", "b2", "val"}


def test_restore_carries_target_version_spec(spark):
    """RESTORE publishes the TARGET version's partition spec verbatim —
    inheriting the head's spec could name a column the restored schema
    lacks, bricking writes."""
    t = SnapshotTable(spark, _tmp("prest"))
    t.commit_append(_mod3(spark, 30).coalesce(1))     # v1: no spec
    pre = t.current_version()
    t.set_partition_spec(["bucket"])
    t.commit_append(_mod3(spark, 30, start=100))
    t.restore(pre)
    assert t._partition_spec() == []
    # post-restore writes land unpartitioned (the restored contract)
    t.commit_append(_mod3(spark, 3, start=500).coalesce(1))
    m = load_manifest(t.root, t.current_version())
    new = [f for f in m["files"] if "__part_" in f]
    assert new == []
    # and restoring FORWARD to the spec'd version restores the spec
    t.restore(pre + 2)
    assert t._partition_spec() == ["bucket"]


def test_clone_carries_partition_spec(spark):
    t = SnapshotTable(spark, _tmp("pclsrc"))
    t.set_partition_spec(["bucket"])
    t.commit_append(_mod3(spark, 30))
    c = t.clone_shallow(_tmp("pcldst"))
    assert c._partition_spec() == ["bucket"]
    c.commit_append(_mod3(spark, 30, start=100))
    m = load_manifest(c.root, c.current_version())
    added = [f for f in m["files"] if f.startswith(c.root)]
    assert added and all("__part_bucket=" in f for f in added)


def test_concurrent_spec_registration_conflicts_append(spark):
    """A spec registered between staging and publish fails the commit
    (the staged files were laid out under the wrong spec) instead of
    silently violating the layout contract."""
    t = SnapshotTable(spark, _tmp("pconc"))
    t.commit_append(_mod3(spark, 9).coalesce(1))
    orig = t._publish
    hit = {}

    def racy(*a, **kw):
        if not hit:
            hit["x"] = 1
            # another writer registers a spec first
            SnapshotTable(spark, t.root).set_partition_spec(["bucket"])
        return orig(*a, **kw)

    t._publish = racy
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        CommitConflict,
    )
    with pytest.raises(CommitConflict, match="partition spec"):
        t.commit_append(_mod3(spark, 9, start=100))


def test_connector_plans_prune_by_partition_path(spark):
    """Pushed equality filters prune spec'd files at PLANNING time from
    their __part_ path segments — zero file opens; segment-less files
    (pre-spec layout) are kept conservatively; the zero-null-match rule
    holds (a literal never matches a NULL partition)."""
    from s3_glue_redshift_guide_spark.sources.pyds import (
        SnapshotManifestReader,
    )
    from pyspark.sql.datasource import EqualTo

    t = SnapshotTable(spark, _tmp("pplan"))
    t.commit_append(_mod3(spark, 9, start=900).coalesce(1))  # pre-spec
    t.set_partition_spec(["bucket"])
    t.commit_append(_mod3(spark, 90))                        # 3 files
    r = SnapshotManifestReader({"root": t.root})
    assert len(r.partitions()) == 4
    r2 = SnapshotManifestReader({"root": t.root})
    leftover = list(r2.pushFilters([EqualTo(("bucket",), 1)]))
    assert len(leftover) == 1  # pruning-only: residual kept
    kept = r2.partitions()
    # bucket=1's file + the conservative pre-spec file; zone maps may
    # additionally prune the pre-spec file via banked stats, so assert
    # the spec'd mismatches are gone and bucket=1 survives
    paths = [p.path for p in kept]
    assert any("__part_bucket=1" in p for p in paths)
    assert not any(
        "__part_bucket=" in p and "__part_bucket=1" not in p
        for p in paths
    )
    # end-to-end through the registered format: exact rows
    register_snapshot_source(spark)
    got = (
        spark.read.format("pysnapshot").option("root", t.root).load()
        .filter("bucket = 1")
    )
    # 30 from the spec'd batch + 3 from the conservative pre-spec file
    assert got.count() == 33
    assert got.filter("bucket <> 1").count() == 0


def test_optimize_zorder_on_spec_table_keeps_curve_locality(spark):
    """OPTIMIZE ZORDER on a partition-spec'd table: the spec decides
    WHICH file a row lands in (one per partition value), and the Morton
    key rides as a write-time sort WITHIN each file — verified by
    recomputing the z key per output file and checking monotonicity."""
    from s3_glue_redshift_guide_spark.operators.zorder import (
        normalize_to_bits,
        z_value,
    )

    t = SnapshotTable(spark, _tmp("pzord"))
    t.set_partition_spec(["bucket"])
    # many small commits -> small files eligible for compaction
    for s in range(4):
        t.commit_append(_mod3(spark, 30, start=s * 1000))
    r = t.optimize_small_files(
        small_threshold=10**9, target_bytes=10**9, z_cols=("k", "v")
    )
    assert r["n_files_after"] < r["n_files_before"]
    m = load_manifest(t.root, t.current_version())
    # layout survived: every file carries its partition segment
    assert sorted(
        {t.partition_values(f).get("bucket") for f in m["files"]}
    ) == ["0", "1", "2"]
    lim = t.read().agg(
        F.min("k").cast("bigint"), F.max("k").cast("bigint"),
        F.min("v").cast("bigint"), F.max("v").cast("bigint"),
    ).collect()[0]
    zkey = z_value(
        normalize_to_bits(F.col("k"), F.lit(lim[0]), F.lit(lim[1])),
        normalize_to_bits(F.col("v"), F.lit(lim[2]), F.lit(lim[3])),
    )
    for f in m["files"]:
        zs = [
            r[0]
            for r in spark.read.parquet(f).select(zkey).collect()
        ]
        assert zs == sorted(zs), f"z order scrambled in {f}"
    # rows intact
    assert t.read().count() == 120


# ------------------------------------------------------------------ #
# 20. Row tracking (Delta row IDs)
# ------------------------------------------------------------------ #

def _ids(t, version=None):
    """{_row_id: k} mapping of the snapshot."""
    return {
        r["_row_id"]: r["k"]
        for r in t.read_with_row_ids(version).select("_row_id", "k").collect()
    }


def test_row_tracking_assigns_stable_unique_ids(spark):
    t = SnapshotTable(spark, _tmp("rid"))
    t.enable_row_tracking()
    t.commit_append(_kv(spark, 10).coalesce(1))
    t.commit_append(_kv(spark, 5, start=100).coalesce(1))
    m = _ids(t)
    assert len(m) == 15 and set(m) == set(range(15))
    # single-file commits in row order: ids are positional
    assert m[0] == 0 and m[9] == 9 and m[10] == 100 and m[14] == 104
    # __row_id never leaks into a plain read
    assert "__row_id" not in t.read().columns
    assert "_row_id" not in t.read().columns


def test_row_tracking_enable_on_existing_table(spark):
    t = SnapshotTable(spark, _tmp("ride"))
    t.commit_append(_kv(spark, 7).coalesce(1))
    t.enable_row_tracking()
    assert set(_ids(t)) == set(range(7))


def test_row_ids_preserved_through_optimize_and_materialize(spark):
    t = SnapshotTable(spark, _tmp("ridopt"))
    t.enable_row_tracking()
    for s in range(3):
        t.commit_append(_kv(spark, 10, start=s * 50).coalesce(1))
    before = _ids(t)
    t.delete_where(F.col("k") == 51)           # DV: ids of survivors keep
    t.optimize_small_files(10**9, 10**9)       # preserving rewrite
    after = _ids(t)
    gone = {i for i, k in before.items() if k == 51}
    assert after == {i: k for i, k in before.items() if i not in gone}
    # plain read still hides the physical column the rewrite wrote
    assert "__row_id" not in t.read().columns
    # and a DV + materialize on the ALREADY-rewritten layout preserves
    t.delete_where(F.col("k") == 52)
    t.materialize_deletes()
    final = _ids(t)
    assert final == {i: k for i, k in after.items() if k != 52}


def test_row_ids_fresh_after_optimize_never_collide(spark):
    t = SnapshotTable(spark, _tmp("ridwm"))
    t.enable_row_tracking()
    t.commit_append(_kv(spark, 10).coalesce(1))
    t.optimize_small_files(10**9, 10**9)
    t.commit_append(_kv(spark, 10, start=500).coalesce(1))
    m = _ids(t)
    assert len(m) == 20 and len(set(m)) == 20  # unique ids


def test_row_ids_preserved_through_update_where(spark):
    t = SnapshotTable(spark, _tmp("ridupd"))
    t.enable_row_tracking()
    t.commit_append(_kv(spark, 10).coalesce(1))
    before = _ids(t)
    rid5 = next(i for i, k in before.items() if k == 5)
    t.update_where(F.col("k") == 5, {"v": F.lit(999).cast("long")})
    got = {
        r["_row_id"]: (r["k"], r["v"])
        for r in t.read_with_row_ids().collect()
    }
    assert got[rid5] == (5, 999)           # same identity, new value
    assert len(got) == 10 and len(set(got)) == 10


def test_row_ids_survive_restore_clone_and_connector_writes(spark):
    t = SnapshotTable(spark, _tmp("ridrc"))
    t.enable_row_tracking()
    t.commit_append(_kv(spark, 10).coalesce(1))
    v_snap = t.current_version()
    snap = _ids(t)
    t.optimize_small_files(10**9, 10**9)
    t.commit_append(_kv(spark, 3, start=800).coalesce(1))
    t.restore(v_snap)
    assert _ids(t) == snap                  # restored files keep ids
    c = t.clone_shallow(_tmp("ridcl"))
    assert _ids(c) == snap                  # clone borrows ids
    # connector append participates: tracking carried, fresh ranges
    register_snapshot_source(spark)
    _kv(spark, 4, start=900).coalesce(1).write.format(
        "pysnapshot"
    ).option("root", t.root).mode("append").save()
    m = _ids(t)
    assert len(m) == 14 and len(set(m)) == 14
    assert snap.items() <= m.items()
    # the connector read surface never shows the physical id column
    conn = spark.read.format("pysnapshot").option("root", t.root).load()
    assert "__row_id" not in conn.columns and conn.count() == 14


def test_row_ids_preserved_through_merge_mor(spark):
    """MERGE INTO: updated rows keep their permanent ids, deleted rows'
    ids vanish, inserted rows draw fresh ids past the watermark."""
    t = SnapshotTable(spark, _tmp("ridmrg"))
    t.enable_row_tracking()
    t.commit_append(_kv(spark, 10).coalesce(1))
    before = _ids(t)
    src = spark.range(3).select(
        (F.col("id") + 4).alias("k"),          # keys 4,5,6 matched
        F.lit(-1).cast("long").alias("v"),
    ).union(
        spark.range(1).select(
            F.lit(700).alias("k"), F.lit(7).cast("long").alias("v")
        )                                       # unmatched: insert
    )
    t.merge_mor(
        src,
        on=["k"],
        when_matched_update={"v": F.col("__src_v")},
        when_matched_delete=F.col("k") == 6,
    )
    got = {
        r["_row_id"]: (r["k"], r["v"])
        for r in t.read_with_row_ids().collect()
    }
    assert len(got) == 10  # 10 - 1 deleted + 1 inserted
    for rid, k in before.items():
        if k == 6:
            assert rid not in got            # deleted id gone
        elif k in (4, 5):
            assert got[rid] == (k, -1)       # same identity, new value
        else:
            assert got[rid][0] == k          # untouched
    ins = [rid for rid, (k, _v) in got.items() if k == 700]
    assert len(ins) == 1 and ins[0] not in before


# ------------------------------------------------------------------ #
# 21. ANALYZE / NDV column statistics (HLL sketches per file)
# ------------------------------------------------------------------ #

def test_analyze_ndv_exact_at_small_cardinality(spark):
    t = SnapshotTable(spark, _tmp("ndv"))
    t.commit_append(_mod3(spark, 90))
    t.analyze_columns(["k", "bucket"])
    # HLL is exact in sparse mode at these cardinalities
    assert t.table_ndv("k") == 90
    assert t.table_ndv("bucket") == 3
    assert t.table_ndv("v") is None          # never analyzed


def test_analyze_is_incremental_and_refuses_uncovered(spark):
    t = SnapshotTable(spark, _tmp("ndvinc"))
    t.commit_append(_mod3(spark, 30).coalesce(1))
    t.analyze_columns(["k"])
    assert t.table_ndv("k") == 30
    t.commit_append(_mod3(spark, 30, start=100).coalesce(1))
    # new file uncovered: honest refusal, never an undercount
    assert t.table_ndv("k") is None
    t.analyze_columns(["k"])
    assert t.table_ndv("k") == 60
    m = load_manifest(t.root, t.current_version())
    assert len(m["ndv"]["sidecars"]) == 2    # second run: delta only
    # sketches survive vacuum while referenced
    t.vacuum(retain_versions=1)
    assert t.table_ndv("k") == 60
    ops = [r["operation"] for r in t.history().collect()]
    assert "ANALYZE" in ops


def test_estimate_equi_join_rows_from_metadata(spark):
    from s3_glue_redshift_guide_spark.operators.advisor import (
        estimate_equi_join_rows,
    )

    lt = SnapshotTable(spark, _tmp("ndvjl"))
    rt = SnapshotTable(spark, _tmp("ndvjr"))
    # left: 3 rows per key over 30 keys; right: the 30 keys, unique
    lt.commit_append(
        spark.range(90).select((F.col("id") % 30).alias("key"))
    )
    rt.commit_append(spark.range(30).select(F.col("id").alias("key")))
    adv = estimate_equi_join_rows(spark, lt.root, rt.root, "key")
    assert adv["estimated_rows"] is None     # un-analyzed: refuse
    lt.analyze_columns(["key"])
    rt.analyze_columns(["key"])
    adv = estimate_equi_join_rows(spark, lt.root, rt.root, "key")
    assert adv == {
        "left_rows": 90,
        "right_rows": 30,
        "left_ndv": 30,
        "right_ndv": 30,
        "estimated_rows": 90,                # |L|*|R|/max(ndv) exact here
    }


# ------------------------------------------------------------------ #
# 22. COPY INTO (idempotent file-level ingestion)
# ------------------------------------------------------------------ #

def test_copy_into_is_idempotent_per_source_file(spark, tmp_path):
    land = str(tmp_path / "landing")
    _kv(spark, 10).coalesce(1).write.parquet(land + "/a")
    _kv(spark, 5, start=100).coalesce(1).write.parquet(land + "/b")
    _kv(spark, 3, start=200).coalesce(1).write.parquet(land + "/c")
    import glob
    fa = sorted(glob.glob(land + "/a/*.parquet"))
    fb = sorted(glob.glob(land + "/b/*.parquet"))
    fc = sorted(glob.glob(land + "/c/*.parquet"))
    t = SnapshotTable(spark, _tmp("copy"))
    r1 = t.copy_into(fa + fb)
    assert (r1["n_ingested"], r1["n_skipped"]) == (2, 0)
    assert t.read().count() == 15
    # overlapping re-run: only the new file loads
    r2 = t.copy_into(fb + fc)
    assert (r2["n_ingested"], r2["n_skipped"]) == (1, 1)
    assert t.read().count() == 18
    # full replay: everything skipped, version unchanged
    v = t.current_version()
    r3 = t.copy_into(fa + fb + fc)
    assert (r3["n_ingested"], r3["n_skipped"]) == (0, 3)
    assert t.current_version() == v and t.read().count() == 18
    ops = [r["operation"] for r in t.history().collect()]
    assert ops.count("COPY INTO") == 2


def test_copy_into_composes_with_writer_contracts(spark, tmp_path):
    """The load flows through the normal append path: CHECK
    constraints veto bad sources, the partition spec clusters the
    ingested rows, and the ledger survives interleaved commits."""
    land = str(tmp_path / "landing2")
    _mod3(spark, 30).coalesce(1).write.parquet(land + "/good")
    spark.range(3).select(
        F.lit(-5).alias("k"), F.lit(0).alias("bucket"),
        F.lit(0).cast("long").alias("v"),
    ).coalesce(1).write.parquet(land + "/bad")
    import glob
    good = sorted(glob.glob(land + "/good/*.parquet"))
    bad = sorted(glob.glob(land + "/bad/*.parquet"))
    t = SnapshotTable(spark, _tmp("copyc"))
    t.set_partition_spec(["bucket"])
    t.copy_into(good)
    m = load_manifest(t.root, t.current_version())
    assert all("__part_bucket=" in f for f in m["files"])
    t.add_constraint("k_nonneg", "k >= 0")
    with pytest.raises(ValueError, match="constraint"):
        t.copy_into(bad)
    # the failed copy did NOT bank its sources: a fixed-up retry loads
    assert t.read().count() == 30
    # interleaved commit doesn't lose the ledger
    t.commit_append(_mod3(spark, 3, start=500))
    r = t.copy_into(good)
    assert (r["n_ingested"], r["n_skipped"]) == (0, 1)


# ------------------------------------------------------------------ #
# 23. Type widening (int -> bigint, float -> double; zero rewrites)
# ------------------------------------------------------------------ #

def _ints(spark, n, start=0, t="int"):
    return spark.range(start, start + n).select(
        F.col("id").cast(t).alias("k"),
        (F.col("id") * 2).cast(t).alias("v"),
    )


def test_widen_column_reads_mixed_width_files(spark):
    t = SnapshotTable(spark, _tmp("widen"))
    t.commit_append(_ints(spark, 10).coalesce(1))           # int32 files
    pre = t.current_version()
    files_before = set(load_manifest(t.root, pre)["files"])
    t.widen_column("k", "bigint")
    # metadata-only: zero files rewritten
    assert set(load_manifest(t.root, t.current_version())["files"]) == files_before
    t.commit_append(
        spark.range(100, 110).select(
            F.col("id").cast("bigint").alias("k"),   # int64 era
            (F.col("id") * 2).cast("int").alias("v"),
        ).coalesce(1)
    )
    got = t.read()
    assert dict(got.dtypes)["k"] == "bigint"
    assert dict(got.dtypes)["v"] == "int"                    # untouched col
    assert got.count() == 20
    assert got.agg(F.sum("k")).collect()[0][0] == 45 + sum(range(100, 110))
    # history labels the metadata commit
    ops = [r["operation"] for r in t.history().collect()]
    assert "WIDEN COLUMN" in ops


def test_widen_rejects_cross_family_and_narrowing(spark):
    t = SnapshotTable(spark, _tmp("widenv"))
    t.commit_append(
        spark.range(5).select(
            F.col("id").cast("long").alias("k"),
            F.col("id").cast("string").alias("s"),
        )
    )
    with pytest.raises(ValueError, match="family|widen"):
        t.widen_column("s", "bigint")        # string -> bigint: no
    with pytest.raises(ValueError, match="widen"):
        t.widen_column("k", "int")           # narrowing: no
    with pytest.raises(KeyError):
        t.widen_column("nope", "bigint")


def test_widen_composes_with_dv_update_optimize_and_connector(spark):
    t = SnapshotTable(spark, _tmp("widenc"))
    t.commit_append(_ints(spark, 10).coalesce(1))
    t.widen_column("k", "bigint")
    t.commit_append(_ints(spark, 10, start=100, t="bigint").coalesce(1))
    t.delete_where(F.col("k") == 3)
    t.update_where(F.col("k") == 105, {"v": F.lit(-1).cast("int")})
    assert t.read().count() == 19
    t.optimize_small_files(10**9, 10**9)
    got = t.read()
    assert got.count() == 19 and dict(got.dtypes)["k"] == "bigint"
    assert got.filter("k = 105").select("v").collect()[0][0] == -1
    # connector read surfaces the widened type and exact rows
    register_snapshot_source(spark)
    conn = spark.read.format("pysnapshot").option("root", t.root).load()
    assert dict(conn.dtypes)["k"] == "bigint"
    assert conn.count() == 19
    # connector write of a NEW column extends the banked reader schema
    spark.range(2).select(
        F.lit(900).cast("bigint").alias("k"),
        F.lit(0).cast("int").alias("v"),
        F.lit(7).cast("long").alias("extra"),
    ).write.format("pysnapshot").option("root", t.root).mode(
        "append"
    ).save()
    got = t.read()
    assert "extra" in got.columns and got.count() == 21
    assert got.filter("extra = 7").count() == 2


def test_widen_survives_clone_and_change_feed(spark):
    t = SnapshotTable(spark, _tmp("widencf"))
    t.commit_append(_ints(spark, 6).coalesce(1))
    t.widen_column("k", "bigint")
    t.commit_append(_ints(spark, 4, start=50, t="bigint").coalesce(1))
    c = t.clone_shallow(_tmp("widencl"))
    assert c.read().count() == 10
    assert dict(c.read().dtypes)["k"] == "bigint"
    ch = t.read_changes(1, t.current_version())
    assert ch.filter("_change_type = 'insert'").count() == 4


def test_protocol_reader3_for_widening_and_row_tracking(spark, monkeypatch):
    import s3_glue_redshift_guide_spark.sources.snapshots as snap

    t = SnapshotTable(spark, _tmp("proto3"))
    t.commit_append(_kv(spark, 5).coalesce(1))
    t.widen_column("k", "bigint")
    assert load_manifest(
        t.root, t.current_version()
    )["protocol"]["reader"] == 3
    t2 = SnapshotTable(spark, _tmp("proto3b"))
    t2.enable_row_tracking()
    t2.commit_append(_kv(spark, 5).coalesce(1))
    assert load_manifest(
        t2.root, t2.current_version()
    )["protocol"]["reader"] == 3
    # a reader that predates explicit-schema reads must refuse loudly
    monkeypatch.setattr(snap, "SUPPORTED_READER_VERSION", 2)
    with pytest.raises(snap.ProtocolError, match="reader version 3"):
        load_manifest(t.root, t.current_version())
