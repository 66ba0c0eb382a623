"""Manifest-log checkpointing: O(1) head resolution via the
_last_checkpoint pointer, checkpoint-fed history()/version_as_of, vacuum
consistency, and graceful degradation when the cache is corrupt."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources import snapshots as snap_mod
from s3_glue_redshift_guide_spark.sources.snapshots import (
    CHECKPOINT_INTERVAL,
    LOG_METRICS,
    SnapshotTable,
    LogTruncated,
    load_checkpoint,
    load_manifest,
    version_as_of,
)


def _tmp(pfx):
    return tempfile.mkdtemp(prefix=f"ckpt_{pfx}_")


def _reset_metrics():
    for k in LOG_METRICS:
        LOG_METRICS[k] = 0


def _mk_table(spark, n_commits: int, pfx="t") -> SnapshotTable:
    ticks = iter(float(i) for i in range(1, n_commits + 10))
    t = SnapshotTable(spark, _tmp(pfx), clock=lambda: next(ticks))
    for i in range(n_commits):
        t.commit_append(
            spark.range(i * 10, i * 10 + 10).select(
                F.col("id").alias("k")
            ).coalesce(1)
        )
    return t


def test_checkpoint_written_every_interval(spark):
    t = _mk_table(spark, 25)
    ck = load_checkpoint(t.root)
    assert ck is not None
    assert ck["version"] == 20  # newest multiple of the interval
    assert ck["state"]["version"] == 20
    assert [r[0] for r in ck["history"]] == list(range(1, 21))
    # superseded checkpoint reclaimed
    assert not os.path.exists(
        os.path.join(t.root, "_manifests", "ckpt_v10.json")
    )


def test_head_resolution_uses_pointer_not_listing(spark):
    t = _mk_table(spark, 25)
    _reset_metrics()
    assert t.current_version() == 25
    assert LOG_METRICS["listdir_scans"] == 0
    assert LOG_METRICS["manifest_reads"] == 0


def test_history_reads_tail_only_and_matches_full_walk(spark):
    t = _mk_table(spark, 25)
    _reset_metrics()
    with_ck = [tuple(r) for r in t.history().collect()]
    reads_with = LOG_METRICS["manifest_reads"]
    assert LOG_METRICS["checkpoint_reads"] == 1
    # tail = versions 21..25 → 5 manifest reads, never 25
    assert reads_with <= 25 - CHECKPOINT_INTERVAL
    # the checkpoint-fed rows must equal the raw walk bit-for-bit
    ptr = os.path.join(t.root, "_manifests", "_last_checkpoint.json")
    os.unlink(ptr)
    _reset_metrics()
    without_ck = [tuple(r) for r in t.history().collect()]
    assert LOG_METRICS["manifest_reads"] >= 25
    assert with_ck == without_ck


def test_version_as_of_uses_checkpoint_index(spark):
    t = _mk_table(spark, 25)  # commit v ticks ts=v
    _reset_metrics()
    assert version_as_of(t.root, 7.5) == 7
    assert version_as_of(t.root, 20.0) == 20
    # both answered inside the checkpoint: only tail manifests read
    assert LOG_METRICS["manifest_reads"] <= 2 * (25 - 20)
    assert version_as_of(t.root, 23.2) == 23


def test_vacuum_rebuilds_checkpoint_consistently(spark):
    t = _mk_table(spark, 25)
    t.vacuum(retain_versions=3)
    ck = load_checkpoint(t.root)
    assert ck is not None and ck["version"] == 25
    hist_vs = [r[0] for r in ck["history"]]
    assert hist_vs == [23, 24, 25], "vacuumed versions resurrected"
    # first surviving row re-bases its diff on an empty prior set
    assert ck["history"][0][4] == ck["history"][0][3]  # n_added == n_files
    rows = t.history().collect()
    assert [r["version"] for r in rows] == [25, 24, 23]
    # reads still correct and version_as_of refuses pre-horizon ts
    assert t.read().count() == 250
    try:
        version_as_of(t.root, 1.0)
        assert False, "expected pre-horizon resolution to raise"
    except ValueError:
        pass


def test_corrupt_pointer_and_checkpoint_degrade_gracefully(spark):
    t = _mk_table(spark, 12)
    ptr = os.path.join(t.root, "_manifests", "_last_checkpoint.json")
    with open(ptr, "w") as f:
        f.write("{not json")
    assert t.current_version() == 12  # listing fallback
    assert len(t.history().collect()) == 12
    # pointer naming a garbage checkpoint file
    with open(ptr, "w") as f:
        json.dump({"head": 12, "checkpoint": 10}, f)
    with open(
        os.path.join(t.root, "_manifests", "ckpt_v10.json"), "w"
    ) as f:
        f.write("][")
    assert len(t.history().collect()) == 12
    assert t.read().count() == 120


def test_stale_pointer_probes_forward(spark):
    t = _mk_table(spark, 15)
    ptr = os.path.join(t.root, "_manifests", "_last_checkpoint.json")
    with open(ptr, "w") as f:
        json.dump({"head": 11, "checkpoint": 10}, f)  # 4 commits stale
    _reset_metrics()
    assert t.current_version() == 15
    assert LOG_METRICS["listdir_scans"] == 0


def test_checkpoint_survives_tagged_pin_below_window(spark):
    t = _mk_table(spark, 25)
    t.create_tag("audit", 5)
    t.vacuum(retain_versions=2)
    vs = [r["version"] for r in t.history().collect()]
    assert vs == [25, 24, 5]
    # the pinned row diffs against an empty prior set; the row after
    # the gap diffs against the PINNED version (the readable chain)
    ck = load_checkpoint(t.root)
    by_v = {r[0]: r for r in ck["history"]}
    assert by_v[5][4] == by_v[5][3]
    assert by_v[24][4] == by_v[24][3] - by_v[5][3]
    assert t.read(5).count() == 50


def test_time_travel_reads_unchanged_under_checkpoints(spark):
    t = _mk_table(spark, 25)
    assert t.read(7).count() == 70
    assert t.read(20).count() == 200
    m = load_manifest(t.root, 13)
    assert len(m["files"]) == 13


def test_checkpoint_history_cap_keeps_size_flat(spark):
    """CHECKPOINT_HISTORY_WINDOW bounds the banked history index: at a
    minutely-committing table the pre-cap checkpoint grew without
    bound; capped, consecutive checkpoints bank the same number of
    rows and deep history/AS-OF degrade to the manifest walk — never
    wrong answers."""
    from s3_glue_redshift_guide_spark.sources import (
        snapshots as snap,
    )

    ticks = iter(float(i) for i in range(1, 40))
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="ckptcap_"),
        clock=lambda: next(ticks),
    )
    prev = snap.CHECKPOINT_HISTORY_WINDOW
    snap.CHECKPOINT_HISTORY_WINDOW = 5
    try:
        df = spark.range(3).select(F.col("id").alias("k"))
        for _ in range(10):
            t.commit_append(df)
        ck10 = snap.load_checkpoint(t.root)
        for _ in range(13):
            t.commit_append(df)
        ck20 = snap.load_checkpoint(t.root)
    finally:
        snap.CHECKPOINT_HISTORY_WINDOW = prev
    # 2x the commits, identical index size: flat in the version axis
    assert len(ck10["history"]) == len(ck20["history"]) == 5
    assert ck10["history_floor"] == 6
    assert ck20["history_floor"] == 16
    # history below the floor: manifest walk, identical to a raw walk
    rows = [tuple(r) for r in t.history().collect()]
    assert len(rows) == 23
    import os as _os

    _os.unlink(
        _os.path.join(t.root, "_manifests", "_last_checkpoint.json")
    )
    assert [tuple(r) for r in t.history().collect()] == rows


def test_multipart_parquet_state(spark):
    """The checkpoint's state axis is multi-part PARQUET, not inline
    JSON: with the part size forced to 3 rows a 20-commit table's
    checkpoint splits its live-file set across ceil(n_files/3) parts,
    load_checkpoint reassembles a state identical to the head manifest
    (files, stats, dv), and the JSON blob itself holds no per-file
    data — its size is flat in the file axis."""
    prev = snap_mod.CHECKPOINT_STATE_PART_ROWS
    snap_mod.CHECKPOINT_STATE_PART_ROWS = 3
    try:
        t = _mk_table(spark, 20, pfx="parts")
        t.delete_where(F.col("k") == 5)  # a DV so the dv axis is live
        snap_mod.write_checkpoint(t.root, t.current_version())
    finally:
        snap_mod.CHECKPOINT_STATE_PART_ROWS = prev
    ck = load_checkpoint(t.root)
    head = load_manifest(t.root, t.current_version())
    assert ck["state"]["files"] == head["files"]
    assert ck["state"]["stats"] == head["stats"]
    assert {k: v for k, v in ck["state"]["dv"].items() if v} == {
        k: v for k, v in head["dv"].items() if v
    }
    # multiple parts on disk, reads counted, JSON free of file lists
    parts = ck["state_parts"]
    assert len(parts) >= 2
    with open(
        os.path.join(t.root, "_manifests", f"ckpt_v{ck['version']}.json")
    ) as f:
        raw = json.load(f)
    assert "state" not in raw and raw["state_rows"] == len(head["files"])
    _reset_metrics()
    assert load_checkpoint(t.root)["state"]["files"] == head["files"]
    assert LOG_METRICS["checkpoint_part_reads"] == len(parts)


def test_multipart_state_degrades_on_missing_part(spark):
    """A missing/corrupt part file degrades load_checkpoint to None —
    readers fall back to the manifest walk, never a torn state."""
    prev = snap_mod.CHECKPOINT_STATE_PART_ROWS
    snap_mod.CHECKPOINT_STATE_PART_ROWS = 3
    try:
        t = _mk_table(spark, 20, pfx="degrade")
        snap_mod.write_checkpoint(t.root, t.current_version())
    finally:
        snap_mod.CHECKPOINT_STATE_PART_ROWS = prev
    ck = load_checkpoint(t.root)
    victim = os.path.join(t.root, "_manifests", ck["state_parts"][-1])
    os.unlink(victim)
    assert load_checkpoint(t.root) is None
    # the cache being gone costs a walk, not correctness
    assert t.read().count() == 200


def test_superseded_state_parts_reclaimed(spark):
    """A newer checkpoint reclaims the older checkpoint's part files
    along with its JSON."""
    prev = snap_mod.CHECKPOINT_STATE_PART_ROWS
    snap_mod.CHECKPOINT_STATE_PART_ROWS = 3
    try:
        t = _mk_table(spark, 25, pfx="reclaim")
    finally:
        snap_mod.CHECKPOINT_STATE_PART_ROWS = prev
    mdir = os.path.join(t.root, "_manifests")
    leftovers = [
        fn for fn in os.listdir(mdir)
        if fn.startswith("ckpt_v10.")
    ]
    assert leftovers == []
    assert load_checkpoint(t.root)["version"] == 20


def test_multipart_state_carries_all_per_file_axes(spark):
    """sizes / row_ids / blooms are per-file-scale too — they ride the
    parquet parts, not the JSON, and reassemble bit-identically."""
    prev = snap_mod.CHECKPOINT_STATE_PART_ROWS
    snap_mod.CHECKPOINT_STATE_PART_ROWS = 3
    try:
        t = _mk_table(spark, 12, pfx="axes")
        t.enable_row_tracking() if hasattr(
            t, "enable_row_tracking"
        ) else None
        snap_mod.write_checkpoint(t.root, t.current_version())
    finally:
        snap_mod.CHECKPOINT_STATE_PART_ROWS = prev
    ck = load_checkpoint(t.root)
    head = load_manifest(t.root, t.current_version())
    assert ck["state"].get("sizes") == head.get("sizes")
    assert ck["state"].get("row_ids") == head.get("row_ids")
    assert ck["state"].get("blooms") == head.get("blooms")
    with open(
        os.path.join(t.root, "_manifests", f"ckpt_v{ck['version']}.json")
    ) as f:
        raw = json.load(f)
    for axis in ("sizes", "row_ids", "blooms"):
        assert axis not in (raw.get("state_meta") or {})
