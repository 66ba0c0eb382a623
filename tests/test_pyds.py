"""Custom Python DataSource (Spark 4 API): registration, manifest-stats
partition pruning through pushFilters, per-file partitioning, version
time travel, and value fidelity through the Arrow read path."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

from s3_glue_redshift_guide_spark.catalog import load_table
from s3_glue_redshift_guide_spark.sources.pyds import (
    SnapshotManifestReader,
    register_snapshot_source,
)
from s3_glue_redshift_guide_spark.sources.snapshots import SnapshotTable

from .conftest import SF_SMOKE


def _table(spark):
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="pyds_t_"))
    for lo, hi in ((0, 199), (200, 399), (400, 599)):
        t.commit_append(
            o.filter(F.col("o_orderkey").between(lo, hi)).coalesce(1),
            stats_cols=["o_orderkey"],
        )
    return o, t


def test_read_parity_and_version_option(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    o, t = _table(spark)
    register_snapshot_source(spark)
    head = (
        spark.read.format("pysnapshot").option("root", t.root).load()
    )
    assert head.count() == o.filter(F.col("o_orderkey") < 600).count()
    # time travel through the connector: version 1 = first commit only
    v1 = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .option("version", "1")
        .load()
    )
    assert v1.count() == o.filter(F.col("o_orderkey") < 200).count()
    # value fidelity through the Arrow batch path
    a = sorted(r["o_totalprice"] for r in v1.collect())
    b = sorted(
        r["o_totalprice"]
        for r in o.filter(F.col("o_orderkey") < 200).collect()
    )
    assert a == b


def test_pushdown_prunes_partitions_reader_level(spark):
    _, t = _table(spark)
    r = SnapshotManifestReader({"root": t.root})
    assert len(r.partitions()) == 3  # no filters: every file a partition
    r2 = SnapshotManifestReader({"root": t.root})
    leftover = list(
        r2.pushFilters(
            [
                GreaterThanOrEqual(("o_orderkey",), 250),
                LessThan(("o_orderkey",), 321),
            ]
        )
    )
    # pruning-only pushdown: ALL filters returned for engine re-filtering
    assert len(leftover) == 2
    assert len(r2.partitions()) == 1
    r3 = SnapshotManifestReader({"root": t.root})
    r3.pushFilters([EqualTo(("o_orderkey",), 450)])
    assert len(r3.partitions()) == 1
    # a filter on an untracked column prunes nothing
    r4 = SnapshotManifestReader({"root": t.root})
    r4.pushFilters([EqualTo(("o_totalprice",), 1.0)])
    assert len(r4.partitions()) == 3


def test_caller_schema_reorder_maps_by_name(spark):
    _, t = _table(spark)
    register_snapshot_source(spark)
    df = (
        spark.read.format("pysnapshot")
        .schema("o_totalprice double, o_orderkey bigint")
        .option("root", t.root)
        .load()
    )
    r = df.orderBy("o_orderkey").first()
    assert r["o_orderkey"] < 10 and r["o_totalprice"] > 100


def test_connector_works_on_fresh_conf_and_surfaces_evolved_columns(spark):
    # register_snapshot_source must itself enable the python-filter-
    # pushdown conf (Spark refuses pushFilters readers without it), so a
    # vanilla session works; and additively-evolved columns must surface
    # through the connector exactly as SnapshotTable.read exposes them —
    # pre-evolution files yield typed NULLs, by-name mapping.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="pyds_evo_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 100).coalesce(1))
    t.commit_append(
        o.filter(F.col("o_orderkey").between(100, 199))
        .withColumn("flag", F.lit(7).cast("long"))
        .coalesce(1)
    )
    register_snapshot_source(spark)
    df = spark.read.format("pysnapshot").option("root", t.root).load()
    assert set(df.columns) == {"o_orderkey", "flag"}
    rows = {r["o_orderkey"]: r["flag"] for r in df.collect()}
    assert all(
        (f == 7 if k >= 100 else f is None) for k, f in rows.items()
    )


def test_connector_vacuumed_version_raises_log_truncated(spark):
    import pytest

    from s3_glue_redshift_guide_spark.sources.snapshots import LogTruncated

    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="pyds_vac_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 50).coalesce(1))
    t.commit_rewrite(t.read().coalesce(1))
    t.vacuum(retain_versions=1)
    register_snapshot_source(spark)
    with pytest.raises(Exception) as ei:
        (
            spark.read.format("pysnapshot")
            .option("root", t.root)
            .option("version", "1")
            .load()
            .count()
        )
    assert "retention window" in str(ei.value)
    # ...and the cursor-expired path on the table API is typed
    with pytest.raises(LogTruncated):
        t.changes_since(1)


def test_streaming_source_consumes_versions_exactly_once(spark, tmp_path):
    """pysnapshot as a Structured Streaming SOURCE: offsets are version
    numbers kept in the engine's checkpoint, so each commit's files are
    consumed exactly once across separate availableNow runs, and a run
    with nothing new emits nothing."""
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="pyds_strm_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 100).coalesce(1))
    register_snapshot_source(spark)

    out: list[int] = []

    def sink(df, _epoch):
        out.extend(r["o_orderkey"] for r in df.collect())

    def run():
        q = (
            spark.readStream.format("pysnapshot")
            .schema("o_orderkey bigint")
            .option("root", t.root)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    n1 = o.filter(F.col("o_orderkey") < 100).count()
    assert len(out) == n1
    run()  # caught up: nothing new, nothing re-emitted
    assert len(out) == n1
    # two commits between polls arrive in one run, still exactly once
    t.commit_append(
        o.filter(F.col("o_orderkey").between(100, 149)).coalesce(1)
    )
    t.commit_append(
        o.filter(F.col("o_orderkey").between(150, 199)).coalesce(1)
    )
    run()
    assert sorted(out) == sorted(
        r["o_orderkey"]
        for r in o.filter(F.col("o_orderkey") < 200).collect()
    )


def test_writer_atomic_commit_append_overwrite_and_stats(spark, tmp_path):
    """df.write.format("pysnapshot"): executor tasks write immutable
    parquet shards, the driver publishes ONE manifest over them (atomic
    all-or-nothing), append/overwrite map to the log's commit semantics,
    and zone-map stats are banked executor-side at write time so the
    read path prunes immediately."""
    root = str(tmp_path / "wtable")
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    register_snapshot_source(spark)
    (
        o.filter(F.col("o_orderkey") < 200)
        .repartition(3)
        .write.format("pysnapshot")
        .option("root", root)
        .option("statsCols", "o_orderkey")
        .mode("append")
        .save()
    )
    t = SnapshotTable(spark, root)
    assert t.current_version() == 1
    n1 = o.filter(F.col("o_orderkey") < 200).count()
    assert t.read().count() == n1
    # second append becomes version 2; both visible
    (
        o.filter(F.col("o_orderkey").between(200, 299))
        .coalesce(1)
        .write.format("pysnapshot")
        .option("root", root)
        .option("statsCols", "o_orderkey")
        .mode("append")
        .save()
    )
    assert t.current_version() == 2
    assert t.read().count() == o.filter(F.col("o_orderkey") < 300).count()
    # stats banked at write time -> manifest pruning works immediately
    kept, total = t.pruned_files("o_orderkey", 250, 260)
    assert total >= 4 and len(kept) == 1
    # round trip through the connector's own read path
    back = (
        spark.read.format("pysnapshot").option("root", root).load()
    )
    assert sorted(r["o_orderkey"] for r in back.collect()) == sorted(
        r["o_orderkey"]
        for r in o.filter(F.col("o_orderkey") < 300).collect()
    )
    # overwrite = rewrite commit: new version sees only the new rows,
    # the historical version remains readable
    (
        o.filter(F.col("o_orderkey") < 50)
        .coalesce(1)
        .write.format("pysnapshot")
        .option("root", root)
        .mode("overwrite")
        .save()
    )
    assert t.current_version() == 3
    assert t.read().count() == o.filter(F.col("o_orderkey") < 50).count()
    assert t.read(2).count() == o.filter(
        F.col("o_orderkey") < 300
    ).count()


def test_stream_writer_epoch_atomic_and_idempotent(spark, tmp_path):
    """writeStream.format("pysnapshot"): one atomic snapshot version per
    micro-batch; a replayed epoch (same batchId re-committed) is detected
    via the manifest's txn record and deduplicated instead of
    double-appending — Delta's txn protocol for exactly-once sinks."""
    from pyspark.sql.types import StructType

    from s3_glue_redshift_guide_spark.sources.pyds import (
        SnapshotCommitMessage,
        SnapshotStreamWriter,
    )

    root = str(tmp_path / "stbl")
    src = str(tmp_path / "in")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    register_snapshot_source(spark)

    # two micro-batches through the REAL engine: two files + per-file
    # trigger, availableNow drives both epochs in one run
    import os

    os.makedirs(src)
    o.filter(F.col("o_orderkey") < 100).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    o.filter(F.col("o_orderkey").between(100, 199)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = (
        spark.readStream.schema("o_orderkey bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("pysnapshot")
        .option("root", root)
        .option("statsCols", "o_orderkey")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = SnapshotTable(spark, root)
    head = t.current_version()
    assert head == 2  # one atomic version per epoch
    assert t.read().count() == o.filter(F.col("o_orderkey") < 200).count()

    # replayed epoch: same batchId commits again -> deduplicated no-op
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )

    txn = load_manifest(root, t.current_version()).get("txn", {})
    app = next(iter(txn))
    assert txn[app] == 1  # availableNow ran epochs 0 and 1
    w = SnapshotStreamWriter(
        {"root": root, "txnappid": app},
        StructType.fromDDL("o_orderkey bigint"),
        False,
    )
    dup = os.path.join(root, "data", "dupshard.parquet")
    o.filter(F.col("o_orderkey") < 10).coalesce(1).write.parquet(
        dup + ".d"
    )
    part = [
        os.path.join(dup + ".d", f)
        for f in os.listdir(dup + ".d")
        if f.endswith(".parquet")
    ][0]
    last_batch = 1  # availableNow ran epochs 0 and 1
    w.commit([SnapshotCommitMessage(path=part, stats={})], last_batch)
    assert t.current_version() == head  # no new version published
    assert not os.path.exists(part)  # duplicate shard reclaimed


def test_stream_writer_replay_survives_interleaved_commits(
    spark, tmp_path
):
    """The txn map must be carried forward through EVERY commit: an
    epoch replay is still detected after an unrelated batch append
    landed in between (the Delta txn invariant), and a DIFFERENT app's
    same-numbered epoch is NOT misclassified as a replay."""
    import os

    from pyspark.sql.types import StructType

    from s3_glue_redshift_guide_spark.sources.pyds import (
        SnapshotCommitMessage,
        SnapshotStreamWriter,
    )

    root = str(tmp_path / "itbl")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    ddl = StructType.fromDDL("o_orderkey bigint")

    def shard(tag, pred):
        d = str(tmp_path / tag)
        o.filter(pred).coalesce(1).write.parquet(d)
        p = [
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        ][0]
        return SnapshotCommitMessage(path=p, stats={})

    wa = SnapshotStreamWriter({"root": root, "txnappid": "appA"}, ddl, False)
    wa.commit([shard("e0", F.col("o_orderkey") < 50)], 0)
    t = SnapshotTable(spark, root)
    n_after_epoch0 = t.read().count()
    # unrelated batch commit interleaves
    t.commit_append(
        o.filter(F.col("o_orderkey").between(50, 99)).coalesce(1)
    )
    # appA's epoch 0 replays: must dedupe even though the latest
    # manifest is the batch commit's
    replay = shard("e0r", F.col("o_orderkey") < 50)
    head = t.current_version()
    wa2 = SnapshotStreamWriter({"root": root, "txnappid": "appA"}, ddl, False)
    wa2.commit([replay], 0)
    assert t.current_version() == head  # no new version
    assert not os.path.exists(replay.path)  # duplicate reclaimed
    # a DIFFERENT app's epoch 0 is a genuine commit, not a replay
    wb = SnapshotStreamWriter({"root": root, "txnappid": "appB"}, ddl, False)
    wb.commit([shard("b0", F.col("o_orderkey").between(100, 149))], 0)
    assert t.current_version() == head + 1
    assert t.read().count() == o.filter(F.col("o_orderkey") < 150).count()
    assert n_after_epoch0 == o.filter(F.col("o_orderkey") < 50).count()


def test_stream_reader_rejects_change_commits_unless_skipped(
    spark, tmp_path
):
    """A rewrite in the consumed range re-delivers carried-forward rows,
    so the stream must FAIL on it by default (Delta's behavior) and skip
    it cleanly under skipChangeCommits."""
    import pytest

    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="pyds_chg_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 100).coalesce(1))
    t.commit_rewrite(t.read().coalesce(1))  # change commit (v2)
    t.commit_append(
        o.filter(F.col("o_orderkey").between(100, 199)).coalesce(1)
    )
    register_snapshot_source(spark)

    def run(skip, tag):
        out = []

        def sink(df, _):
            out.extend(r["o_orderkey"] for r in df.collect())

        q = (
            spark.readStream.format("pysnapshot")
            .schema("o_orderkey bigint")
            .option("root", t.root)
            .option("skipChangeCommits", str(skip).lower())
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / tag))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return out

    with pytest.raises(Exception) as ei:
        run(False, "ck_fail")
    assert "change commit" in str(ei.value)
    got = run(True, "ck_skip")
    # v1's append emits f1 (before the rewrite), v2's change commit is
    # SKIPPED (its rewritten file — the same rows again — never emits),
    # v3's append emits: each row exactly once
    assert sorted(got) == sorted(
        r["o_orderkey"]
        for r in o.filter(F.col("o_orderkey") < 200).collect()
    )


def test_writer_empty_input_publishes_no_version(spark, tmp_path):
    root = str(tmp_path / "etbl")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    register_snapshot_source(spark)
    (
        o.filter(F.col("o_orderkey") < 0)  # empty
        .write.format("pysnapshot")
        .option("root", root)
        .mode("append")
        .save()
    )
    t = SnapshotTable(spark, root)
    assert t.current_version() == 0  # nothing published


def test_pushed_temporal_filters_prune_and_return_rows(spark, tmp_path):
    """ADVICE r4 (high): date/timestamp literals arrive as Python
    datetime objects while manifest stats are ISO strings — pushdown
    must normalize (not TypeError), prune correctly, and keep rows."""
    import datetime

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    t = SnapshotTable(spark, str(tmp_path / "dt_tbl"))
    t.commit_append(
        o.filter(F.col("o_orderdate") < "1998-01-01").coalesce(1),
        stats_cols=["o_orderdate", "o_orderkey"],
    )
    t.commit_append(
        o.filter(F.col("o_orderdate") >= "1998-01-01").coalesce(1),
        stats_cols=["o_orderdate", "o_orderkey"],
    )
    register_snapshot_source(spark)
    df = spark.read.format("pysnapshot").option("root", t.root).load()
    cut = datetime.date(1998, 1, 1)
    got = df.filter(F.col("o_orderdate") >= F.lit(cut)).count()
    want = o.filter(F.col("o_orderdate") >= "1998-01-01").count()
    assert got == want
    # reader-level: the datetime literal narrows to an ISO-string bound
    r = SnapshotManifestReader({"root": t.root})
    r.pushFilters([GreaterThanOrEqual(("o_orderdate",), cut)])
    assert r.bounds["o_orderdate"][0] == "1998-01-01"
    assert len(r.partitions()) == 1  # pre-1998 file pruned


def test_fully_pruned_filter_returns_zero_rows_not_crash(spark):
    """ADVICE r4 (high): zone pruning that eliminates EVERY file makes
    PySpark call read(None); that must be zero rows, not a crash."""
    _, t = _table(spark)
    register_snapshot_source(spark)
    df = spark.read.format("pysnapshot").option("root", t.root).load()
    assert df.filter(F.col("o_orderkey") > 10_000_000).count() == 0


def test_nested_and_array_filters_do_not_break_pruning(spark):
    """Nested attribute paths and non-scalar literals must not corrupt
    the pruning bounds (harvest only len==1 scalar filters)."""
    _, t = _table(spark)
    r = SnapshotManifestReader({"root": t.root})
    r.pushFilters(
        [
            EqualTo(("s", "b"), 5),          # nested path: ignored
            EqualTo(("o_orderkey",), [1, 2]),  # array literal: ignored
        ]
    )
    assert r.bounds == {}
    assert len(r.partitions()) == 3


def test_footer_stats_struct_leaf_does_not_shadow_toplevel(tmp_path):
    """ADVICE r4 (medium): a struct field s.b has leaf name 'b' — stats
    for top-level column 'b' must come from the top-level column, keyed
    by dotted path, never from the struct leaf."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s3_glue_redshift_guide_spark.sources.snapshots import (
        _footer_stats_one,
    )

    tbl = pa.table(
        {
            "b": pa.array([10, 20, 30], pa.int64()),
            "s": pa.array(
                [{"b": 900}, {"b": 901}, {"b": 902}],
                pa.struct([("b", pa.int64())]),
            ),
        }
    )
    p = str(tmp_path / "nested.parquet")
    pq.write_table(tbl, p)
    st = _footer_stats_one(p, ["b"])
    assert st["b"] == [10, 30]  # NOT [900, 902] from s.b
    # and the nested leaf is addressable only by its dotted path
    assert _footer_stats_one(p, ["s.b"])["s.b"] == [900, 902]


def test_connector_reads_type_widened_commits(spark, tmp_path):
    """ADVICE r4 (low): int32 files then int64 files in one table must
    unify permissively and cast per-file batches to the declared type."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s3_glue_redshift_guide_spark.sources.snapshots import (
        latest_version,
        publish_version,
    )

    root = str(tmp_path / "widen")
    ddir = tmp_path / "widen" / "data" / "d0"
    ddir.mkdir(parents=True)
    (tmp_path / "widen" / "_manifests").mkdir()
    p32 = str(ddir / "a32.parquet")
    p64 = str(ddir / "b64.parquet")
    pq.write_table(pa.table({"k": pa.array([1, 2], pa.int32())}), p32)
    pq.write_table(pa.table({"k": pa.array([3, 4], pa.int64())}), p64)
    publish_version(root, [p32], 0, {})
    publish_version(root, [p32, p64], latest_version(root), {})
    register_snapshot_source(spark)
    df = spark.read.format("pysnapshot").option("root", root).load()
    assert df.schema["k"].dataType.simpleString() == "bigint"
    assert sorted(r["k"] for r in df.collect()) == [1, 2, 3, 4]


def test_stream_empty_epoch_complete_mode_publishes_empty_snapshot(
    spark, tmp_path
):
    """ADVICE r4 (low): an empty complete-mode epoch must publish an
    EMPTY version (not leave the stale epoch visible) and still bank its
    (appId, batchId) txn entry."""
    from s3_glue_redshift_guide_spark.sources.pyds import (
        SnapshotStreamWriter,
    )
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )

    root = str(tmp_path / "cempty")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    register_snapshot_source(spark)
    o.limit(3).write.format("pysnapshot").option("root", root).mode(
        "overwrite"
    ).save()
    t = SnapshotTable(spark, root)
    assert t.read().count() == 3
    w = SnapshotStreamWriter(
        {"root": root, "txnappid": "appX"}, None, overwrite=True
    )
    w.commit([], batchId=7)  # empty recomputed epoch
    head = t.current_version()
    m = load_manifest(root, head)
    assert m["files"] == []
    assert m["txn"]["appX"] == 7
    # the empty snapshot stays READABLE: 0 rows, prior schema
    df = t.read()
    assert df.count() == 0 and "o_orderkey" in df.columns
    # connector read of the empty head also works (schema from history)
    c = spark.read.format("pysnapshot").option("root", root).load()
    assert c.count() == 0 and "o_orderkey" in c.columns
    # replay of the same epoch is still detected (no new version)
    w2 = SnapshotStreamWriter(
        {"root": root, "txnappid": "appX"}, None, overwrite=True
    )
    w2.commit([], batchId=7)
    assert t.current_version() == head


def test_connector_honors_deletion_vectors_and_renames(spark, tmp_path):
    """DV masking and field-id renames must surface IDENTICALLY through
    the registered format as through SnapshotTable.read."""
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, str(tmp_path / "dvtbl"))
    for lo, hi in ((0, 199), (200, 399)):
        t.commit_append(
            o.filter(F.col("o_orderkey").between(lo, hi)).coalesce(1),
            stats_cols=["o_orderkey"],
        )
    t.delete_where(F.col("o_orderkey") % 5 == 0)
    t.rename_column("o_totalprice", "price")
    t.commit_append(
        o.filter(F.col("o_orderkey").between(400, 449))
        .withColumnRenamed("o_totalprice", "price")
        .coalesce(1),
        stats_cols=["o_orderkey"],
    )
    register_snapshot_source(spark)
    via_fmt = (
        spark.read.format("pysnapshot").option("root", t.root).load()
    )
    assert via_fmt.columns == ["o_orderkey", "price"]
    a = sorted(
        (r["o_orderkey"], r["price"]) for r in via_fmt.collect()
    )
    b = sorted(
        (r["o_orderkey"], r["price"])
        for r in t.read().select("o_orderkey", "price").collect()
    )
    assert a == b and len(a) > 0
    # deleted keys are really gone through the connector
    assert (
        via_fmt.filter(
            (F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") < 400)
        ).count()
        == 0
    )
    # pruning on the RENAMED column still prunes pre-rename files
    r = SnapshotManifestReader({"root": t.root})
    r.pushFilters([LessThan(("o_orderkey",), 150)])
    assert len(r.partitions()) == 1


def test_stream_reader_flags_dv_commit_as_change(spark, tmp_path):
    from s3_glue_redshift_guide_spark.sources.pyds import (
        SnapshotStreamReader,
    )

    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    t = SnapshotTable(spark, str(tmp_path / "dvstream"))
    t.commit_append(o.filter(F.col("o_orderkey") < 100).coalesce(1))
    t.delete_where(F.col("o_orderkey") % 3 == 0)
    rd = SnapshotStreamReader({"root": t.root}, None, {})
    import pytest

    with pytest.raises(ValueError, match="change commit"):
        rd.partitions({"version": 1}, {"version": 2})
    rd2 = SnapshotStreamReader(
        {"root": t.root, "skipchangecommits": "true"}, None, {}
    )
    assert rd2.partitions({"version": 1}, {"version": 2}) == []


def test_pushdown_in_nullsafe_and_prefix_filters(spark, tmp_path):
    """IN narrows to the value hull, <=> to the point, and
    startswith(p) to [p, next-prefix) — all sound relaxations over the
    banked zone maps; and every filter is still returned for the
    engine's row-level residual."""
    from pyspark.sql.datasource import (
        EqualNullSafe,
        In,
        StringStartsWith,
    )

    from s3_glue_redshift_guide_spark.sources.pyds import _prefix_upper

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    t = SnapshotTable(spark, str(tmp_path / "pf"))
    for lo, hi in ((0, 199), (200, 399), (400, 599)):
        t.commit_append(
            o.filter(F.col("o_orderkey").between(lo, hi)).coalesce(1),
            stats_cols=["o_orderkey", "o_orderpriority"],
        )
    r = SnapshotManifestReader({"root": t.root})
    leftover = list(r.pushFilters([In(("o_orderkey",), (250, 260, 310))]))
    assert len(leftover) == 1  # residual kept
    assert len(r.partitions()) == 1  # hull [250, 310] hits one file
    r2 = SnapshotManifestReader({"root": t.root})
    r2.pushFilters([EqualNullSafe(("o_orderkey",), 450)])
    assert len(r2.partitions()) == 1
    # <=> NULL cannot narrow (no null counts banked): keep everything
    r3 = SnapshotManifestReader({"root": t.root})
    r3.pushFilters([EqualNullSafe(("o_orderkey",), None)])
    assert len(r3.partitions()) == 3
    # string prefix: priorities span '1-URGENT'..'5-LOW' in every file,
    # so prefix '9' prunes all and prefix '1' keeps all
    r4 = SnapshotManifestReader({"root": t.root})
    r4.pushFilters([StringStartsWith(("o_orderpriority",), "9")])
    assert len(r4.partitions()) == 0
    r5 = SnapshotManifestReader({"root": t.root})
    r5.pushFilters([StringStartsWith(("o_orderpriority",), "1-")])
    assert len(r5.partitions()) == 3
    # end-to-end: values survive the relaxed pruning exactly
    register_snapshot_source(spark)
    df = spark.read.format("pysnapshot").option("root", t.root).load()
    got = df.filter(F.col("o_orderkey").isin(250, 260, 5_000_000)).count()
    want = o.filter(F.col("o_orderkey").isin(250, 260)).count()
    assert got == want
    assert (
        df.filter(F.col("o_orderpriority").startswith("3")).count()
        == o.filter(
            (F.col("o_orderkey") < 600)
            & F.col("o_orderpriority").startswith("3")
        ).count()
    )
    # _prefix_upper edge cases
    assert _prefix_upper("abc") == "abd"
    assert _prefix_upper("a" + chr(0x10FFFF)) == "b"
    assert _prefix_upper(chr(0x10FFFF)) is None


def test_null_count_data_skipping(spark, tmp_path):
    """Banked null accounting (col#nulls = [null_count, num_rows]): an
    IS NULL filter skips files with zero nulls, IS NOT NULL skips
    all-null files, and rows survive end-to-end exactly."""
    from pyspark.sql.datasource import IsNotNull, IsNull

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, str(tmp_path / "nulls"))
    # file 1: no nulls; file 2: mixed; file 3: all-null prices
    t.commit_append(
        o.filter(F.col("o_orderkey") < 200).coalesce(1),
        stats_cols=["o_totalprice"],
    )
    t.commit_append(
        o.filter(F.col("o_orderkey").between(200, 399))
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 2 == 0, F.col("o_totalprice")),
        )
        .coalesce(1),
        stats_cols=["o_totalprice"],
    )
    t.commit_append(
        o.filter(F.col("o_orderkey").between(400, 599))
        .withColumn("o_totalprice", F.lit(None).cast("double"))
        .coalesce(1),
        stats_cols=["o_totalprice"],
    )
    r = SnapshotManifestReader({"root": t.root})
    r.pushFilters([IsNull(("o_totalprice",))])
    assert len(r.partitions()) == 2  # the no-null file is skipped
    r2 = SnapshotManifestReader({"root": t.root})
    r2.pushFilters([IsNotNull(("o_totalprice",))])
    assert len(r2.partitions()) == 2  # the all-null file is skipped
    register_snapshot_source(spark)
    df = spark.read.format("pysnapshot").option("root", t.root).load()
    assert df.filter(F.col("o_totalprice").isNull()).count() == 100 + 200
    assert df.filter(F.col("o_totalprice").isNotNull()).count() == 200 + 100


def test_change_feed_stream_emits_row_level_changes(spark, tmp_path):
    """readChangeFeed streaming: inserts from append commits, deletes
    from deletion-vector commits (sidecar-diff positions — per-file
    executor reads, no table diff), an UPDATE as its delete/insert
    pair, exactly once across availableNow runs."""
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, str(tmp_path / "cdfstream"))
    t.commit_append(o.filter(F.col("o_orderkey") < 100).coalesce(1))
    register_snapshot_source(spark)

    out: list[tuple] = []

    def sink(df, _epoch):
        out.extend(
            (r["o_orderkey"], r["_change_type"], r["_commit_version"])
            for r in df.collect()
        )

    def run():
        q = (
            spark.readStream.format("pysnapshot")
            .option("root", t.root)
            .option("readChangeFeed", "true")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "cdfck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert len(out) == 100
    assert {c for _, c, _v in out} == {"insert"}
    assert {v for *_, v in out} == {1}
    # a DV delete arrives as delete rows for exactly the matched keys
    t.delete_where(F.col("o_orderkey") % 10 == 0)
    run()
    deletes = [(k, v) for k, c, v in out if c == "delete"]
    assert sorted(k for k, _ in deletes) == list(range(0, 100, 10))
    assert {v for _, v in deletes} == {2}
    # an UPDATE surfaces as its delete/insert pair in one version
    n_before = len(out)
    t.update_where(
        F.col("o_orderkey") == 7,
        {"o_totalprice": F.col("o_totalprice") + F.lit(1.0)},
    )
    run()
    new = out[n_before:]
    assert sorted(c for _, c, _v in new) == ["delete", "insert"]
    assert {k for k, *_ in new} == {7}
    assert {v for *_, v in new} == {3}
    # caught up: nothing re-emitted
    n = len(out)
    run()
    assert len(out) == n
    # a rewrite commit fails the CDF stream unless explicitly skipped
    t.materialize_deletes()
    import pytest

    with pytest.raises(Exception, match="removes files"):
        run()
    out.clear()
    q = (
        spark.readStream.format("pysnapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cdfck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert out == []  # layout commit skipped, nothing re-delivered


def test_change_feed_stream_maps_renamed_columns(spark, tmp_path):
    """CDF streaming over a renamed table: pre-rename files' change rows
    must surface under the CURRENT logical name."""
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, str(tmp_path / "cdfren"))
    t.commit_append(o.filter(F.col("o_orderkey") < 50).coalesce(1))
    t.rename_column("o_totalprice", "price")
    t.delete_where(F.col("o_orderkey") % 7 == 0)
    register_snapshot_source(spark)
    rows: list[tuple] = []
    q = (
        spark.readStream.format("pysnapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(
            lambda df, _e: rows.extend(
                (r["o_orderkey"], r["price"], r["_change_type"])
                for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # 50 inserts (v1, pre-rename physical files) + 8 deletes (v3 dv)
    assert sum(1 for r in rows if r[2] == "insert") == 50
    dels = sorted(k for k, _p, c in rows if c == "delete")
    assert dels == list(range(0, 50, 7))
    # values mapped under the current name, never NULL-holed
    exp = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in o.filter(F.col("o_orderkey") < 50).collect()
    }
    assert all(p == exp[k] for k, p, c in rows)


def test_row_group_pruning_and_dv_offsets(spark, tmp_path):
    """The second skipping tier: pushed bounds prune ROW GROUPS inside a
    file (zone maps prune files), and deletion-vector positions stay
    FILE-absolute — skipping earlier groups must not shift the masks of
    later ones."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s3_glue_redshift_guide_spark.sources.pyds import (
        _read_file,
        _row_group_selection,
    )
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        publish_version,
        _footer_stats_one,
    )

    root = str(tmp_path / "rg")
    ddir = tmp_path / "rg" / "data" / "d0"
    ddir.mkdir(parents=True)
    (tmp_path / "rg" / "_manifests").mkdir()
    p = str(ddir / "wide.parquet")
    # 1000 rows of k=0..999 in 10 row groups of 100
    pq.write_table(
        pa.table({"k": pa.array(range(1000), pa.int64())}),
        p,
        row_group_size=100,
    )
    md = pq.ParquetFile(p).metadata
    assert md.num_row_groups == 10
    # selection: k in [250, 260] touches exactly one group
    sel = _row_group_selection(md, {"k": (250, 260)}, {"k": "k"})
    assert sel == [2]
    # unbounded side + absent column stay conservative
    assert _row_group_selection(md, {"z": (0, 1)}, {"z": None}) == list(
        range(10)
    )
    # end-to-end through the reader with a dv masking rows 255 and 700:
    # group pruning must not shift the absolute positions
    dvdir = tmp_path / "rg" / "deletes" / "x"
    dvdir.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "__dv_file": pa.array([p, p]),
                "__dv_pos": pa.array([255, 700], pa.int64()),
            }
        ),
        str(dvdir / "dv.parquet"),
    )
    publish_version(
        root, [p], 0, {p: _footer_stats_one(p, ["k"])},
        extra={"dv": {p: [str(dvdir)]}},
    )
    got = [
        v
        for b in _read_file(
            p, ["k"], {}, dv_dirs=(str(dvdir),),
            bounds={"k": (250, 260)},
        )
        for v in b.column(0).to_pylist()
    ]
    # only group 2 (rows 200-299) was read, minus absolute position 255
    assert got == [k for k in range(200, 300) if k != 255]
    register_snapshot_source(spark)
    df = spark.read.format("pysnapshot").option("root", root).load()
    assert df.count() == 998  # both tombstones masked
    assert df.filter(F.col("k").between(250, 260)).count() == 10  # 255 gone
    assert df.filter(F.col("k").between(690, 710)).count() == 20  # 700 gone


def test_change_feed_batch_read_version_range(spark, tmp_path):
    """Batch CDF: option(readChangeFeed) + startingVersion/endingVersion
    reads one bounded slice of history as _change_type rows."""
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, str(tmp_path / "cdfbatch"))
    t.commit_append(o.filter(F.col("o_orderkey") < 100).coalesce(1))  # v1
    t.commit_append(
        o.filter(F.col("o_orderkey").between(100, 149)).coalesce(1)
    )  # v2
    t.delete_where(F.col("o_orderkey") % 25 == 0)  # v3: 6 tombstones
    register_snapshot_source(spark)
    full = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .load()
    )
    assert full.count() == 150 + 6
    assert (
        full.filter(F.col("_change_type") == "delete").count() == 6
    )
    # bounded slice: only v2..v3
    part = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load()
    )
    assert part.filter(F.col("_change_type") == "insert").count() == 50
    assert part.filter(F.col("_change_type") == "delete").count() == 6
    assert set(
        r["_commit_version"]
        for r in part.select("_commit_version").distinct().collect()
    ) == {2, 3}
    only_v2 = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("endingVersion", "2")
        .load()
    )
    assert only_v2.count() == 50
