"""Hidden partitioning (S61): day/month/trunc/bucket transforms on the
partition spec — layout, literal push-through pruning, superset
correctness under spec evolution, guards, and connector posture."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import (
    SnapshotTable,
    parse_spec_entry,
    spec_source_columns,
)


def _frame(spark, n=80):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (
            F.lit("2022-06-01").cast("timestamp_ntz")
            + F.make_interval(
                F.lit(0), F.lit(0), F.lit(0),
                F.floor(F.col("id") / 10).cast("int"),
            )
        ).alias("ts"),
        (F.col("id") % 5).alias("grp"),
    )


def _table(spark, spec):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="hpart_"))
    if spec:
        t.set_partition_spec(spec)
    return t


def test_parse_spec_entries():
    assert parse_spec_entry("ts") == {
        "fn": "identity", "col": "ts", "n": None, "name": "ts"
    }
    assert parse_spec_entry("day(ts)")["name"] == "day_ts"
    assert parse_spec_entry("bucket(k, 16)") == {
        "fn": "bucket", "col": "k", "n": 16, "name": "bucket_k_16"
    }
    assert spec_source_columns(["day(ts)", "bucket(k, 4)", "grp"]) == [
        "ts", "k", "grp"
    ]
    with pytest.raises(ValueError, match="positive integer"):
        parse_spec_entry("trunc(k)")
    with pytest.raises(ValueError, match="takes no arg"):
        parse_spec_entry("day(ts, 3)")


def test_day_layout_and_prune(spark):
    t = _table(spark, ["day(ts)"])
    t.commit_append(_frame(spark))
    files = [r["path"] for r in t.files().collect()]
    assert all("__part_day_ts=" in p for p in files)
    lit = dt.datetime(2022, 6, 3)
    pruned = t.partition_pruned_files({"ts": lit})
    assert 0 < len(pruned) < len(files)
    got = t.read_partition({"ts": lit}).filter(F.col("ts") == lit)
    want = t.read().filter(F.col("ts") == F.lit(lit))
    assert got.count() == want.count() > 0


def test_bucket_prune_hash_parity(spark):
    t = _table(spark, ["bucket(k, 4)"])
    t.commit_append(_frame(spark))
    n_files = t.file_count()
    for probe in (0, 17, 63):
        pruned = t.partition_pruned_files({"k": probe})
        assert 0 < len(pruned) < n_files
        got = (
            t.read_partition({"k": probe})
            .filter(F.col("k") == probe)
            .count()
        )
        assert got == 1  # every k exists exactly once


def test_trunc_prune(spark):
    t = _table(spark, ["trunc(k, 20)"])
    t.commit_append(_frame(spark))
    assert t.file_count() == 4  # 80 ids / width 20
    pruned = t.partition_pruned_files({"k": 45})
    assert len(pruned) == 1
    assert "__part_trunc_k_20=40" in pruned[0]


def test_type_validation(spark):
    t = _table(spark, None)
    t.commit_append(_frame(spark))
    with pytest.raises(ValueError, match="unsupported for transform"):
        t.set_partition_spec(["day(k)"])  # day over bigint
    with pytest.raises(ValueError, match="unsupported for transform"):
        t.set_partition_spec(["trunc(ts, 5)"])  # trunc over timestamp
    with pytest.raises(KeyError):
        t.set_partition_spec(["day(nope)"])


def test_rename_guard_covers_transform_source(spark):
    t = _table(spark, ["day(ts)"])
    t.commit_append(_frame(spark))
    with pytest.raises(ValueError, match="partition-spec"):
        t.rename_column("ts", "event_ts")


def test_spec_evolution_keeps_old_files_conservatively(spark):
    t = _table(spark, ["day(ts)"])
    t.commit_append(_frame(spark, 40))
    t.set_partition_spec(["month(ts)"])
    t.commit_append(_frame(spark, 40))
    lit = dt.datetime(2022, 6, 2)
    pruned = t.partition_pruned_files({"ts": lit})
    # old day-layout files prune by day; month-layout files all match
    # June, so they are kept — and no row is ever lost
    got = t.read_partition({"ts": lit}).filter(F.col("ts") == lit)
    want = t.read().filter(F.col("ts") == F.lit(lit))
    assert got.count() == want.count() > 0
    assert len(pruned) < t.file_count()


def test_connector_write_lands_transform_layout(spark):
    """Connector writes onto TRANSFORM-spec'd tables derive the same
    partition values the engine would (Murmur3 twin for bucket,
    naive-UTC strftime for day) — the engine's pruning and the
    connector's own planning prune connector-written files alike."""
    from s3_glue_redshift_guide_spark.sources.pyds import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    t = _table(spark, ["day(ts)", "bucket(k, 4)"])
    t.commit_append(_frame(spark, 30))
    back = (
        spark.read.format("pysnapshot").option("root", t.root).load()
    )
    assert back.count() == 30  # transformed layout reads fine
    (
        _frame(spark, 30)
        .withColumn("k", F.col("k") + 100)
        .write.format("pysnapshot")
        .option("root", t.root)
        .mode("append")
        .save()
    )
    assert t.read().count() == 60
    newest = [
        r["path"]
        for r in t.files().collect()
        if "__part_day_ts=" in r["path"]
        and "__part_bucket_k_4=" in r["path"]
    ]
    assert len(newest) == t.file_count()  # every file spec-compliant
    # engine-side pruning agrees with the connector-derived layout:
    # probing a connector-written key keeps exactly the files whose
    # bucket segment matches the Spark-side hash of that key
    probe = 105  # written only by the connector
    pruned = t.partition_pruned_files({"k": probe})
    assert 0 < len(pruned) < t.file_count()
    got = (
        t.read_partition({"k": probe})
        .filter(F.col("k") == probe)
        .count()
    )
    assert got == 1
    # spark-side hash parity: the bucket Spark computes for the probe
    # appears verbatim in every surviving file's path
    bucket = spark.range(1).select(
        F.pmod(F.hash(F.lit(probe).cast("bigint")), F.lit(4))
    ).collect()[0][0]
    assert all(f"__part_bucket_k_4={bucket}" in p for p in pruned)


def test_clone_carries_transform_spec(spark):
    t = _table(spark, ["bucket(k, 4)"])
    t.commit_append(_frame(spark, 20))
    c = t.clone_shallow(tempfile.mkdtemp(prefix="hpart_clone_"))
    c.commit_append(_frame(spark, 20))
    newest = sorted(
        (r["path"] for r in c.files().collect()),
        key=lambda p: "bucket_k_4" not in p,
    )[0]
    assert "__part_bucket_k_4=" in newest


def test_optimize_preserves_transform_layout(spark):
    t = _table(spark, ["day(ts)"])
    for i in range(3):  # three small commits fragment each day
        t.commit_append(_frame(spark, 40))
    before = t.read().groupBy("ts").count().collect()
    t.optimize_small_files(small_threshold=1 << 30, target_bytes=1 << 30)
    files = [r["path"] for r in t.files().collect()]
    assert files and all("__part_day_ts=" in p for p in files)
    after = t.read().groupBy("ts").count().collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    # pruning still bites on the compacted layout
    lit = dt.datetime(2022, 6, 2)
    assert 0 < len(t.partition_pruned_files({"ts": lit})) < len(files)


def test_delete_and_merge_compose_with_transforms(spark):
    t = _table(spark, ["bucket(k, 4)"])
    t.commit_append(_frame(spark, 40))
    t.delete_where(F.col("k") % 5 == 0)
    assert t.read().filter(F.col("k") % 5 == 0).count() == 0
    src = spark.range(35, 45).select(
        F.col("id").alias("k"),
        F.lit("2022-07-01").cast("timestamp_ntz").alias("ts"),
        F.lit(9).cast("long").alias("grp"),
    )
    t.merge_mor(
        src.select("k", "ts", "grp"),
        on=["k"],
        when_matched_update={"grp": F.lit(7).cast("long")},
    )
    assert t.read().filter(F.col("k") == 44).count() == 1  # inserted
    assert (
        t.read().filter((F.col("k") == 38) & (F.col("grp") == 7)).count()
        == 1
    )  # updated in place through the MOR path


def test_connector_planning_prunes_day_and_trunc(spark):
    from pyspark.sql.datasource import EqualTo

    from s3_glue_redshift_guide_spark.sources.pyds import (
        SnapshotManifestReader,
    )

    t = _table(spark, ["day(ts)"])
    t.commit_append(_frame(spark, 80))  # 8 day partitions
    r = SnapshotManifestReader({"root": t.root})
    n_all = len(r.partitions())
    r2 = SnapshotManifestReader({"root": t.root})
    r2.pushFilters([EqualTo(("ts",), dt.datetime(2022, 6, 3))])
    assert 0 < len(r2.partitions()) < n_all  # day(ts) pruned in planning
    # trunc transform prunes via pure-Python floor division
    t2 = _table(spark, ["trunc(k, 20)"])
    t2.commit_append(_frame(spark, 80))
    r3 = SnapshotManifestReader({"root": t2.root})
    r3.pushFilters([EqualTo(("k",), 45)])
    parts = r3.partitions()
    assert len(parts) == 1
    # bucket prunes when the reader knows the column width (the
    # real engine path passes types); an untyped hand reader stays
    # conservative
    import pyarrow as pa

    t3 = _table(spark, ["bucket(k, 4)"])
    t3.commit_append(_frame(spark, 80))
    r4 = SnapshotManifestReader({"root": t3.root})
    r4.pushFilters([EqualTo(("k",), 45)])
    assert len(r4.partitions()) == t3.file_count()  # no dtype: keep
    r5 = SnapshotManifestReader(
        {"root": t3.root}, types={"k": pa.int64()}
    )
    r5.pushFilters([EqualTo(("k",), 45)])
    assert 0 < len(r5.partitions()) < t3.file_count()
    # and correctness through the full read path with a filter
    from s3_glue_redshift_guide_spark.sources.pyds import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    got = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .load()
        .filter(F.col("ts") == F.lit(dt.datetime(2022, 6, 3)))
        .count()
    )
    assert got == 10


def test_murmur3_twin_matches_spark_hash(spark):
    """The pure-Python Murmur3 twin must match F.hash bit-for-bit for
    every type the bucket transform admits — a drift here would make
    the connector derive different buckets than the engine."""
    import random

    from s3_glue_redshift_guide_spark.sources.pyds import (
        spark_murmur3,
        spark_murmur3_long,
    )

    random.seed(11)
    longs = [0, 1, -1, 2**33, -(2**33), 2**62, -(2**62)] + [
        random.randint(-(2**63), 2**63 - 1) for _ in range(40)
    ]
    df = spark.createDataFrame([(v,) for v in longs], "v long")
    for r in df.select("v", F.hash("v").alias("h")).collect():
        assert spark_murmur3_long(r["v"]) == r["h"]
    ints = [0, 1, -1, 2**31 - 1, -(2**31)] + [
        random.randint(-(2**31), 2**31 - 1) for _ in range(40)
    ]
    df = spark.createDataFrame([(v,) for v in ints], "v int")
    for r in df.select("v", F.hash("v").alias("h")).collect():
        assert spark_murmur3(int(r["v"])) == r["h"]
    strs = ["", "a", "ab", "abc", "abcd", "naïve", "日本語", "x" * 37] + [
        "".join(chr(random.randint(32, 900)) for _ in range(random.randint(0, 12)))
        for _ in range(30)
    ]
    df = spark.createDataFrame([(v,) for v in strs], "v string")
    for r in df.select("v", F.hash("v").alias("h")).collect():
        assert spark_murmur3(r["v"]) == r["h"]


# ------------------------------------------------- range pruning ----
def test_range_prune_day_span(spark):
    """ts BETWEEN a AND b on a day-partitioned table touches exactly
    the day span's files at the manifest walk — zone maps not needed
    (day/month/trunc are monotone: Iceberg's inclusive projection)."""
    t = _table(spark, ["day(ts)"])
    t.commit_append(_frame(spark, 80))  # 8 one-day partitions
    assert t.file_count() == 8
    lo = dt.datetime(2022, 6, 3, 6, 0)
    hi = dt.datetime(2022, 6, 5, 18, 0)
    files = t.partition_pruned_files({}, ranges={"ts": (lo, hi)})
    assert len(files) == 3  # exactly the 06-03..06-05 day span
    assert all(
        any(f"__part_day_ts=2022-06-0{d}" in f for d in (3, 4, 5))
        for f in files
    )
    # half-open ranges
    assert len(
        t.partition_pruned_files({}, ranges={"ts": (lo, None)})
    ) == 6
    assert len(
        t.partition_pruned_files({}, ranges={"ts": (None, hi)})
    ) == 5
    # rows round-trip through the pruned read + residual filter
    got = (
        t.read_partition({}, ranges={"ts": (lo, hi)})
        .filter(F.col("ts").between(lo, hi))
        .count()
    )
    want = t.read().filter(F.col("ts").between(lo, hi)).count()
    assert got == want > 0


def test_range_prune_trunc_and_bucket_posture(spark):
    t = _table(spark, ["trunc(k, 20)"])
    t.commit_append(_frame(spark, 80))  # partitions 0,20,40,60
    files = t.partition_pruned_files({}, ranges={"k": (25, 47)})
    assert len(files) == 2  # trunc buckets 20 and 40
    # bucket() is a hash — a range must NOT prune (monotonicity is
    # the admission rule, not transform-ness)
    tb = _table(spark, ["bucket(k, 4)"])
    tb.commit_append(_frame(spark, 80))
    assert len(
        tb.partition_pruned_files({}, ranges={"k": (25, 47)})
    ) == tb.file_count()


def test_range_prune_across_spec_evolution(spark):
    """Range pruning is path-driven: a day-era file keeps pruning by
    day after the spec evolves to month — each file is judged by what
    its own path encodes."""
    t = _table(spark, ["day(ts)"])
    t.commit_append(_frame(spark, 40))  # days 06-01..06-04
    t.set_partition_spec(["month(ts)"])
    older = _frame(spark, 40).withColumn(
        "ts",
        F.col("ts") - F.make_interval(F.lit(0), F.lit(2)),
    )  # 2022-04 month era
    t.commit_append(older)
    lo, hi = dt.datetime(2022, 6, 2), dt.datetime(2022, 6, 3, 23)
    files = t.partition_pruned_files({}, ranges={"ts": (lo, hi)})
    # the April-era (month) files are excluded by their month segment,
    # the June day-era files are cut to the 2-day span
    assert len(files) == 2
    assert all("__part_day_ts=2022-06-0" in f for f in files)


def test_connector_range_prune_day(spark):
    from pyspark.sql.datasource import (
        GreaterThanOrEqual,
        LessThan,
    )

    from s3_glue_redshift_guide_spark.sources.pyds import (
        SnapshotManifestReader,
    )

    t = _table(spark, ["day(ts)"])
    t.commit_append(_frame(spark, 80))
    r = SnapshotManifestReader({"root": t.root})
    r.pushFilters(
        [
            GreaterThanOrEqual(("ts",), dt.datetime(2022, 6, 3)),
            LessThan(("ts",), dt.datetime(2022, 6, 5, 23)),
        ]
    )
    # zone maps would prune this too — disable them to isolate the
    # partition-walk path (the stats map is what zone_prune reads)
    r.stats = {}
    assert len(r.partitions()) == 3
    # a strict < at the day boundary widens to inclusive at partition
    # grain — the boundary day stays (conservative, residual filters)
    r2 = SnapshotManifestReader({"root": t.root})
    r2.pushFilters(
        [
            GreaterThanOrEqual(("ts",), dt.datetime(2022, 6, 3)),
            LessThan(("ts",), dt.datetime(2022, 6, 6)),
        ]
    )
    r2.stats = {}
    assert len(r2.partitions()) == 4
    # and end-to-end through the registered source
    from s3_glue_redshift_guide_spark.sources.pyds import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    got = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .load()
        .filter(
            F.col("ts").between(
                dt.datetime(2022, 6, 3), dt.datetime(2022, 6, 5, 23)
            )
        )
        .count()
    )
    assert got == 30


# ----------------------------------------------- IN-list pruning ----
def test_anyof_prune_engine_and_connector(spark):
    """IN-list pruning is exact per-option equality through ANY
    transform — a scattered day IN (...) keeps exactly the listed
    days (the zone-map hull would keep the whole span)."""
    t = _table(spark, ["day(ts)"])
    t.commit_append(_frame(spark, 80))  # days 06-01..06-08
    days = [dt.datetime(2022, 6, 2), dt.datetime(2022, 6, 7)]
    files = t.partition_pruned_files({}, any_of={"ts": days})
    assert len(files) == 2
    assert all(
        "__part_day_ts=2022-06-02" in f
        or "__part_day_ts=2022-06-07" in f
        for f in files
    )
    # bucket prunes from IN too (equality per option, no monotonicity)
    tb = _table(spark, ["bucket(k, 8)"])
    tb.commit_append(_frame(spark, 80))
    keep = tb.partition_pruned_files({}, any_of={"k": [3, 45]})
    assert 0 < len(keep) < tb.file_count()
    # connector planning: pushed In prunes identity and transform keys
    import pyarrow as pa
    from pyspark.sql.datasource import In

    from s3_glue_redshift_guide_spark.sources.pyds import (
        SnapshotManifestReader,
    )

    r = SnapshotManifestReader({"root": t.root})
    r.pushFilters([In(("ts",), tuple(days))])
    r.stats = {}  # isolate the partition walk from zone maps
    assert len(r.partitions()) == 2
    rb = SnapshotManifestReader(
        {"root": tb.root}, types={"k": pa.int64()}
    )
    rb.pushFilters([In(("k",), (3, 45))])
    rb.stats = {}
    assert 0 < len(rb.partitions()) < tb.file_count()
    # end-to-end correctness through the registered source
    from s3_glue_redshift_guide_spark.sources.pyds import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    got = (
        spark.read.format("pysnapshot")
        .option("root", tb.root)
        .load()
        .filter(F.col("k").isin(3, 45))
        .count()
    )
    assert got == 2


def test_vectorized_transform_matches_scalar_twin():
    """The numpy fast path in the connector writer derives the SAME
    partition values as the per-value scalar twin for every transform
    and admissible dtype — including negative keys, int64 extremes
    (past 2^53, where a double detour would diverge), int32 columns'
    4-byte hash layout, and tz-aware timestamps."""
    import random

    import pyarrow as pa

    from s3_glue_redshift_guide_spark.sources.pyds import (
        _py_transform,
        _vectorized_transform,
    )
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        parse_spec_entry,
    )

    rng = random.Random(8)
    longs = (
        [rng.randint(-(2**63), 2**63 - 1) for _ in range(500)]
        + [0, -1, 1, 2**62 + 12345, -(2**62), 2**53 + 1, -(2**53) - 7]
    )
    ints = [rng.randint(-(2**31), 2**31 - 1) for _ in range(500)]
    for fn, n in (("bucket", 16), ("bucket", 7), ("trunc", 1000)):
        e = parse_spec_entry(f"{fn}(k, {n})")
        for vals, t in ((longs, pa.int64()), (ints, pa.int32())):
            arr = pa.array(vals, type=t)
            vec = _vectorized_transform(e, arr, t)
            assert vec is not None
            assert vec.to_pylist() == [
                _py_transform(e, v, t) for v in vals
            ]
    # day/month over tz-aware ns timestamps: naive-UTC wall parity
    base = dt.datetime(2024, 3, 9, 22, 30, tzinfo=dt.timezone.utc)
    stamps = [
        base + dt.timedelta(hours=h * 7, minutes=h) for h in range(200)
    ]
    t = pa.timestamp("ns", tz="UTC")
    arr = pa.array(stamps, type=t)
    for fn in ("day", "month"):
        e = parse_spec_entry(f"{fn}(ts)")
        vec = _vectorized_transform(e, arr, t)
        assert vec is not None
        assert vec.to_pylist() == [
            _py_transform(e, v, t) for v in stamps
        ]
    # strings have no vector path: fall back, never a wrong answer
    e = parse_spec_entry("bucket(s, 4)")
    assert _vectorized_transform(
        e, pa.array(["a", "b"]), pa.string()
    ) is None


def test_vectorized_trunc_int64_min_falls_back():
    """(v // n) * n floors BELOW int64 for v near the minimum — numpy
    would wrap where the scalar twin returns the exact Python int, so
    the vector path must decline (fall back), never fork semantics."""
    import pyarrow as pa

    from s3_glue_redshift_guide_spark.sources.pyds import (
        _py_transform,
        _vectorized_transform,
    )
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        parse_spec_entry,
    )

    e = parse_spec_entry("trunc(k, 1000)")
    arr = pa.array([-(2**63), 0, 7], type=pa.int64())
    assert _vectorized_transform(e, arr, pa.int64()) is None
    assert _py_transform(e, -(2**63), pa.int64()) == -9223372036854776000
