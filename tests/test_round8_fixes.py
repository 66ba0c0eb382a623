"""Regression tests for the four ADVICE-r7 defects.

1. (high) SQL MERGE clause ORDER: ``WHEN MATCHED AND cond THEN UPDATE
   ... WHEN MATCHED THEN DELETE`` must update the cond rows and delete
   only the rest — the pre-fix dispatcher executed delete-wins and
   silently deleted every matched row.
2. trunc() write/probe parity past 2^53: the Spark-side transform must
   use exact integer math (floor(col/n)*n drifts through a double).
3. day()/month() on tz-aware timestamps must render naive-UTC path
   segments regardless of ``spark.sql.session.timeZone``.
4. Path-key reverse mapping must come from the manifest's banked
   transform record: an identity partition column NAMED like a
   transform (``month_id``) that is later renamed must not be
   re-resolved as month(id) and wrongly prune old-layout files.
"""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import (
    SnapshotTable,
    parse_spec_entry,
    resolve_path_key,
    spec_transform_expr,
)
from s3_glue_redshift_guide_spark.sql_dml import snapshot_sql


def _t(spark, prefix="r8fix_"):
    return SnapshotTable(spark, tempfile.mkdtemp(prefix=prefix))


# ---------------------------------------------------------------- 1 --
def _merge_order_table(spark):
    t = _t(spark, "r8merge_")
    t.commit_append(
        spark.createDataFrame(
            [(1, 10, "keep"), (2, 200, "keep"), (3, 10, "keep")],
            "k int, v int, tag string",
        )
    )
    spark.createDataFrame(
        [(1, 111), (2, 222), (3, 333)], "k int, v int"
    ).createOrReplaceTempView("r8_merge_src")
    return t


def test_sql_merge_update_before_delete_honors_clause_order(spark):
    # rows with t.v < 100 (k=1,3) must be UPDATED; only the remaining
    # matched rows (k=2) fall through to the later DELETE clause
    t = _merge_order_table(spark)
    snapshot_sql(
        spark,
        f"MERGE INTO pysnapshot.`{t.root}` AS t "
        "USING r8_merge_src AS s ON t.k = s.k "
        "WHEN MATCHED AND t.v < 100 THEN UPDATE SET v = s.v "
        "WHEN MATCHED THEN DELETE",
    )
    got = {
        r["k"]: r["v"] for r in t.read().select("k", "v").collect()
    }
    assert got == {1: 111, 3: 333}  # k=2 deleted, 1/3 updated


def test_sql_merge_delete_before_update_honors_clause_order(spark):
    # the symmetric order: DELETE claims t.v < 100 first, UPDATE only
    # sees the remaining matched rows
    t = _merge_order_table(spark)
    snapshot_sql(
        spark,
        f"MERGE INTO pysnapshot.`{t.root}` AS t "
        "USING r8_merge_src AS s ON t.k = s.k "
        "WHEN MATCHED AND t.v < 100 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET v = s.v",
    )
    got = {
        r["k"]: r["v"] for r in t.read().select("k", "v").collect()
    }
    assert got == {2: 222}  # k=1,3 deleted; k=2 updated


def test_sql_merge_unconditional_update_starves_later_delete(spark):
    # UPDATE with no condition precedes DELETE: the delete clause can
    # never claim a row (Delta evaluates clauses in order)
    t = _merge_order_table(spark)
    snapshot_sql(
        spark,
        f"MERGE INTO pysnapshot.`{t.root}` AS t "
        "USING r8_merge_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN MATCHED AND t.v < 100 THEN DELETE",
    )
    got = {
        r["k"]: r["v"] for r in t.read().select("k", "v").collect()
    }
    assert got == {1: 111, 2: 222, 3: 333}


def test_sql_merge_rejects_duplicate_matched_clauses(spark):
    t = _merge_order_table(spark)
    with pytest.raises(ValueError, match="at most one"):
        snapshot_sql(
            spark,
            f"MERGE INTO pysnapshot.`{t.root}` AS t "
            "USING r8_merge_src AS s ON t.k = s.k "
            "WHEN MATCHED AND t.v < 100 THEN DELETE "
            "WHEN MATCHED THEN DELETE",
        )


# ---------------------------------------------------------------- 2 --
def test_trunc_transform_exact_past_2_53(spark):
    # floor(col/n)*n through a double is lossy up here; the expression
    # must match Python's exact (val // n) * n
    vals = [
        (1 << 60) + 123457,
        -((1 << 60) + 999999),
        (1 << 53) + 1,
        7,
        -7,
    ]
    entry = parse_spec_entry("trunc(v, 1000)")
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    got = [
        r["t"]
        for r in df.select(
            spec_transform_expr(entry, F.col("v"), "bigint").alias("t")
        ).collect()
    ]
    assert got == [(v // 1000) * 1000 for v in vals]


def test_trunc_partition_prune_bigint_extremes(spark):
    t = _t(spark, "r8trunc_")
    t.set_partition_spec(["trunc(v, 1000)"])
    big = (1 << 60) + 123457
    t.commit_append(
        spark.createDataFrame(
            [(big,), (big + 2000,), (5,)], "v bigint"
        )
    )
    m_files = t.partition_pruned_files({"v": big})
    assert len(m_files) == 1
    rows = spark.read.parquet(*m_files).collect()
    assert [r["v"] for r in rows] == [big]


# ---------------------------------------------------------------- 3 --
def test_day_transform_utc_pinned_under_nonutc_session(spark):
    tz_key = "spark.sql.session.timeZone"
    prev = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "America/New_York")
        t = _t(spark, "r8tz_")
        t.set_partition_spec(["day(ts)"])
        # 2022-06-02 01:30 UTC == 2022-06-01 21:30 in New York: the
        # path segment must be the UTC day, matching the connector's
        # naive-UTC twin and encode_partition_value
        instant = dt.datetime(
            2022, 6, 2, 1, 30, tzinfo=dt.timezone.utc
        )
        df = spark.createDataFrame(
            [(1, instant)], "k int, ts timestamp"
        )
        t.commit_append(df)
        files = t.partition_pruned_files({})
        assert all("__part_day_ts=2022-06-02" in f for f in files)
        # a tz-aware literal prunes to the same (UTC) partition
        assert t.partition_pruned_files({"ts": instant}) == files
        # a wrong-day probe prunes everything
        assert (
            t.partition_pruned_files(
                {"ts": instant - dt.timedelta(days=1)}
            )
            == []
        )
    finally:
        spark.conf.set(tz_key, prev)


def test_day_transform_ntz_unaffected_by_session_tz(spark):
    # timestamp_ntz is a wall clock: NO UTC shift may apply
    tz_key = "spark.sql.session.timeZone"
    prev = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "America/New_York")
        entry = parse_spec_entry("day(ts)")
        df = spark.createDataFrame(
            [("2022-06-02 01:30:00",)], "s string"
        ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
        got = df.select(
            spec_transform_expr(
                entry, F.col("ts"), "timestamp_ntz"
            ).alias("d")
        ).collect()[0]["d"]
        assert got == "2022-06-02"
    finally:
        spark.conf.set(tz_key, prev)


# ---------------------------------------------------------------- 4 --
def test_transform_keys_banked_and_resolved(spark):
    t = _t(spark, "r8tk_")
    t.set_partition_spec(["day(ts)", "bucket(k, 8)"])
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )

    m = load_manifest(t.root, t.current_version())
    assert m["transform_keys"] == {
        "day_ts": {"fn": "day", "col": "ts", "n": None},
        "bucket_k_8": {"fn": "bucket", "col": "k", "n": 8},
    }
    e = resolve_path_key("day_ts", m)
    assert (e["fn"], e["col"]) == ("day", "ts")
    # an UNRECORDED key resolves to identity (conservative), even when
    # its name looks exactly like a transform
    e = resolve_path_key("month_id", m)
    assert e["fn"] == "identity" and e["col"] == "month_id"


def test_renamed_identity_column_not_misresolved_as_transform(spark):
    # identity partition column literally named "month_id"; after the
    # rename its name leaves the schema, and the pre-fix heuristic
    # re-resolved the path key as month(id) — pruning on id then
    # compared a month string against the raw segment and dropped
    # files that DO hold matches
    t = _t(spark, "r8haz_")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, month_id string"
    )
    t.commit_append(df)
    t.set_partition_spec(["month_id"])
    t.commit_append(
        spark.createDataFrame(
            [(3, "c"), (4, "d")], "id int, month_id string"
        )
    )
    t.set_partition_spec([])  # evolve the spec away, THEN rename
    t.rename_column("month_id", "mid")
    # every file must survive an id-equality prune: none of them banks
    # an id value, and month_id segments are NOT month(id)
    all_files = set(t.partition_pruned_files({}))
    assert set(t.partition_pruned_files({"id": 3})) == all_files
    got = {
        r["id"]
        for r in t.read().filter(F.col("id") == 3).collect()
    }
    assert got == {3}


# ------------------------------------- metadata partition drop (r8) --
def test_drop_partitions_sql_and_semantics(spark):
    t = _t(spark, "r8pdrop_")
    t.set_partition_spec(["day(ts)", "bucket(k, 2)"])
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 5, 3)),
            (2, dt.datetime(2024, 1, 5, 9)),
            (3, dt.datetime(2024, 1, 6, 3)),
        ],
        "k long, ts timestamp_ntz",
    )
    t.commit_append(df)
    v0 = t.current_version()
    # SQL verb drops a whole day (both buckets)
    snapshot_sql(
        spark,
        f"ALTER TABLE pysnapshot.`{t.root}` "
        "DROP PARTITION (day_ts='2024-01-05')",
    )
    assert [r["k"] for r in t.read().collect()] == [3]
    # composite: (day, bucket) drops exactly the keys hashing to the
    # requested bucket within the requested day
    t2 = _t(spark, "r8pdrop2_")
    t2.set_partition_spec(["day(ts)", "bucket(k, 2)"])
    t2.commit_append(df)

    def bucket_of(k):
        return spark.range(1).select(
            F.pmod(F.hash(F.lit(k).cast("long")), F.lit(2))
        ).collect()[0][0]

    b1 = bucket_of(1)
    t2.drop_partitions({"day_ts": "2024-01-05", "bucket_k_2": b1})
    survivors = {3} | ({2} if bucket_of(2) != b1 else set())
    assert {r["k"] for r in t2.read().collect()} == survivors
    # time travel still reads the dropped day at the prior version
    assert t.read(version=v0).count() == 3
    # no-match drop is a version no-op
    v = t.current_version()
    assert t.drop_partitions({"day_ts": "1999-01-01"}) == v


# -------------------------------------- merge source-hull pruning ----
def test_merge_prunes_files_outside_source_key_hull(spark):
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        MERGE_METRICS,
    )

    t = _t(spark, "r8mprune_")
    # 4 key-ranged files: [0,25), [25,50), [50,75), [75,100)
    for lo in (0, 25, 50, 75):
        t.commit_append(
            spark.range(lo, lo + 25).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ).coalesce(1),
            stats_cols=["k"],  # zone maps on the merge key
        )
    src = spark.createDataFrame(
        [(30, 999), (44, 888)], "k long, v long"
    )
    t.merge_mor(
        src, on=["k"], when_matched_update={"v": F.col("__src_v")}
    )
    # only the [25,50) file intersects the source hull
    assert MERGE_METRICS["files_total"] == 4
    assert MERGE_METRICS["files_scanned"] == 1
    got = dict(
        (r["k"], r["v"]) for r in t.read().collect()
    )
    assert got[30] == 999 and got[44] == 888 and len(got) == 100
    # inserts outside every file's range still land
    t.merge_mor(
        spark.createDataFrame([(500, 1)], "k long, v long"), on=["k"]
    )
    assert t.read().count() == 101
    # NOT MATCHED BY SOURCE needs every target row: pruning disabled
    t2 = _t(spark, "r8mprune2_")
    for lo in (0, 25):
        t2.commit_append(
            spark.range(lo, lo + 25).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ).coalesce(1),
            stats_cols=["k"],
        )
    t2.merge_mor(
        spark.createDataFrame([(30, 1)], "k long, v long"),
        on=["k"],
        when_matched_update={"v": F.col("__src_v")},
        when_not_matched_by_source_delete=True,
        insert_not_matched=False,
    )
    assert MERGE_METRICS["files_scanned"] == 2  # no pruning
    assert {r["k"] for r in t2.read().collect()} == {30}
