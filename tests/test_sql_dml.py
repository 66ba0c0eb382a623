"""Warehouse-SQL dispatcher (sql_dml.snapshot_sql): every statement
must produce results value-identical to calling the SnapshotTable
method directly."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sql_dml import snapshot_sql
from s3_glue_redshift_guide_spark.sources.snapshots import (
    LogTruncated,
    SnapshotTable,
)


def _tmp(pfx):
    return tempfile.mkdtemp(prefix=f"sqldml_{pfx}_")


def _kv(spark, n=20, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def _rows(t):
    return sorted(
        (r["k"], r["v"]) for r in t.read().select("k", "v").collect()
    )


def test_sql_merge_matches_method_call(spark):
    # the same three-branch MERGE through SQL and through merge_mor
    sql_t = SnapshotTable(spark, _tmp("msql"))
    api_t = SnapshotTable(spark, _tmp("mapi"))
    for t in (sql_t, api_t):
        t.commit_append(_kv(spark, 20))
    src = spark.range(10, 30).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("v")
    )
    src.createOrReplaceTempView("merge_src")
    snapshot_sql(
        spark,
        f"""MERGE INTO pysnapshot.`{sql_t.root}` AS t
            USING (SELECT * FROM merge_src) AS s
            ON t.k = s.k
            WHEN MATCHED AND s.k % 5 = 0 THEN DELETE
            WHEN MATCHED THEN UPDATE SET v = s.v + 1
            WHEN NOT MATCHED AND s.k < 25 THEN INSERT *""",
    )
    api_t.merge_mor(
        src,
        on=["k"],
        when_matched_delete=F.col("__src_k") % 5 == 0,
        when_matched_update={"v": F.col("__src_v") + 1},
        insert_not_matched=F.col("__src_k") < 25,
    )
    assert _rows(sql_t) == _rows(api_t)


def test_sql_merge_not_matched_by_source(spark):
    sql_t = SnapshotTable(spark, _tmp("msync"))
    sql_t.commit_append(_kv(spark, 10))
    spark.range(5, 8).select(
        F.col("id").alias("k"), F.lit(0).cast("bigint").alias("v")
    ).createOrReplaceTempView("sync_src")
    snapshot_sql(
        spark,
        f"""MERGE INTO pysnapshot.`{sql_t.root}` t
            USING sync_src s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET v = s.v
            WHEN NOT MATCHED THEN INSERT *
            WHEN NOT MATCHED BY SOURCE THEN DELETE""",
    )
    # full SYNC: table becomes exactly the source
    assert _rows(sql_t) == [(5, 0), (6, 0), (7, 0)]


def test_sql_update_delete(spark):
    t = SnapshotTable(spark, _tmp("ud"))
    t.commit_append(_kv(spark, 10))
    snapshot_sql(
        spark,
        f"UPDATE pysnapshot.`{t.root}` SET v = v + 1000 WHERE k >= 8",
    )
    snapshot_sql(
        spark, f"DELETE FROM pysnapshot.`{t.root}` WHERE k < 3"
    )
    assert _rows(t) == [
        (3, 6), (4, 8), (5, 10), (6, 12), (7, 14),
        (8, 1016), (9, 1018),
    ]


def test_sql_optimize_history_restore_vacuum_detail(spark):
    t = SnapshotTable(spark, _tmp("maint"))
    for i in range(3):
        t.commit_append(_kv(spark, 5, start=i * 5).coalesce(1))
    facts = snapshot_sql(spark, f"OPTIMIZE pysnapshot.`{t.root}`")
    assert facts["files_compacted"] >= 2 if "files_compacted" in facts \
        else facts  # shape depends on optimize_small_files' dict
    hist = snapshot_sql(
        spark, f"DESCRIBE HISTORY pysnapshot.`{t.root}`"
    )
    ops = [r["operation"] for r in hist.collect()]
    assert len(ops) == 4 and ops[-1] == "APPEND"
    detail = snapshot_sql(
        spark, f"DESCRIBE DETAIL pysnapshot.`{t.root}`"
    )
    assert detail["num_rows"] == 15
    snapshot_sql(
        spark,
        f"RESTORE pysnapshot.`{t.root}` TO VERSION AS OF 2",
    )
    assert t.read().count() == 10
    snapshot_sql(
        spark, f"VACUUM pysnapshot.`{t.root}` RETAIN 1 VERSIONS"
    )
    with pytest.raises(LogTruncated):
        t.read(1).count()
    assert t.read().count() == 10


def test_sql_optimize_zorder_and_where(spark):
    t = SnapshotTable(spark, _tmp("optz"))
    t.set_partition_spec(["p"])
    t.commit_append(
        spark.range(40).select(
            F.col("id").alias("a"),
            (F.col("id") * 7 % 40).alias("b"),
            (F.col("id") % 2).alias("p"),
        ).repartition(4)
    )
    facts = snapshot_sql(
        spark,
        f"OPTIMIZE pysnapshot.`{t.root}` WHERE p = 1 "
        "ZORDER BY (a, b)",
    )
    assert isinstance(facts, dict)
    assert t.read().count() == 40


def test_sql_rejects_non_equi_on_and_garbage(spark):
    t = SnapshotTable(spark, _tmp("bad"))
    t.commit_append(_kv(spark, 5))
    spark.range(3).select(F.col("id").alias("k")).createOrReplaceTempView(
        "bad_src"
    )
    with pytest.raises(ValueError, match="equi-conjunction"):
        snapshot_sql(
            spark,
            f"MERGE INTO pysnapshot.`{t.root}` t USING bad_src s "
            "ON t.k > s.k WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="unrecognized"):
        snapshot_sql(
            spark, f"GRANT SELECT ON pysnapshot.`{t.root}` TO alice"
        )


def test_sql_string_literal_aliases_untouched(spark):
    # an 's.' inside a string literal must NOT rewrite
    t = SnapshotTable(spark, _tmp("strlit"))
    t.commit_append(
        spark.range(3).select(
            F.col("id").alias("k"), F.lit("x").alias("tag")
        )
    )
    spark.range(1, 2).select(F.col("id").alias("k")).createOrReplaceTempView(
        "lit_src"
    )
    snapshot_sql(
        spark,
        f"MERGE INTO pysnapshot.`{t.root}` t USING lit_src s "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET tag = 's.k literal'",
    )
    got = {
        r["k"]: r["tag"] for r in t.read().collect()
    }
    assert got == {0: "x", 1: "s.k literal", 2: "x"}


# ------------------------------------------------- round-7 DDL verbs ----
def test_sql_select_head_and_where(spark):
    t = SnapshotTable(spark, _tmp("sel"))
    t.commit_append(_kv(spark, 20))
    df = snapshot_sql(spark, f"SELECT * FROM pysnapshot.`{t.root}`")
    assert df.count() == 20
    df = snapshot_sql(
        spark,
        f"SELECT * FROM pysnapshot.`{t.root}` WHERE k % 2 = 0",
    )
    assert df.count() == 10


def test_sql_select_version_and_tag(spark):
    t = SnapshotTable(spark, _tmp("selv"))
    t.commit_append(_kv(spark, 10))          # v1
    t.create_tag("first")
    t.commit_append(_kv(spark, 10, start=10))  # v2
    assert (
        snapshot_sql(
            spark,
            f"SELECT * FROM pysnapshot.`{t.root}` VERSION AS OF 1",
        ).count()
        == 10
    )
    assert (
        snapshot_sql(
            spark,
            f"SELECT * FROM pysnapshot.`{t.root}` TAG 'first'",
        ).count()
        == 10
    )
    assert (
        snapshot_sql(
            spark, f"SELECT * FROM pysnapshot.`{t.root}`"
        ).count()
        == 20
    )


def test_sql_reorg_purges_dvs(spark):
    t = SnapshotTable(spark, _tmp("reorg"))
    t.commit_append(_kv(spark, 30))
    t.delete_where(F.col("k") % 3 == 0)
    dv = t.files().agg(F.sum("n_dv_sidecars")).collect()[0][0]
    assert dv and dv > 0
    snapshot_sql(
        spark, f"REORG TABLE pysnapshot.`{t.root}` APPLY (PURGE)"
    )
    assert (
        t.files().agg(F.sum("n_dv_sidecars")).collect()[0][0] or 0
    ) == 0
    assert t.read().count() == 20


def test_sql_constraint_add_drop(spark):
    t = SnapshotTable(spark, _tmp("constr"))
    t.commit_append(_kv(spark, 5))
    snapshot_sql(
        spark,
        f"ALTER TABLE pysnapshot.`{t.root}` ADD CONSTRAINT pos "
        "CHECK (v >= 0)",
    )
    with pytest.raises(ValueError, match="constraint"):
        t.commit_append(
            spark.range(1).select(
                F.lit(99).cast("long").alias("k"), F.lit(-5).cast("long").alias("v")
            )
        )
    snapshot_sql(
        spark,
        f"ALTER TABLE pysnapshot.`{t.root}` DROP CONSTRAINT pos",
    )
    t.commit_append(
        spark.range(1).select(
            F.lit(99).cast("long").alias("k"), F.lit(-5).cast("long").alias("v")
        )
    )
    assert t.read().count() == 6


def test_sql_copy_into_idempotent(spark, tmp_path):
    src = str(tmp_path / "landing")
    _kv(spark, 12).coalesce(1).write.parquet(src)
    import os

    parts = sorted(
        os.path.join(src, f)
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    t = SnapshotTable(spark, _tmp("copy"))
    stmt = (
        f"COPY INTO pysnapshot.`{t.root}` FROM "
        + ", ".join(f"'{p}'" for p in parts)
        + " FILEFORMAT = parquet"
    )
    first = snapshot_sql(spark, stmt)
    assert first["n_ingested"] == len(parts)
    again = snapshot_sql(spark, stmt)
    assert again["n_ingested"] == 0 and again["n_skipped"] == len(parts)
    assert t.read().count() == 12


def test_sql_create_tag_as_of_version(spark):
    t = SnapshotTable(spark, _tmp("tagv"))
    t.commit_append(_kv(spark, 5))   # v1
    t.commit_append(_kv(spark, 5, start=5))  # v2
    snapshot_sql(
        spark,
        f"ALTER TABLE pysnapshot.`{t.root}` CREATE TAG early "
        "AS OF VERSION 1",
    )
    assert t.read(tag="early").count() == 5


def test_sql_unrecognized_raises(spark):
    with pytest.raises(ValueError, match="unrecognized"):
        snapshot_sql(spark, "GRANT ALL ON pysnapshot.`/nope` TO bob")
    # TRUNCATE is recognized now, but a missing table still fails fast
    with pytest.raises(ValueError, match="no table"):
        snapshot_sql(spark, "TRUNCATE TABLE pysnapshot.`/nope`")


def test_sql_vacuum_dry_run_touches_nothing(spark):
    import os

    t = SnapshotTable(spark, _tmp("vdry"))
    t.commit_append(_kv(spark, 10))           # v1
    t.commit_rewrite(_kv(spark, 10, start=50))  # v2: v1's files orphan
    would = snapshot_sql(
        spark,
        f"VACUUM pysnapshot.`{t.root}` RETAIN 1 VERSIONS DRY RUN",
    )
    assert would  # v1's files are reclaimable
    assert all(os.path.exists(p) for p in would)  # nothing deleted
    assert t.read(1).count() == 10  # log untouched
    real = snapshot_sql(
        spark, f"VACUUM pysnapshot.`{t.root}` RETAIN 1 VERSIONS"
    )
    assert sorted(real) == sorted(would)  # dry run predicted the sweep
    assert not any(os.path.exists(p) for p in real)


def test_sql_show_partitions(spark):
    t = SnapshotTable(spark, _tmp("showp"))
    t.set_partition_spec(["k"])
    t.commit_append(_kv(spark, 6), stats_cols=["v"])
    p = snapshot_sql(spark, f"SHOW PARTITIONS pysnapshot.`{t.root}`")
    assert p.count() == 6  # one partition per distinct k
    assert p.agg(F.sum("banked_rows")).collect()[0][0] == 6


def test_sql_analyze_computes_ndv_stats(spark):
    t = SnapshotTable(spark, _tmp("analyze"))
    t.commit_append(_kv(spark, 40))
    snapshot_sql(
        spark,
        f"ANALYZE TABLE pysnapshot.`{t.root}` COMPUTE STATISTICS "
        "FOR COLUMNS k, v",
    )
    est = t.table_ndv("k")
    assert est is not None and abs(est - 40) / 40 < 0.05


def test_sql_vacuum_retain_hours(spark):
    clock = [1_000_000.0]
    t = SnapshotTable(spark, _tmp("vhours"), clock=lambda: clock[0])
    t.commit_append(_kv(spark, 5))           # v1 @ t0
    clock[0] += 7200
    t.commit_rewrite(_kv(spark, 5, start=50))  # v2 @ t0+2h
    from s3_glue_redshift_guide_spark.sql_dml import snapshot_sql as ss

    # 1h window: v1 (2h old) falls out, v2 survives
    deleted = ss(
        spark,
        f"VACUUM pysnapshot.`{t.root}` RETAIN 1 HOURS",
        clock=lambda: clock[0],
    )
    assert deleted
    assert t.read().count() == 5


def test_sql_copy_into_pattern_expands_and_stays_idempotent(
    spark, tmp_path
):
    land = str(tmp_path / "landing")
    _kv(spark, 8).coalesce(2).write.parquet(land)
    t = SnapshotTable(spark, _tmp("copypat"))
    stmt = (
        f"COPY INTO pysnapshot.`{t.root}` FROM '{land}' "
        "PATTERN '*.parquet' FILEFORMAT = parquet"
    )
    first = snapshot_sql(spark, stmt)
    assert first["n_ingested"] >= 2
    assert t.read().count() == 8
    again = snapshot_sql(spark, stmt)
    assert again["n_ingested"] == 0
    # a NEW landing file: only the delta ingests
    _kv(spark, 4, start=100).coalesce(1).write.mode("append").parquet(land)
    third = snapshot_sql(spark, stmt)
    assert third["n_ingested"] == 1
    assert t.read().count() == 12


# ------------------------------------------------- DDL verbs (r8) ----
def test_sql_create_insert_merge_select_roundtrip(spark):
    """The warehouse bootstrap a user runs FIRST, in pure SQL:
    CREATE TABLE (schema + transform partitioning + properties) →
    INSERT INTO (VALUES and SELECT) → MERGE INTO → SELECT."""
    root = _tmp("create")
    snapshot_sql(
        spark,
        f"CREATE TABLE pysnapshot.`{root}` "
        "(k BIGINT, v BIGINT, ts TIMESTAMP_NTZ) "
        "PARTITIONED BY (day(ts), bucket(k, 4)) "
        "TBLPROPERTIES ('schema.enforcement'='strict', "
        "'retention.versions'='5')",
    )
    t = SnapshotTable(spark, root)
    assert t.current_version() == 1
    # SELECT before any INSERT: typed empty frame
    empty = snapshot_sql(spark, f"SELECT * FROM pysnapshot.`{root}`")
    assert empty.count() == 0
    assert dict(empty.dtypes) == {
        "k": "bigint", "v": "bigint", "ts": "timestamp_ntz"
    }
    d = t.detail()
    assert d["schema_enforcement"] == "strict"
    assert d["properties"]["retention.versions"] == "5"
    assert d["partition_spec"] == ["day(ts)", "bucket(k, 4)"]
    snapshot_sql(
        spark,
        f"INSERT INTO pysnapshot.`{root}` VALUES "
        "(1, 10, TIMESTAMP '2024-01-05 10:00:00'), "
        "(2, 20, TIMESTAMP '2024-01-06 10:00:00')",
    )
    snapshot_sql(
        spark,
        f"INSERT INTO pysnapshot.`{root}` "
        "SELECT id + 10, id * 100, TIMESTAMP '2024-01-07 00:00:00' "
        "FROM range(2)",
    )
    got = snapshot_sql(spark, f"SELECT * FROM pysnapshot.`{root}`")
    assert sorted((r["k"], r["v"]) for r in got.collect()) == [
        (1, 10), (2, 20), (10, 0), (11, 100)
    ]
    # the declared transform layout actually landed
    files = t.partition_pruned_files({})
    assert all(
        "__part_day_ts=" in f and "__part_bucket_k_4=" in f
        for f in files
    )
    # strict enforcement came from TBLPROPERTIES: an extra column fails
    with pytest.raises(ValueError, match="strict"):
        t.commit_append(
            spark.sql(
                "SELECT 1 k, 2 v, "
                "TIMESTAMP_NTZ '2024-01-05 00:00:00' ts, 'x' extra"
            )
        )
    spark.createDataFrame(
        [(1, 111), (99, 999)], "k bigint, v bigint"
    ).createOrReplaceTempView("ddl_merge_src")
    snapshot_sql(
        spark,
        f"MERGE INTO pysnapshot.`{root}` AS t "
        "USING (SELECT k, v, TIMESTAMP_NTZ '2024-01-08 00:00:00' AS ts "
        "FROM ddl_merge_src) AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = {
        r["k"]: r["v"]
        for r in snapshot_sql(
            spark, f"SELECT * FROM pysnapshot.`{root}`"
        ).collect()
    }
    assert got == {1: 111, 2: 20, 10: 0, 11: 100, 99: 999}


def test_sql_alter_column_verbs_match_methods(spark):
    sql_root, api_root = _tmp("altsql"), _tmp("altapi")
    for root in (sql_root, api_root):
        t = SnapshotTable(spark, root)
        t.commit_append(_kv(spark, 10))
    # ADD COLUMN -> typed NULLs on old files
    snapshot_sql(
        spark,
        f"ALTER TABLE pysnapshot.`{sql_root}` ADD COLUMN score INT",
    )
    SnapshotTable(spark, api_root).add_column("score", "int")
    for root in (sql_root, api_root):
        df = SnapshotTable(spark, root).read()
        assert dict(df.dtypes)["score"] == "int"
        assert df.filter(F.col("score").isNull()).count() == 10
    # duplicate add refuses
    with pytest.raises(ValueError, match="already exists"):
        snapshot_sql(
            spark,
            f"ALTER TABLE pysnapshot.`{sql_root}` ADD COLUMN score INT",
        )
    # RENAME COLUMN / widen / TBLPROPERTIES: SQL == method, verbatim
    snapshot_sql(
        spark,
        f"ALTER TABLE pysnapshot.`{sql_root}` RENAME COLUMN v TO val",
    )
    SnapshotTable(spark, api_root).rename_column("v", "val")
    snapshot_sql(
        spark,
        f"ALTER TABLE pysnapshot.`{sql_root}` "
        "ALTER COLUMN score TYPE BIGINT",
    )
    SnapshotTable(spark, api_root).widen_column("score", "bigint")
    snapshot_sql(
        spark,
        f"ALTER TABLE pysnapshot.`{sql_root}` SET TBLPROPERTIES "
        "('schema.enforcement'='strict', 'owner'='etl')",
    )
    SnapshotTable(spark, api_root).set_tblproperties(
        {"schema.enforcement": "strict", "owner": "etl"}
    )
    ds, da = (
        SnapshotTable(spark, r).detail() for r in (sql_root, api_root)
    )
    for d in (ds, da):
        assert d["schema_enforcement"] == "strict"
        assert d["properties"]["owner"] == "etl"
    sd, ad = (
        SnapshotTable(spark, r).read() for r in (sql_root, api_root)
    )
    assert dict(sd.dtypes) == dict(ad.dtypes)
    assert sorted(map(tuple, sd.collect())) == sorted(
        map(tuple, ad.collect())
    )


def test_sql_insert_column_list_and_arity_guard(spark):
    root = _tmp("inscols")
    snapshot_sql(
        spark,
        f"CREATE TABLE pysnapshot.`{root}` (k BIGINT, v BIGINT, "
        "note STRING)",
    )
    # explicit column list: omitted columns read NULL
    snapshot_sql(
        spark,
        f"INSERT INTO pysnapshot.`{root}` (k, v) VALUES (1, 10)",
    )
    r = snapshot_sql(
        spark, f"SELECT * FROM pysnapshot.`{root}`"
    ).collect()[0]
    assert (r["k"], r["v"], r["note"]) == (1, 10, None)
    with pytest.raises(ValueError, match="arity"):
        snapshot_sql(
            spark,
            f"INSERT INTO pysnapshot.`{root}` VALUES (1, 2)",
        )
    with pytest.raises(ValueError, match="already exists"):
        snapshot_sql(
            spark, f"CREATE TABLE pysnapshot.`{root}` (x INT)"
        )


# ------------------------------------- streaming SQL MERGE sink (r8) --
def test_foreach_batch_merge_sql_idempotent_replay(spark):
    from s3_glue_redshift_guide_spark.streaming.sql_sink import (
        foreach_batch_merge_sql,
    )

    root = _tmp("sqlsink")
    sink = foreach_batch_merge_sql(
        root,
        f"MERGE INTO pysnapshot.`{root}` AS t "
        "USING {batch} AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *",
        app_id="t_sink",
    )
    t = SnapshotTable(spark, root)
    sink(_kv(spark, 5), 0)
    assert _rows(t) == [(i, 2 * i) for i in range(5)]
    v1 = t.current_version()
    # replay of epoch 0: watermark detects, zero commits
    sink(_kv(spark, 5), 0)
    assert t.current_version() == v1
    # epoch 1 updates a key and inserts another
    upd = spark.createDataFrame([(1, 111), (9, 99)], "k long, v long")
    sink(upd, 1)
    got = dict(_rows(t))
    assert got[1] == 111 and got[9] == 99 and len(got) == 6
    # an EMPTY epoch still advances the watermark atomically
    sink(upd.limit(0), 2)
    assert t.txn_watermark("t_sink") == 2
    sink(upd, 2)  # replayed: must not re-apply
    assert t.txn_watermark("t_sink") == 2


def test_sql_select_branch_reads_wap_staging(spark):
    root = _tmp("selbr")
    t = SnapshotTable(spark, root)
    t.commit_append(_kv(spark, 5))
    b = t.create_branch("audit")
    b.commit_append(_kv(spark, 3, start=100))
    main_rows = snapshot_sql(
        spark, f"SELECT * FROM pysnapshot.`{root}`"
    ).count()
    branch_rows = snapshot_sql(
        spark, f"SELECT * FROM pysnapshot.`{root}` BRANCH 'audit'"
    ).count()
    assert (main_rows, branch_rows) == (5, 8)
    got = snapshot_sql(
        spark,
        f"SELECT * FROM pysnapshot.`{root}` BRANCH 'audit' "
        "WHERE k >= 100",
    )
    assert got.count() == 3


def test_sql_ctas_and_show_tblproperties(spark):
    root = _tmp("ctas")
    _kv(spark, 10).createOrReplaceTempView("ctas_src")
    snapshot_sql(
        spark,
        f"CREATE TABLE pysnapshot.`{root}` "
        "PARTITIONED BY (bucket(k, 2)) "
        "TBLPROPERTIES ('owner'='etl') "
        "AS SELECT k, v * 10 AS v10 FROM ctas_src",
    )
    t = SnapshotTable(spark, root)
    assert t.current_version() == 2  # v1 CREATE, v2 the data
    got = snapshot_sql(spark, f"SELECT * FROM pysnapshot.`{root}`")
    assert dict(got.dtypes) == {"k": "bigint", "v10": "bigint"}
    assert got.count() == 10
    files = t.partition_pruned_files({})
    assert all("__part_bucket_k_2=" in f for f in files)
    props = {
        r["key"]: r["value"]
        for r in snapshot_sql(
            spark, f"SHOW TBLPROPERTIES pysnapshot.`{root}`"
        ).collect()
    }
    assert props == {"owner": "etl"}
    # empty-props table shows zero rows
    root2 = _tmp("ctas2")
    snapshot_sql(spark, f"CREATE TABLE pysnapshot.`{root2}` (k INT)")
    assert snapshot_sql(
        spark, f"SHOW TBLPROPERTIES pysnapshot.`{root2}`"
    ).count() == 0


def test_sql_show_create_table_roundtrip(spark):
    """SHOW CREATE TABLE emits EXECUTABLE DDL: replaying the emitted
    statements (root rewritten) onto a fresh log reproduces the
    schema, transform partition spec, properties, and CHECK
    constraints — and the replayed constraint actually enforces."""
    root = _tmp("showcre")
    snapshot_sql(
        spark,
        f"CREATE TABLE pysnapshot.`{root}` "
        "(k BIGINT, v BIGINT, ts TIMESTAMP_NTZ) "
        "PARTITIONED BY (day(ts), bucket(k, 4)) "
        "TBLPROPERTIES ('retention.versions'='5')",
    )
    snapshot_sql(
        spark,
        f"ALTER TABLE pysnapshot.`{root}` ADD CONSTRAINT nonneg "
        "CHECK (k >= 0)",
    )
    ddl = snapshot_sql(
        spark, f"SHOW CREATE TABLE pysnapshot.`{root}`"
    ).collect()[0]["createtab_stmt"]
    assert "PARTITIONED BY (day(ts), bucket(k, 4))" in ddl
    root2 = _tmp("showcre2")
    for stmt in ddl.replace(root, root2).split(";\n"):
        snapshot_sql(spark, stmt)
    t2 = SnapshotTable(spark, root2)
    d1, d2 = SnapshotTable(spark, root).detail(), t2.detail()
    for key in ("partition_spec", "properties", "n_constraints"):
        assert d1[key] == d2[key]
    got = snapshot_sql(spark, f"SELECT * FROM pysnapshot.`{root2}`")
    assert dict(got.dtypes) == {
        "k": "bigint", "v": "bigint", "ts": "timestamp_ntz"
    }
    with pytest.raises(ValueError, match="nonneg"):
        snapshot_sql(
            spark,
            f"INSERT INTO pysnapshot.`{root2}` VALUES "
            "(-1, 1, TIMESTAMP '2024-01-05 00:00:00')",
        )


def test_sql_explain_scan_facts(spark):
    """EXPLAIN SELECT reports plan-time prune counts from metadata
    only: a day-span BETWEEN prunes the transform layout to the span's
    partitions, zone maps catch a value-range conjunct, and an
    unpushable conjunct lands in residual."""
    root = _tmp("explain")
    snapshot_sql(
        spark,
        f"CREATE TABLE pysnapshot.`{root}` (k BIGINT, ts TIMESTAMP_NTZ)"
        " PARTITIONED BY (day(ts))",
    )
    for d in (5, 6, 7, 8):
        snapshot_sql(
            spark,
            f"INSERT INTO pysnapshot.`{root}` VALUES "
            f"({d}, TIMESTAMP '2024-01-0{d} 10:00:00'), "
            f"({d * 100}, TIMESTAMP '2024-01-0{d} 11:00:00')",
        )
    r = snapshot_sql(
        spark,
        f"EXPLAIN SELECT * FROM pysnapshot.`{root}` WHERE "
        "ts BETWEEN '2024-01-06 00:00:00' AND '2024-01-07 23:00:00' "
        "AND k % 2 = 0",
    ).collect()[0]
    assert r["files_total"] == 4
    assert r["files_after_partition_prune"] == 2  # the 2-day span
    assert r["files_scanned"] == 2
    assert r["pushed_prune_cols"] == "ts"
    assert r["residual"] == "k % 2 = 0"
    # zone maps prune a value range when the files bank stats — files
    # WITHOUT banked stats stay conservatively kept (the 4 insert
    # files above have no k stats, so only the new commit can prune)
    zr = _tmp("explainz")
    tz = SnapshotTable(spark, zr)
    for lo in (0, 1000, 2000):
        tz.commit_append(
            spark.range(lo, lo + 10).select(
                F.col("id").alias("k")
            ).coalesce(1),
            stats_cols=["k"],
        )
    r = snapshot_sql(
        spark,
        f"EXPLAIN SELECT * FROM pysnapshot.`{zr}` WHERE k >= 1800",
    ).collect()[0]
    assert r["files_total"] == 3
    assert r["files_after_zone_prune"] == 1
    assert r["files_scanned"] == 1
    assert r["residual"] == ""
    # EXPLAIN runs against time travel too
    r = snapshot_sql(
        spark,
        f"EXPLAIN SELECT * FROM pysnapshot.`{root}` VERSION AS OF 5",
    ).collect()[0]
    assert (r["version"], r["files_total"], r["files_scanned"]) == (
        5, 4, 4
    )


def test_sql_explain_like_prefix_prunes(spark):
    """`col LIKE 'prefix%'` prunes as the lexicographic range
    [prefix, next-prefix) against banked string stats — the same bound
    the connector derives from a pushed StringStartsWith — while the
    LIKE itself stays a row-level residual."""
    root = _tmp("explainlike")
    t = SnapshotTable(spark, root)
    for grp in ("alpha", "beta", "gamma"):
        t.commit_append(
            spark.range(5).select(
                F.concat(F.lit(grp + "_"), F.col("id")).alias("name")
            ).coalesce(1),
            stats_cols=["name"],
        )
    r = snapshot_sql(
        spark,
        f"EXPLAIN SELECT * FROM pysnapshot.`{root}` "
        "WHERE name LIKE 'beta%'",
    ).collect()[0]
    assert r["files_total"] == 3
    assert r["files_after_zone_prune"] == 1
    assert r["files_scanned"] == 1
    assert r["pushed_prune_cols"] == "name"
    assert r["residual"] == "name LIKE 'beta%'"


def test_sql_create_table_column_clauses_roundtrip(spark):
    """CREATE TABLE accepts per-column DEFAULT / GENERATED ALWAYS AS
    (expr) / GENERATED ALWAYS AS IDENTITY clauses (each registering
    through its existing method), complex types survive the clause
    split (map<string,int>), and SHOW CREATE TABLE emits the clauses
    back EXECUTABLY — identity numbering continues past the banked
    high-water mark on replay."""
    root = _tmp("colclauses")
    snapshot_sql(
        spark,
        f"""CREATE TABLE pysnapshot.`{root}` (
          id BIGINT GENERATED ALWAYS AS IDENTITY
             (START WITH 10 INCREMENT BY 2),
          k BIGINT,
          doubled BIGINT GENERATED ALWAYS AS (k * 2),
          tag STRING DEFAULT 'unset',
          m MAP<STRING,INT>
        )""",
    )
    t = SnapshotTable(spark, root)
    snapshot_sql(
        spark, f"INSERT INTO pysnapshot.`{root}` (k) VALUES (5), (6)"
    )
    rows = sorted(
        (r["id"], r["k"], r["doubled"], r["tag"])
        for r in t.read().collect()
    )
    assert rows == [(10, 5, 10, "unset"), (12, 6, 12, "unset")]
    ddl = snapshot_sql(
        spark, f"SHOW CREATE TABLE pysnapshot.`{root}`"
    ).collect()[0]["createtab_stmt"]
    assert "GENERATED ALWAYS AS IDENTITY (START WITH 14" in ddl
    assert "GENERATED ALWAYS AS (k * 2)" in ddl
    assert "DEFAULT 'unset'" in ddl and "map<string,int>" in ddl
    root2 = _tmp("colclauses2")
    for stmt in ddl.replace(root, root2).split(";\n"):
        snapshot_sql(spark, stmt)
    snapshot_sql(
        spark, f"INSERT INTO pysnapshot.`{root2}` (k) VALUES (9)"
    )
    t2 = SnapshotTable(spark, root2)
    got = t2.read().collect()[0]
    assert (got["id"], got["doubled"], got["tag"]) == (14, 18, "unset")
    # SET / DROP DEFAULT verbs map to the existing methods
    snapshot_sql(
        spark,
        f"ALTER TABLE pysnapshot.`{root2}` ALTER COLUMN tag "
        "SET DEFAULT 'other'",
    )
    assert snapshot_sql(
        spark, f"SHOW CREATE TABLE pysnapshot.`{root2}`"
    ).collect()[0]["createtab_stmt"].count("DEFAULT 'other'") == 1
    snapshot_sql(
        spark,
        f"ALTER TABLE pysnapshot.`{root2}` ALTER COLUMN tag "
        "DROP DEFAULT",
    )
    assert t2.detail()["n_defaults"] == 0


def test_sql_replace_where(spark):
    """INSERT INTO ... REPLACE WHERE: one-commit window replacement,
    out-of-window rows rejected before anything stages."""
    t = SnapshotTable(spark, _tmp("replw"))
    t.commit_append(_kv(spark, 20))
    spark.range(100, 103).select(
        F.col("id").alias("k"), F.lit(-1).cast("bigint").alias("v")
    ).createOrReplaceTempView("rw_src")
    v = snapshot_sql(
        spark,
        f"INSERT INTO pysnapshot.`{t.root}` REPLACE WHERE k >= 10 "
        "SELECT * FROM rw_src",
    )
    assert v == 2
    assert _rows(t) == [(k, 2 * k) for k in range(10)] + [
        (100, -1), (101, -1), (102, -1)
    ]
    # an out-of-window row aborts with nothing staged
    with pytest.raises(ValueError, match="REPLACE WHERE"):
        snapshot_sql(
            spark,
            f"INSERT INTO pysnapshot.`{t.root}` REPLACE WHERE k > 500 "
            "SELECT * FROM rw_src",
        )
    assert t.current_version() == 2
    # time travel still reads the pre-replace window
    assert t.read(1).count() == 20


def test_sql_truncate_and_drop_column(spark):
    """TRUNCATE TABLE is a metadata-only empty-file-list commit (zero
    IO, contracts survive, prior versions time-travel); ALTER TABLE
    DROP COLUMN maps to the field-id-map drop."""
    t = SnapshotTable(spark, _tmp("trunc"))
    t.commit_append(_kv(spark, 10))
    t.add_constraint("nonneg", "k >= 0")
    snapshot_sql(spark, f"TRUNCATE TABLE pysnapshot.`{t.root}`")
    assert t.read().count() == 0
    assert t.read(1).count() == 10          # history intact
    assert t.detail()["n_constraints"] == 1  # contract survives
    # the table is immediately writable under the same contract
    t.commit_append(_kv(spark, 3, start=50))
    assert t.read().count() == 3
    snapshot_sql(
        spark, f"ALTER TABLE pysnapshot.`{t.root}` DROP COLUMN v"
    )
    assert t.read().columns == ["k"]


def test_sql_table_changes_and_branch_verbs(spark):
    """table_changes(tbl, start[, end]) surfaces the CDF in SQL
    (Delta's TVF: commits start..end = manifest diff (start-1, end]);
    CREATE/DROP BRANCH and FAST FORWARD TO BRANCH drive the WAP cycle
    in SQL."""
    t = SnapshotTable(spark, _tmp("tvf"))
    t.commit_append(_kv(spark, 5))            # v1
    t.commit_append(_kv(spark, 5, start=5))   # v2
    t.delete_where(F.col("k") == 7)           # v3
    ch = snapshot_sql(
        spark,
        f"SELECT * FROM table_changes(pysnapshot.`{t.root}`, 2, 3)",
    )
    got = sorted(
        (r["k"], r["_change_type"]) for r in ch.collect()
    )
    assert got == [
        (5, "insert"), (6, "insert"), (7, "delete"), (7, "insert"),
        (8, "insert"), (9, "insert"),
    ]
    # end defaults to head
    assert (
        snapshot_sql(
            spark,
            f"SELECT * FROM table_changes(pysnapshot.`{t.root}`, 3)",
        ).count()
        == 1
    )
    # WAP in SQL: branch, write on it, audit, fast-forward, drop
    snapshot_sql(
        spark, f"ALTER TABLE pysnapshot.`{t.root}` CREATE BRANCH wap"
    )
    t.branch("wap").commit_append(_kv(spark, 3, start=100))
    staged = snapshot_sql(
        spark, f"SELECT * FROM pysnapshot.`{t.root}` BRANCH 'wap'"
    )
    assert staged.count() == 12
    assert t.read().count() == 9   # main unchanged until publish
    snapshot_sql(
        spark,
        f"ALTER TABLE pysnapshot.`{t.root}` FAST FORWARD TO BRANCH wap",
    )
    assert t.read().count() == 12
    snapshot_sql(
        spark, f"ALTER TABLE pysnapshot.`{t.root}` DROP BRANCH wap"
    )
    assert t.branches() == {}


def test_sql_create_table_cluster_by(spark):
    """CREATE TABLE ... CLUSTER BY (a, b): the declaration makes EVERY
    append z-cluster itself — per-file zone maps cover bounded ranges
    in BOTH columns without callers opting in write-by-write."""
    root = _tmp("clusterby")
    snapshot_sql(
        spark,
        f"CREATE TABLE pysnapshot.`{root}` (a BIGINT, b BIGINT) "
        "CLUSTER BY (a, b)",
    )
    t = SnapshotTable(spark, root)
    assert t.detail()["properties"]["cluster.by"] == "a,b"
    t.commit_append(
        spark.range(4096).select(
            F.col("id").alias("a"),
            ((F.col("id") * 2654435761) % 4096).alias("b"),
        ).repartition(8),
        stats_cols=["a", "b"],
    )
    # clustered layout: a mid-range probe on EITHER column prunes
    keep_a, total = t.pruned_files("a", 100, 120)
    keep_b, _ = t.pruned_files("b", 100, 120)
    assert total >= 4
    assert len(keep_a) < total and len(keep_b) < total
    # SHOW CREATE carries the declaration (as the banked property)
    ddl = snapshot_sql(
        spark, f"SHOW CREATE TABLE pysnapshot.`{root}`"
    ).collect()[0]["createtab_stmt"]
    assert "'cluster.by' = 'a,b'" in ddl


def test_sql_column_clause_split_survives_comparisons(spark):
    """A comparison `>` inside a DEFAULT/GENERATED expression must not
    close a phantom angle bracket and leak the expr's commas to the
    column split."""
    root = _tmp("cmpclause")
    snapshot_sql(
        spark,
        f"CREATE TABLE pysnapshot.`{root}` "
        "(k BIGINT, v BIGINT DEFAULT if(1 > 2, 3, 4), "
        "m MAP<STRING,INT>)",
    )
    snapshot_sql(spark, f"INSERT INTO pysnapshot.`{root}` (k) VALUES (9)")
    got = SnapshotTable(spark, root).read().collect()[0]
    assert (got["k"], got["v"]) == (9, 4)


def test_sql_clause_split_quotes_and_paren_between(spark):
    """A comma/paren inside a quoted DEFAULT literal must not split the
    column list; a parenthesized BETWEEN must not swallow the next
    top-level AND in EXPLAIN's conjunct split."""
    from s3_glue_redshift_guide_spark.sql_dml import (
        _parse_column_clauses,
        _split_conjuncts,
    )

    plain, defaults, _g, _i = _parse_column_clauses(
        "k BIGINT, tag STRING DEFAULT 'a,b', u STRING DEFAULT '(x'"
    )
    assert plain == "`k` BIGINT, `tag` STRING, `u` STRING"
    assert defaults == {"tag": "'a,b'", "u": "'(x'"}
    assert _split_conjuncts("(a BETWEEN 1 AND 2) AND k = 5") == [
        "(a BETWEEN 1 AND 2)", "k = 5"
    ]
    # executable end-to-end
    root = _tmp("quotedefault")
    snapshot_sql(
        spark,
        f"CREATE TABLE pysnapshot.`{root}` "
        "(k BIGINT, tag STRING DEFAULT 'a,b')",
    )
    snapshot_sql(spark, f"INSERT INTO pysnapshot.`{root}` (k) VALUES (1)")
    assert SnapshotTable(spark, root).read().collect()[0]["tag"] == "a,b"


# ------------- general SELECT over snapshot tables (round 9) -----------
def test_select_general_join_cte_and_time_travel(spark):
    import tempfile

    from s3_glue_redshift_guide_spark.sources.snapshots import (
        SnapshotTable,
    )

    a = SnapshotTable(spark, tempfile.mkdtemp(prefix="selg2_a_"))
    a.commit_append(
        spark.createDataFrame([(1, "x"), (2, "y")], "k int, s string")
    )
    b = SnapshotTable(spark, tempfile.mkdtemp(prefix="selg2_b_"))
    b.commit_append(
        spark.createDataFrame(
            [(1, 10), (2, 20), (1, 30)], "k int, v int"
        )
    )
    got = snapshot_sql(
        spark,
        "WITH t AS (SELECT b.k, b.v FROM "
        f"pysnapshot.`{b.root}` b WHERE b.v > 15) "
        f"SELECT a.s AS label, sum(t.v) AS total "
        f"FROM pysnapshot.`{a.root}` a JOIN t ON a.k = t.k "
        "GROUP BY a.s ORDER BY label",
    ).collect()
    assert [(r.label, r.total) for r in got] == [("x", 30), ("y", 20)]
    # literal masking: a quoted 'pysnapshot.`fake`' is data
    n = snapshot_sql(
        spark,
        f"SELECT count(*) AS n FROM pysnapshot.`{a.root}` "
        "WHERE s <> 'pysnapshot.`fake`'",
    ).collect()[0].n
    assert n == 2
    # time travel inside a general SELECT
    a.commit_append(spark.createDataFrame([(3, "z")], "k int, s string"))
    n1 = snapshot_sql(
        spark,
        "SELECT count(*) AS n FROM "
        f"pysnapshot.`{a.root}` VERSION AS OF 1",
    ).collect()[0].n
    assert n1 == 2


def test_select_general_timestamp_tag_branch_refs(spark):
    import tempfile

    from s3_glue_redshift_guide_spark.sources.snapshots import (
        SnapshotTable,
    )

    t = SnapshotTable(
        spark,
        tempfile.mkdtemp(prefix="selg3_"),
        clock=iter(range(100, 200)).__next__,
    )
    t.commit_append(spark.createDataFrame([(1,), (2,)], "k int"))
    t.create_tag("v1")
    t.commit_append(spark.createDataFrame([(3,)], "k int"))
    n_tag = snapshot_sql(
        spark,
        f"SELECT count(*) AS n FROM pysnapshot.`{t.root}` TAG 'v1'",
    ).collect()[0].n
    assert n_tag == 2
    # timestamp travel: the injected clock stamps commit 1 at t=100
    # (as-of picks the newest version stamped <= the cutoff)
    n_ts = snapshot_sql(
        spark,
        "SELECT count(*) AS n FROM "
        f"pysnapshot.`{t.root}` TIMESTAMP AS OF '1970-01-01T00:01:40'",
    ).collect()[0].n
    assert n_ts == 2
    t.create_branch("wip")
    t.branch("wip").commit_append(
        spark.createDataFrame([(9,)], "k int")
    )
    n_branch = snapshot_sql(
        spark,
        "SELECT max(k) AS m FROM "
        f"pysnapshot.`{t.root}` BRANCH 'wip'",
    ).collect()[0].m
    assert n_branch == 9
    assert t.read().count() == 3  # main untouched


# ------------- round 10: snapshot refs inside verb bodies --------------
def test_sql_insert_select_reads_snapshot_ref(spark):
    src = SnapshotTable(spark, _tmp("bodysrc"))
    src.commit_append(_kv(spark, 10))
    src.commit_append(_kv(spark, 10, start=10))  # v2: 20 rows
    dst = SnapshotTable(spark, _tmp("bodydst"))
    dst.commit_append(_kv(spark, 0))
    snapshot_sql(
        spark,
        f"INSERT INTO pysnapshot.`{dst.root}` SELECT k, v FROM "
        f"pysnapshot.`{src.root}` WHERE k < 15",
    )
    assert _rows(dst) == [(k, 2 * k) for k in range(15)]
    # time travel in the body: VERSION AS OF 1 sees only the first 10
    snapshot_sql(
        spark,
        f"INSERT INTO pysnapshot.`{dst.root}` SELECT k + 100, v FROM "
        f"pysnapshot.`{src.root}` VERSION AS OF 1",
    )
    assert dst.read().filter(F.col("k") >= 100).count() == 10


def test_sql_merge_using_bare_snapshot_ref(spark):
    tgt = SnapshotTable(spark, _tmp("mrgtgt"))
    tgt.commit_append(_kv(spark, 20))
    src = SnapshotTable(spark, _tmp("mrgsrc"))
    src.commit_append(
        spark.range(10, 30).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("v")
        )
    )
    snapshot_sql(
        spark,
        f"""MERGE INTO pysnapshot.`{tgt.root}` t
            USING pysnapshot.`{src.root}` s
            ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET v = s.v
            WHEN NOT MATCHED THEN INSERT *""",
    )
    assert _rows(tgt) == [
        (k, 2 * k) for k in range(10)
    ] + [(k, 7 * k) for k in range(10, 30)]


def test_sql_ctas_body_reads_snapshot_ref(spark):
    src = SnapshotTable(spark, _tmp("ctassrc"))
    src.commit_append(_kv(spark, 30))
    root = _tmp("ctasdst") + "/t"
    snapshot_sql(
        spark,
        f"CREATE TABLE pysnapshot.`{root}` AS SELECT k, v FROM "
        f"pysnapshot.`{src.root}` WHERE k % 3 = 0",
    )
    t = SnapshotTable(spark, root)
    assert _rows(t) == [(k, 2 * k) for k in range(0, 30, 3)]


def test_sql_merge_subquery_body_reads_snapshot_ref(spark):
    tgt = SnapshotTable(spark, _tmp("mrg2tgt"))
    tgt.commit_append(_kv(spark, 10))
    src = SnapshotTable(spark, _tmp("mrg2src"))
    src.commit_append(_kv(spark, 20))
    snapshot_sql(
        spark,
        f"""MERGE INTO pysnapshot.`{tgt.root}` t
            USING (SELECT k, v + 1 AS v FROM
                   pysnapshot.`{src.root}` WHERE k >= 5) s
            ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET v = s.v
            WHEN NOT MATCHED THEN INSERT *""",
    )
    assert _rows(tgt) == [(k, 2 * k) for k in range(5)] + [
        (k, 2 * k + 1) for k in range(5, 20)
    ]


def test_sql_body_literal_pysnapshot_is_data_not_ref(spark):
    dst = SnapshotTable(spark, _tmp("litdst"))
    dst.create_table("`k` bigint, `s` string")
    src = SnapshotTable(spark, _tmp("litsrc"))
    src.commit_append(spark.range(3).select(F.col("id").alias("k")))
    snapshot_sql(
        spark,
        f"INSERT INTO pysnapshot.`{dst.root}` SELECT k, "
        f"'pysnapshot.`fake`' FROM pysnapshot.`{src.root}`",
    )
    rows = sorted(
        (r["k"], r["s"]) for r in dst.read().collect()
    )
    assert rows == [(i, "pysnapshot.`fake`") for i in range(3)]


# ---------- round 10: connector table stats -> auto-broadcast ----------
def test_select_general_auto_broadcasts_small_refs(spark):
    from s3_glue_redshift_guide_spark.sql_dml import snapshot_sql

    dim = SnapshotTable(spark, _tmp("bcdim"))
    dim.commit_append(
        spark.range(10).select(
            F.col("id").alias("k"), F.lit("x").alias("tag")
        )
    )
    fact = SnapshotTable(spark, _tmp("bcfact"))
    fact.commit_append(_kv(spark, 5000))
    q = (
        f"SELECT f.k, d.tag, f.v FROM pysnapshot.`{fact.root}` f "
        f"JOIN pysnapshot.`{dim.root}` d ON d.k = f.k"
    )
    df = snapshot_sql(spark, q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1500]
    # threshold -1 disables the hint: the same query falls back to the
    # stats-less default (no broadcast decision injected by us)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df2 = snapshot_sql(spark, q)
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan2, plan2[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# --------------------- round 10: INSERT OVERWRITE ----------------------
def test_sql_insert_overwrite_replaces_table_atomically(spark):
    t = SnapshotTable(spark, _tmp("ovw"))
    t.commit_append(_kv(spark, 20))
    v_before = t.current_version()
    snapshot_sql(
        spark,
        f"INSERT OVERWRITE pysnapshot.`{t.root}` "
        "SELECT id AS k, id * 5 AS v FROM range(100, 110)",
    )
    assert _rows(t) == [(k, 5 * k) for k in range(100, 110)]
    # exactly one commit; the old snapshot is still readable
    assert t.current_version() == v_before + 1
    assert t.read(version=v_before).count() == 20
    # TABLE keyword + body reading a snapshot ref
    src = SnapshotTable(spark, _tmp("ovwsrc"))
    src.commit_append(_kv(spark, 7))
    snapshot_sql(
        spark,
        f"INSERT OVERWRITE TABLE pysnapshot.`{t.root}` "
        f"SELECT k, v FROM pysnapshot.`{src.root}` WHERE k >= 2",
    )
    assert _rows(t) == [(k, 2 * k) for k in range(2, 7)]


def test_sql_insert_overwrite_arity_guard(spark):
    t = SnapshotTable(spark, _tmp("ovw2"))
    t.commit_append(_kv(spark, 3))
    with pytest.raises(ValueError, match="arity"):
        snapshot_sql(
            spark,
            f"INSERT OVERWRITE pysnapshot.`{t.root}` "
            "SELECT id FROM range(3)",
        )


# ------- round 10: set-op dispatch + general EXPLAIN over refs ---------
def test_sql_parenthesized_setop_over_refs(spark):
    a = SnapshotTable(spark, _tmp("setopa"))
    a.commit_append(_kv(spark, 10))
    b = SnapshotTable(spark, _tmp("setopb"))
    b.commit_append(_kv(spark, 15))
    df = snapshot_sql(
        spark,
        f"(SELECT k FROM pysnapshot.`{b.root}`) EXCEPT "
        f"(SELECT k FROM pysnapshot.`{a.root}`)",
    )
    assert sorted(r["k"] for r in df.collect()) == [10, 11, 12, 13, 14]


def test_sql_general_explain_over_refs(spark):
    a = SnapshotTable(spark, _tmp("gexp"))
    a.commit_append(_kv(spark, 10))
    df = snapshot_sql(
        spark,
        f"EXPLAIN SELECT k, sum(v) AS sv FROM pysnapshot.`{a.root}` "
        "WHERE k > 3 GROUP BY k",
    )
    plan = df.collect()[0]["plan"]
    assert "HashAggregate" in plan or "Aggregate" in plan
    assert "pysnapshot" in plan  # connector scan visible in the plan


def test_sql_insert_overwrite_requires_full_column_coverage(spark):
    t = SnapshotTable(spark, _tmp("ovw3"))
    t.commit_append(_kv(spark, 3))
    with pytest.raises(ValueError, match="every table column"):
        snapshot_sql(
            spark,
            f"INSERT OVERWRITE pysnapshot.`{t.root}` (k) "
            "SELECT id FROM range(3)",
        )


def test_sql_merge_using_time_travelled_ref(spark):
    tgt = SnapshotTable(spark, _tmp("mrgtt"))
    tgt.commit_append(_kv(spark, 10))
    src = SnapshotTable(spark, _tmp("mrgttsrc"))
    src.commit_append(
        spark.range(5).select(
            F.col("id").alias("k"), (F.col("id") * 100).alias("v")
        )
    )  # v1
    src.commit_append(
        spark.range(5, 8).select(
            F.col("id").alias("k"), (F.col("id") * 100).alias("v")
        )
    )  # v2
    snapshot_sql(
        spark,
        f"""MERGE INTO pysnapshot.`{tgt.root}` t
            USING pysnapshot.`{src.root}` VERSION AS OF 1 s
            ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET v = s.v""",
    )
    # only v1's five keys updated — v2's rows invisible to the merge
    assert _rows(tgt) == [(k, 100 * k) for k in range(5)] + [
        (k, 2 * k) for k in range(5, 10)
    ]
