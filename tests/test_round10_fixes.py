"""Regression tests for the four ADVICE-r9 defects.

1. (low) register_bucketed_view ran DROP TABLE IF EXISTS on the
   caller-supplied name unconditionally — a name collision with an
   existing managed/user table silently destroyed it. Now: refuse any
   pre-existing table whose location is not a _bucket_views farm;
   replacing our own stale view still works.
2. (low) SnapshotStreamReader.partitions(start, end) with end < start
   (a capped latestOffset falling behind a restored checkpoint, should
   a future engine reorder the probe) must serve an empty batch WITHOUT
   advancing the cursor — no offset-log regression / re-delivery. Also
   pins the currently-traced call order: latestOffset on a fresh
   availableNow stream bases the cap on startingVersion.
3. (low) join_copartitioned_snapshots leaked two permanent catalog
   tables + scratch snapshot dirs per execution; now cleaned in a
   try/finally.
4. (low) the window-accounting comment miscount — superseded by the
   round-10 rotation rewrite in queries/__init__.py (no code to test;
   the rotation itself is pinned by test_registry_window.py).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import SnapshotTable


def _bucketed(spark, prefix):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix=prefix))
    t.set_tblproperties({"bucket.by": "k:4"})
    t.commit_append(
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
    )
    return t


# ---------------------------------------------------------------- 1 --
def test_bucketed_view_refuses_foreign_table(spark):
    t = _bucketed(spark, "r10bv_")
    name = "r10_precious_table"
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    spark.range(5).write.saveAsTable(name)
    try:
        with pytest.raises(ValueError, match="not created by"):
            t.register_bucketed_view(name)
        # the victim survives intact
        assert spark.table(name).count() == 5
    finally:
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")


def test_bucketed_view_still_replaces_its_own(spark):
    t = _bucketed(spark, "r10bv2_")
    name = "r10_own_view"
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    try:
        t.register_bucketed_view(name)
        t.commit_append(
            spark.range(100, 150).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
        )
        t.register_bucketed_view(name)  # replace our stale view: OK
        assert spark.table(name).count() == 150
    finally:
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")


# ---------------------------------------------------------------- 2 --
def test_stream_partitions_inverted_range_is_empty_no_advance(spark):
    from s3_glue_redshift_guide_spark.sources.pyds import (
        SnapshotCdfPartition,
        SnapshotChangeFeedStreamReader,
        SnapshotStreamReader,
    )

    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="r10inv_"))
    for i in range(3):
        t.commit_append(spark.range(i * 10, i * 10 + 10))
    for cls in (SnapshotStreamReader, SnapshotChangeFeedStreamReader):
        r = cls.__new__(cls)
        # minimal state partitions() touches (bypass __init__'s
        # schema/session plumbing — this is a pure cursor-logic test)
        r.root = t.root
        r.skip_change = True
        r._cursor = None
        r._start_version = 0
        r._max_versions = None
        r._max_files = None
        assert r.partitions({"version": 3}, {"version": 1}) == []
        assert r._cursor is None, "inverted range must not advance"
        # a sane range still works afterwards and advances normally
        parts = r.partitions({"version": 0}, {"version": 3})
        assert parts, "sane range must yield the committed files"
        assert r._cursor == 3


def test_fresh_availablenow_latestoffset_bases_on_startingversion(spark):
    """Pin the traced engine call order this guard complements: a fresh
    stream's latestOffset (cursor None) caps from startingVersion."""
    from s3_glue_redshift_guide_spark.sources.pyds import (
        SnapshotStreamReader,
    )

    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="r10adm_"))
    for i in range(5):
        t.commit_append(spark.range(i * 10, i * 10 + 10))
    r = SnapshotStreamReader.__new__(SnapshotStreamReader)
    r.root = t.root
    r._cursor = None
    r._start_version = 1
    r._max_versions = 2
    r._max_files = None
    assert r.latestOffset() == {"version": 3}  # 1 + cap 2, not head 5


# ---------------------------------------------------------------- 3 --
def test_copartitioned_join_cleans_catalog_and_scratch(spark):
    from tests.conftest import SF_SMOKE

    from s3_glue_redshift_guide_spark.queries import REGISTRY

    before = {
        r.name for r in spark.catalog.listTables()
        if r.name.startswith("copart_")
    }
    REGISTRY["join_copartitioned_snapshots"].fn(spark, SF_SMOKE).collect()
    after = {
        r.name for r in spark.catalog.listTables()
        if r.name.startswith("copart_")
    }
    assert after == before, f"leaked catalog tables: {after - before}"


# ------------- round 10: N-column CLUSTER BY (VERDICT-r9 #5) ----------
def test_cluster_by_three_columns_via_sql(spark):
    from s3_glue_redshift_guide_spark.sql_dml import snapshot_sql

    root = tempfile.mkdtemp(prefix="r10cb3_") + "/t"
    spark.range(2000).select(
        F.col("id").alias("a"),
        (F.col("id") * 3 % 1000).alias("b"),
        (F.col("id") % 50).alias("c"),
    ).createOrReplaceTempView("r10cb3_src")
    snapshot_sql(
        spark,
        f"CREATE TABLE pysnapshot.`{root}` CLUSTER BY (a, b, c) AS "
        "SELECT /*+ REPARTITION(8) */ a, b, c FROM r10cb3_src",
    )
    t = SnapshotTable(spark, root)
    # stats banked automatically for all three clustered columns,
    # and each dimension prunes to a strict subset
    for col, lo, hi in (("a", 0, 100), ("b", 0, 50), ("c", 7, 7)):
        keep, total = t.pruned_files(col, lo, hi)
        assert 0 < len(keep) < total, (col, len(keep), total)
    # zone maps never lose a row
    assert (
        t.read_where("c", 7, 7).filter(F.col("c") == 7).count() == 40
    )


def test_cluster_by_five_columns_rejected_in_sql(spark):
    from s3_glue_redshift_guide_spark.sql_dml import snapshot_sql

    root = tempfile.mkdtemp(prefix="r10cb5_") + "/t"
    with pytest.raises(ValueError, match="2-4 columns"):
        snapshot_sql(
            spark,
            f"CREATE TABLE pysnapshot.`{root}` (a int, b int, c int, "
            "d int, e int) CLUSTER BY (a, b, c, d, e)",
        )


# ------- round 10: MinHash band-bucket cap (measured sf10 blow-up) -----
def test_minhash_band_bucket_cap_bounds_giant_clusters(spark):
    from s3_glue_redshift_guide_spark.llm.dedup import (
        minhash_lsh_candidates,
        minhash_near_dup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(200)]  # one giant dup cluster
    rows += [(1000 + i, f"unique text number {i} with words {i * 7} "
                        f"{i * 13} {i * 29} distinct") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_lsh_candidates(
        df, "doc_id", "text", max_band_bucket=16
    )
    n_capped = capped.count()
    # star edges: the 200-doc cluster contributes 199 edges, not C(200,2)
    assert n_capped < 1000, n_capped
    # connectivity survives: every cluster member reaches the hub
    hub_edges = capped.filter(F.col("doc_a") == 0).count()
    assert hub_edges == 199
    # the verified pairs keep precision 1.0 and the full cluster
    pairs = minhash_near_dup_pairs(
        df, "doc_id", "text", threshold=0.5, max_band_bucket=16
    )
    assert pairs.filter(F.col("jaccard") < 0.5).count() == 0
    assert pairs.count() == 199


def test_minhash_cap_is_noop_on_small_buckets(spark):
    from s3_glue_redshift_guide_spark.llm.dedup import (
        minhash_lsh_candidates,
    )

    rows = [
        (i, f"some shared words plus token {i} and token {i + 1}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plain = sorted(
        map(tuple, minhash_lsh_candidates(df, "doc_id", "text").collect())
    )
    capped = sorted(
        map(
            tuple,
            minhash_lsh_candidates(
                df, "doc_id", "text", max_band_bucket=1000
            ).collect(),
        )
    )
    assert plain == capped


# ----- round 10: bucket.by x partition-spec mutual exclusion -----------
def test_bucket_by_and_partition_spec_mutually_exclusive(spark):
    # _write_files routes spec'd writes through the partition writer
    # (no bucket-id stamping) — both declaration orders must refuse,
    # or the bucketed-readback contract silently breaks on append
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="r10bs1_"))
    t.set_tblproperties({"bucket.by": "k:4"})
    with pytest.raises(ValueError, match="partition spec"):
        t.set_partition_spec(["v"])

    t2 = SnapshotTable(spark, tempfile.mkdtemp(prefix="r10bs2_"))
    t2.commit_append(
        spark.createDataFrame([(1, 2)], "k int, v int")
    )
    t2.set_partition_spec(["v"])
    with pytest.raises(ValueError, match="bucket.by"):
        t2.set_tblproperties({"bucket.by": "k:4"})
    # dropping the spec re-opens the bucket path... on an empty-file
    # table only (existing files lack bucket ids); the existing-files
    # guard still applies and is the message the user sees
    with pytest.raises(ValueError, match="existing files"):
        t2.set_partition_spec([])
        t2.set_tblproperties({"bucket.by": "k:4"})
