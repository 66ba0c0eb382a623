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
