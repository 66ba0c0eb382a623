"""The join advisor must reinstate the size-based broadcast decision
Catalyst cannot make for statistics-less Python DataSource reads."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.operators.advisor import (
    advise_join,
    smart_join,
    table_size_bytes,
)
from s3_glue_redshift_guide_spark.sources.pyds import (
    register_snapshot_source,
)
from s3_glue_redshift_guide_spark.sources.snapshots import SnapshotTable


def _tmp(pfx):
    return tempfile.mkdtemp(prefix=f"adv_{pfx}_")


@pytest.fixture()
def pair(spark):
    register_snapshot_source(spark)
    small = SnapshotTable(spark, _tmp("small"))
    small.commit_append(
        spark.range(25).select(
            F.col("id").alias("k"), F.col("id").alias("w")
        ).coalesce(1)
    )
    big = SnapshotTable(spark, _tmp("big"))
    big.commit_append(
        spark.range(200_000).select(
            (F.col("id") % 25).alias("k"), F.col("id").alias("v")
        ).coalesce(4)
    )
    return small, big


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_connector_reads_do_not_auto_broadcast(spark, pair):
    """The gap the advisor closes: without the hint, a 25-row
    connector-read dimension sort-merge-joins."""
    small, big = pair
    s = spark.read.format("pysnapshot").option("root", small.root).load()
    b = spark.read.format("pysnapshot").option("root", big.root).load()
    assert "BroadcastHashJoin" not in _plan(b.join(s, "k"))


def test_advisor_flips_to_broadcast_and_preserves_results(spark, pair):
    small, big = pair
    s = spark.read.format("pysnapshot").option("root", small.root).load()
    b = spark.read.format("pysnapshot").option("root", big.root).load()
    adv = advise_join(spark, big.root, small.root)
    assert adv["strategy"] == "broadcast_right"
    assert 0 < adv["right_bytes"] <= adv["threshold_bytes"]
    j = smart_join(b, s, "k", adv)
    assert "BroadcastHashJoin" in _plan(j)
    assert j.count() == 200_000
    # flipped orientation broadcasts the other side
    adv2 = advise_join(spark, small.root, big.root)
    assert adv2["strategy"] == "broadcast_left"
    assert "BroadcastHashJoin" in _plan(smart_join(s, b, "k", adv2))


def test_advisor_refuses_big_broadcasts(spark, pair):
    small, big = pair
    assert (
        advise_join(spark, big.root, big.root, threshold=1000)["strategy"]
        == "shuffle"
    )
    # an empty table is a KNOWN zero: broadcast it (trivial)
    empty = SnapshotTable(spark, _tmp("empty"))
    assert table_size_bytes(empty.root) == 0
    assert (
        advise_join(spark, big.root, empty.root)["strategy"]
        == "broadcast_right"
    )
    # sizes are banked in the manifest (round 6), so a vanished file
    # no longer makes the size unknown — the banked bytes are exact
    # (immutable files). The UNKNOWN path survives for pre-banking
    # manifests: strip the sizes family, vanish a file, and the
    # advisor must refuse to broadcast — an undercount would
    # green-light broadcasting a huge side.
    import json
    import os

    victim = SnapshotTable(spark, _tmp("victim"))
    victim.commit_append(
        spark.range(10).select(F.col("id").alias("k")).coalesce(1)
    )
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        load_manifest,
    )

    banked = table_size_bytes(victim.root)
    os.unlink(load_manifest(victim.root, 1)["files"][0])
    assert table_size_bytes(victim.root) == banked  # still exact
    p = victim._manifest_path(1)
    m = json.load(open(p))
    m.pop("sizes")
    os.unlink(p)
    json.dump(m, open(p, "w"))
    assert table_size_bytes(victim.root) is None
    assert (
        advise_join(spark, big.root, victim.root)["strategy"]
        == "shuffle"
    )
