"""Regression tests for the VERDICT-r10 directives.

7. _rewrite_snapshot_refs masked only single-quoted literals; a
   double-quoted string containing ``pysnapshot.`…``` was rewritten
   into a temp-view reference even though Spark parses double-quoted
   text as a STRING literal by default. Both quote styles are now
   masked before the rewrite.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import SnapshotTable
from s3_glue_redshift_guide_spark.sql_dml import snapshot_sql


# ---------------------------------------------------------------- 7 --
def test_quoted_snapshot_refs_are_data_on_both_quote_styles(spark):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="r11dq_"))
    t.commit_append(spark.range(3).select(F.col("id").alias("k")))
    ref = f"pysnapshot.`{t.root}`"
    df = snapshot_sql(
        spark,
        f"SELECT k, \"{ref}\" AS dq, '{ref}' AS sq "
        f"FROM {ref} ORDER BY k",
    )
    rows = df.collect()
    assert [r.k for r in rows] == [0, 1, 2]
    # either quote style: the literal survives verbatim as DATA
    assert all(r.dq == ref for r in rows)
    assert all(r.sq == ref for r in rows)


# ---------------------------------------------------------------- 5 --
def test_read_snapshot_df_api_auto_broadcasts_small_dim(spark):
    """DataFrame-API parity for connector statistics: a star join built
    with read_snapshot() (no SQL, no manual hint) must broadcast the
    small snapshot dim — the manifest-byte sizing that round 10 gave
    the SQL surface now rides the documented read helper too."""
    from s3_glue_redshift_guide_spark.sources.pyds import read_snapshot

    dim = SnapshotTable(spark, tempfile.mkdtemp(prefix="r11bc_dim_"))
    dim.commit_append(
        spark.range(10).select(
            F.col("id").alias("k"), F.lit("x").alias("tag")
        )
    )
    fact = SnapshotTable(spark, tempfile.mkdtemp(prefix="r11bc_fact_"))
    fact.commit_append(
        spark.range(5000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
    )
    f = read_snapshot(spark, fact.root)
    d = read_snapshot(spark, dim.root)
    df = f.join(d, "k").select("k", "tag", "v")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1500]
    # threshold -1 disables the hint — stats-less default comes back
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        f2 = read_snapshot(spark, fact.root)
        d2 = read_snapshot(spark, dim.root)
        df2 = f2.join(d2, "k").select("k", "tag", "v")
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan2, plan2[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # values still exact through the hint
    rows = sorted((r.k, r.tag, r.v) for r in df.collect())
    assert rows == [(i, "x", 3 * i) for i in range(10)]


def test_read_snapshot_serves_version_and_tag_refs(spark):
    from s3_glue_redshift_guide_spark.sources.pyds import read_snapshot

    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="r11rs_"))
    v1 = t.commit_append(spark.range(4).select(F.col("id").alias("k")))
    t.create_tag("first", v1)
    t.commit_append(
        spark.range(4, 9).select(F.col("id").alias("k"))
    )
    assert read_snapshot(spark, t.root).count() == 9
    assert read_snapshot(spark, t.root, version=v1).count() == 4
    assert read_snapshot(spark, t.root, tag="first").count() == 4
