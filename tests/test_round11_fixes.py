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
