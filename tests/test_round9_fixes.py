"""Regression tests for the five ADVICE-r8 defects.

1. (medium) Streaming near-dup filter: an all-duplicate/empty FIRST
   epoch publishes a files-less metadata-only v1; a later non-empty
   epoch must not wedge on reading the schemaless index.
2. _split_conjuncts must be string-literal aware: an AND / paren /
   BETWEEN inside a quoted literal is text, not an operator.
3. SHOW CREATE TABLE must escape quotes in TBLPROPERTIES values and
   expose a statement LIST (a constraint expression may contain ';').
4. A malformed ``cluster.by`` table property (settable via SET
   TBLPROPERTIES, bypassing the CLUSTER BY arity check) must raise at
   append time, not silently skip the declared layout.
5. analyze_histograms on an all-NULL column must raise a ValueError
   naming the column (not float(None)'s TypeError).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import SnapshotTable
from s3_glue_redshift_guide_spark.sql_dml import _split_conjuncts
from s3_glue_redshift_guide_spark.streaming.neardup import (
    StreamingNearDupFilter,
)


def _t(spark, prefix="r9fix_"):
    return SnapshotTable(spark, tempfile.mkdtemp(prefix=prefix))


# ---------------------------------------------------------------- 1 --
def test_neardup_stream_survives_empty_first_epoch(spark):
    root = tempfile.mkdtemp(prefix="r9ndup_")
    f = StreamingNearDupFilter(spark, root, threshold=0.5)
    empty = spark.createDataFrame([], "doc_id long, text string")
    f.process_batch(empty, 0)  # metadata-only v1, zero files, no schema
    t = SnapshotTable(spark, root)
    assert t.current_version() == 1
    assert t.txn_watermark("neardup_stream") == 0
    batch = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    f.process_batch(batch, 1)  # pre-fix: ValueError on schemaless read
    assert t.read().select("doc").count() == 1
    # and the standing index now engages: a near-identical doc drops
    f.process_batch(
        spark.createDataFrame(
            [(2, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        ),
        2,
    )
    assert [r.doc for r in t.read().select("doc").collect()] == [1]


def test_neardup_stream_all_dup_first_epoch_with_self_pair(spark):
    # both rows of epoch 0 are near-identical: the larger id drops but
    # the smaller survives, so this exercises the normal first-epoch
    # path; then an ALL-duplicate epoch advances the watermark only
    root = tempfile.mkdtemp(prefix="r9ndup2_")
    f = StreamingNearDupFilter(spark, root, threshold=0.5)
    f.process_batch(
        spark.createDataFrame(
            [
                (7, "alpha beta gamma delta epsilon zeta"),
                (9, "alpha beta gamma delta epsilon zeta"),
            ],
            "doc_id long, text string",
        ),
        0,
    )
    t = SnapshotTable(spark, root)
    assert [r.doc for r in t.read().select("doc").collect()] == [7]
    f.process_batch(
        spark.createDataFrame(
            [(11, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        ),
        1,
    )
    assert t.txn_watermark("neardup_stream") == 1
    assert [r.doc for r in t.read().select("doc").collect()] == [7]


# ---------------------------------------------------------------- 2 --
def test_split_conjuncts_literal_never_splits():
    got = _split_conjuncts("name = 'A AND B' AND x > 3")
    assert got == ["name = 'A AND B'", "x > 3"]


def test_split_conjuncts_paren_and_between_in_literal():
    assert _split_conjuncts(
        "note = '(a AND b)' AND y BETWEEN 1 AND 2"
    ) == ["note = '(a AND b)'", "y BETWEEN 1 AND 2"]
    assert _split_conjuncts("s = 'x BETWEEN 1' AND t = 2") == [
        "s = 'x BETWEEN 1'",
        "t = 2",
    ]


# ---------------------------------------------------------------- 3 --
def test_show_create_escapes_property_quotes_and_lists_statements(
    spark,
):
    t = _t(spark, "r9ddl_")
    t.commit_append(
        spark.createDataFrame([(1, "x")], "k int, v string")
    )
    t.set_tblproperties({"comment": "it's a table"})
    t.add_constraint("k_pos", "k > 0")
    stmts = t.create_table_statements()
    assert isinstance(stmts, list) and len(stmts) == 2
    assert "'it''s a table'" in stmts[0]
    assert stmts[1].startswith("ALTER TABLE")
    # the joined display form still carries both
    ddl = t.create_table_ddl()
    assert "ADD CONSTRAINT k_pos" in ddl


# ---------------------------------------------------------------- 4 --
def test_malformed_cluster_by_property_raises_on_append(spark):
    # round 10 generalized cluster.by to 2-4 columns (VERDICT-r9 #5),
    # so the malformed cases are now 1 column and >4 columns
    for bad in ("a", "a,b,c,a2,b2"):
        t = _t(spark, "r9cb_")
        t.commit_append(
            spark.createDataFrame(
                [(1, 2, 3, 4, 5)],
                "a int, b int, c int, a2 int, b2 int",
            )
        )
        t.set_tblproperties({"cluster.by": bad})
        with pytest.raises(ValueError, match="cluster.by"):
            t.commit_append(
                spark.createDataFrame(
                    [(6, 7, 8, 9, 10)],
                    "a int, b int, c int, a2 int, b2 int",
                )
            )


def test_two_column_cluster_by_property_still_applies(spark):
    t = _t(spark, "r9cb2_")
    t.commit_append(
        spark.createDataFrame([(1, 2)], "a int, b int")
    )
    t.set_tblproperties({"cluster.by": "a,b"})
    t.commit_append(spark.createDataFrame([(3, 4)], "a int, b int"))
    assert t.read().count() == 2


# ---------------------------------------------------------------- 5 --
def test_histogram_all_null_column_raises_named_error(spark):
    t = _t(spark, "r9hist_")
    t.commit_append(
        spark.createDataFrame(
            [(1, None), (2, None)], "k int, dead double"
        )
    )
    with pytest.raises(ValueError, match="dead"):
        t.analyze_histograms(["dead"])
    # partial NULLs remain fine
    t2 = _t(spark, "r9hist2_")
    t2.commit_append(
        spark.createDataFrame(
            [(1, 1.0), (2, None), (3, 3.0)], "k int, x double"
        )
    )
    t2.analyze_histograms(["x"], n_bins=2)
    assert t2.estimate_rows("x", 0.0, 4.0) > 0
