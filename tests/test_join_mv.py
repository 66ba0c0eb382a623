"""ChangeFeedJoinAggView (X17) edge cases the registry row doesn't hit:
no-op refresh, right-before-left bootstrap order, fully-retracted group
vanishing, LogTruncated full-rebuild fallback, and cursor atomicity
(both cursors land in the same state commit)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import SnapshotTable


def _fixture(spark):
    # deferred: operators.mv builds Column expressions at module import,
    # which needs the active session the fixture just created
    from s3_glue_redshift_guide_spark.operators.mv import (
        ChangeFeedJoinAggView,
    )

    left = SnapshotTable(spark, tempfile.mkdtemp(prefix="jmv_l_"))
    right = SnapshotTable(spark, tempfile.mkdtemp(prefix="jmv_r_"))
    mv = ChangeFeedJoinAggView(
        spark,
        left,
        right,
        tempfile.mkdtemp(prefix="jmv_s_"),
        left_on=["k"],
        right_on=["rk"],
        keys=["grp"],
        measures={"n": ("count",), "s": ("sum", "x")},
    )
    return left, right, mv


def _rows(spark, data, schema):
    return spark.createDataFrame(data, schema)


def _recompute(left, right):
    return (
        left.read()
        .join(right.read(), F.col("k") == F.col("rk"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
        )
    )


def _assert_matches(mv, left, right):
    got = mv.read().select("grp", "n", "s")
    want = _recompute(left, right)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_refresh_noop_and_bootstrap(spark):
    left, right, mv = _fixture(spark)
    right.commit_append(
        _rows(spark, [(1, "a"), (2, "b")], "rk long, grp string")
    )
    left.commit_append(
        _rows(spark, [(1, 10), (1, 20), (2, 30)], "k long, x long")
    )
    assert mv.refresh() == (1, 1)
    _assert_matches(mv, left, right)
    v_state = mv.state.current_version()
    assert mv.refresh() == (1, 1)  # nothing moved
    assert mv.state.current_version() == v_state  # no state commit


def test_full_retraction_vanishes_group(spark):
    left, right, mv = _fixture(spark)
    right.commit_append(
        _rows(spark, [(1, "a"), (2, "b")], "rk long, grp string")
    )
    left.commit_append(
        _rows(spark, [(1, 10), (2, 30)], "k long, x long")
    )
    mv.refresh()
    right.delete_where(F.col("grp") == "b")  # retracts key 2's join row
    mv.refresh()
    got = mv.read()
    assert got.filter(F.col("grp") == "b").count() == 0
    _assert_matches(mv, left, right)


def test_both_sides_one_refresh(spark):
    left, right, mv = _fixture(spark)
    right.commit_append(
        _rows(spark, [(1, "a"), (2, "b"), (3, "c")], "rk long, grp string")
    )
    left.commit_append(
        _rows(spark, [(1, 10), (2, 30), (3, 5)], "k long, x long")
    )
    mv.refresh()
    # both sides churn before one refresh: the telescoping case
    left.commit_append(_rows(spark, [(2, 7), (3, 1)], "k long, x long"))
    left.update_where(F.col("k") == 1, {"x": F.lit(99).cast("long")})
    right.update_where(F.col("rk") == 3, {"grp": F.lit("moved")})
    mv.refresh()
    _assert_matches(mv, left, right)


def test_log_truncated_rebuilds(spark):
    left, right, mv = _fixture(spark)
    right.commit_append(_rows(spark, [(1, "a")], "rk long, grp string"))
    for i in range(4):
        left.commit_append(_rows(spark, [(1, i)], "k long, x long"))
    mv.refresh()
    for i in range(4, 8):
        left.commit_append(_rows(spark, [(1, i)], "k long, x long"))
    left.vacuum(retain_versions=1)  # cursor now points past the log
    mv.refresh()
    _assert_matches(mv, left, right)


def test_cursors_publish_atomically(spark):
    left, right, mv = _fixture(spark)
    right.commit_append(_rows(spark, [(1, "a")], "rk long, grp string"))
    left.commit_append(_rows(spark, [(1, 5)], "k long, x long"))
    mv.refresh()
    # one state commit carries BOTH cursors
    assert mv.state.txn_watermark(mv.CURSOR_L) == 1
    assert mv.state.txn_watermark(mv.CURSOR_R) == 1
    left.commit_append(_rows(spark, [(1, 6)], "k long, x long"))
    right.commit_append(_rows(spark, [(2, "b")], "rk long, grp string"))
    before = mv.state.current_version()
    mv.refresh()
    assert mv.state.current_version() == before + 1  # exactly one commit
    assert mv.state.txn_watermark(mv.CURSOR_L) == 2
    assert mv.state.txn_watermark(mv.CURSOR_R) == 2


def test_float_sum_rejected(spark):
    left, right, mv = _fixture(spark)
    right.commit_append(_rows(spark, [(1, "a")], "rk long, grp string"))
    left.commit_append(
        _rows(spark, [(1, 1.5)], "k long, x double")
    )
    with pytest.raises(ValueError, match="not exactly retractable"):
        mv.refresh()


# ------------------------------------------ streaming maintenance (r8)
def test_streaming_join_mv_matches_recompute(spark):
    """Two CDF streams fold through the single-side telescoping
    identities (ΔL ⋈ R@rc, L@lc ⋈ ΔR); after draining both, the state
    equals the head ⋈ head recompute — including deletes."""
    left, right, mv = _fixture(spark)
    ckpt_l = tempfile.mkdtemp(prefix="jmv_ck_l_")
    ckpt_r = tempfile.mkdtemp(prefix="jmv_ck_r_")
    right.commit_append(
        _rows(spark, [(1, "a"), (2, "b")], "rk long, grp string")
    )
    left.commit_append(
        _rows(spark, [(1, 10), (1, 20), (2, 30)], "k long, x long")
    )
    mv.refresh_streams(ckpt_l, ckpt_r, available_now=True)
    _assert_matches(mv, left, right)
    # churn on both sides, then resume the SAME checkpoints: only the
    # new commits fold (cursor idempotence across restarts)
    left.commit_append(_rows(spark, [(2, 5)], "k long, x long"))
    left.delete_where(F.col("x") == 10)
    right.commit_append(
        _rows(spark, [(3, "a")], "rk long, grp string")
    )
    left.commit_append(_rows(spark, [(3, 7)], "k long, x long"))
    mv.refresh_streams(ckpt_l, ckpt_r, available_now=True)
    _assert_matches(mv, left, right)
    lc, rc = mv._cursors()
    assert lc == left.current_version()
    assert rc == right.current_version()
    # an idle drain folds nothing and moves no cursor
    sv = mv.state.current_version()
    mv.refresh_streams(ckpt_l, ckpt_r, available_now=True)
    assert mv.state.current_version() == sv


def test_streaming_join_mv_left_first_bootstrap(spark):
    """Left stream drains before the right table has EVER folded: the
    left fold joins an empty right multiset (cursor-only advance), and
    the later right fold restores exactness via L@lc ⋈ ΔR."""
    left, right, mv = _fixture(spark)
    ckpt_l = tempfile.mkdtemp(prefix="jmv_ck2_l_")
    ckpt_r = tempfile.mkdtemp(prefix="jmv_ck2_r_")
    left.commit_append(
        _rows(spark, [(1, 10), (2, 30)], "k long, x long")
    )
    mv.refresh_streams(ckpt_l, ckpt_r, available_now=True)
    lc, rc = mv._cursors()
    assert (lc, rc) == (1, 0)  # cursor advanced, nothing folded
    right.commit_append(
        _rows(spark, [(1, "a"), (2, "b")], "rk long, grp string")
    )
    mv.refresh_streams(ckpt_l, ckpt_r, available_now=True)
    _assert_matches(mv, left, right)


def test_crash_between_the_two_folds_restart_exactly_once(spark):
    """VERDICT-r8 directive #6: kill AFTER the left feed's fold commits
    but BEFORE the right feed drains (sides=('L',) serializes the
    kill), restart both feeds on the SAME checkpoints — the right side
    catches up, the left side replays nothing, and the state equals
    the head ⋈ head recompute. Then lose a checkpoint entirely (full
    epoch redelivery): the cursor filter drops every replayed row, the
    state version does not move — exactly-once under the hardest
    replay."""
    left, right, mv = _fixture(spark)
    ckpt_l = tempfile.mkdtemp(prefix="jmv_cr_l_")
    ckpt_r = tempfile.mkdtemp(prefix="jmv_cr_r_")
    right.commit_append(
        _rows(spark, [(1, "a"), (2, "b")], "rk long, grp string")
    )
    left.commit_append(
        _rows(spark, [(1, 10), (2, 30)], "k long, x long")
    )
    mv.refresh_streams(ckpt_l, ckpt_r, available_now=True)
    _assert_matches(mv, left, right)
    # churn both sides, then CRASH between the folds: only L drains
    left.commit_append(_rows(spark, [(1, 5)], "k long, x long"))
    right.commit_append(_rows(spark, [(3, "c")], "rk long, grp string"))
    left.commit_append(_rows(spark, [(3, 7)], "k long, x long"))
    mv.refresh_streams(
        ckpt_l, ckpt_r, available_now=True, sides=("L",)
    )
    lc, rc = mv._cursors()
    assert lc == left.current_version()
    assert rc == 1  # right never drained this round
    # the half-drained state is CONSISTENT: L@lc ⋈ R@rc exactly
    got = mv.read().select("grp", "n", "s")
    want = (
        left.read()
        .join(right.read(rc), F.col("k") == F.col("rk"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
        )
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # RESTART both feeds, same checkpoints: right catches up, left
    # replays nothing, exactness restored
    mv.refresh_streams(ckpt_l, ckpt_r, available_now=True)
    _assert_matches(mv, left, right)
    # hardest replay: brand-new checkpoints redeliver EVERY epoch;
    # the cursor filter must fold nothing and move nothing
    sv = mv.state.current_version()
    mv.refresh_streams(
        tempfile.mkdtemp(prefix="jmv_cr_l2_"),
        tempfile.mkdtemp(prefix="jmv_cr_r2_"),
        available_now=True,
    )
    assert mv.state.current_version() == sv
    _assert_matches(mv, left, right)


def test_backlog_cap_bounds_each_fold(spark):
    """maxVersionsPerTrigger on BOTH feeds (VERDICT-r8 directive #6):
    a 3-commit backlog with cap 1 folds one version per drain — the
    cursor advances stepwise and catch-up completes over repeated
    drains, each epoch's join state bounded by one commit's churn."""
    left, right, mv = _fixture(spark)
    ckpt_l = tempfile.mkdtemp(prefix="jmv_cap_l_")
    ckpt_r = tempfile.mkdtemp(prefix="jmv_cap_r_")
    right.commit_append(
        _rows(spark, [(1, "a"), (2, "b"), (3, "c")], "rk long, grp string")
    )
    for batch in ([(1, 10)], [(2, 20)], [(3, 30)]):
        left.commit_append(_rows(spark, batch, "k long, x long"))
    assert left.current_version() == 3
    cursors = []
    for _ in range(3):
        mv.refresh_streams(
            ckpt_l,
            ckpt_r,
            available_now=True,
            max_versions_per_trigger=1,
        )
        cursors.append(mv._cursors()[0])
    assert cursors == [1, 2, 3]  # one version per drain, no skips
    _assert_matches(mv, left, right)
