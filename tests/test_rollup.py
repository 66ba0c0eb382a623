"""Incremental rollup: folding three deltas must equal one full recompute,
state survives a no-op, and non-mergeable measures are rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.catalog import load_table
from s3_glue_redshift_guide_spark.operators.rollup import IncrementalRollup

from .conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_three_deltas_equal_full_recompute(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    ru = IncrementalRollup(
        spark,
        str(tmp_path / "rollup"),
        ["event_type"],
        {"value": ("sum", "min", "max", "count")},
    )
    # money policy: fold exact decimals, not doubles, so the incremental
    # path and the one-shot path agree bit-for-bit whatever the fold order
    dec = ev.withColumn("value", F.col("value").cast("decimal(12,2)"))
    for third in range(3):
        ru.update(dec.filter(F.col("event_id") % 3 == third))

    want = dec.groupBy("event_type").agg(
        F.sum("value").alias("sum__value"),
        F.min("value").alias("min__value"),
        F.max("value").alias("max__value"),
        F.count(F.lit(1)).alias("count__value"),
        (F.sum("value").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("avg__value"),
    )
    cols = ["event_type", "sum__value", "min__value", "max__value",
            "count__value", "avg__value"]
    assert _rows(ru.read(), cols) == _rows(want, cols)


def test_empty_delta_is_identity(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    ru = IncrementalRollup(
        spark, str(tmp_path / "r2"), ["event_type"], {"value": ("sum", "count")}
    )
    ru.update(ev)
    before = _rows(ru.read(), ["event_type", "sum__value", "count__value"])
    ru.update(ev.filter(F.lit(False)))
    after = _rows(ru.read(), ["event_type", "sum__value", "count__value"])
    assert before == after


def test_non_mergeable_measure_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="not mergeable"):
        IncrementalRollup(
            spark, str(tmp_path / "r3"), ["event_type"], {"value": ("avg",)}
        )


def test_hll_state_merges_across_deltas(spark, tmp_path):
    """The HLL measure: distinct users per event type maintained as a
    mergeable sketch across three deltas must estimate the same cardinality
    as a one-shot sketch over everything — and at smoke cardinalities the
    estimate equals the exact distinct count."""
    ev = load_table(spark, SF_SMOKE, "events")
    ru = IncrementalRollup(
        spark,
        str(tmp_path / "rollup_hll"),
        ["event_type"],
        {"user_id": ("hll",)},
    )
    for third in range(3):
        ru.update(ev.filter(F.col("event_id") % 3 == third))
    got = _rows(ru.read(), ["event_type", "approx_distinct__user_id"])
    want = _rows(
        ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("approx_distinct__user_id")
        ),
        ["event_type", "approx_distinct__user_id"],
    )
    assert got == want


def test_hist_state_incremental_equals_one_shot(spark, tmp_path):
    """The histogram state is a true monoid: three-delta fold must produce
    bin-for-bin the same vector as a single update over everything, and
    the derived p50 must bracket the exact median within one bin width."""
    ev = load_table(spark, SF_SMOKE, "events")
    cfg = {"value": (0.0, 100.0, 20)}
    inc = IncrementalRollup(
        spark, str(tmp_path / "hist_inc"), ["event_type"],
        {"value": ("hist",)}, hist_config=cfg,
    )
    for third in range(3):
        inc.update(ev.filter(F.col("event_id") % 3 == third))
    one = IncrementalRollup(
        spark, str(tmp_path / "hist_one"), ["event_type"],
        {"value": ("hist",)}, hist_config=cfg,
    )
    one.update(ev)
    got = _rows(inc.read(), ["event_type", "hist__value"])
    want = _rows(one.read(), ["event_type", "hist__value"])
    assert got == want

    from s3_glue_redshift_guide_spark.operators.rollup import (
        hist_quantile_expr,
    )

    p50 = {
        r["event_type"]: r["p"]
        for r in inc.read()
        .select(
            "event_type",
            hist_quantile_expr(
                F.col("hist__value"), 0.0, 100.0, 20, 0.5
            ).alias("p"),
        )
        .collect()
    }
    exact = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    for et, est in p50.items():
        assert abs(est - exact[et]) <= 5.0 + 1e-9, (et, est, exact[et])


def test_hist_requires_pinned_range(spark, tmp_path):
    with pytest.raises(ValueError):
        IncrementalRollup(
            spark, str(tmp_path / "x"), ["event_type"], {"value": ("hist",)}
        )


def test_hist_state_is_order_invariant(spark, tmp_path):
    """Monoid law for the histogram state: folding the same four random
    deltas in different orders must produce identical states."""
    ev = load_table(spark, SF_SMOKE, "events")
    cfg = {"value": (0.0, 100.0, 16)}
    parts = [ev.filter(F.col("event_id") % 4 == i) for i in range(4)]
    states = []
    for tag, order in (("fwd", [0, 1, 2, 3]), ("rev", [3, 1, 0, 2])):
        r = IncrementalRollup(
            spark, str(tmp_path / f"ord_{tag}"), ["event_type"],
            {"value": ("hist",)}, hist_config=cfg,
        )
        for i in order:
            r.update(parts[i])
        states.append(_rows(r.read(), ["event_type", "hist__value"]))
    assert states[0] == states[1]
