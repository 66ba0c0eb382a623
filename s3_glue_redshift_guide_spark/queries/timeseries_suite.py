"""Time-series analytics over the events table (SURVEY.md §2.11).

Five derived-analytics operators a production events pipeline runs daily —
gap-filled continuity, bar resampling, ordered funnels, cohort retention,
and statistical anomaly flags. Every one is expressed as declarative
DataFrame ops so Catalyst plans them; the scale-critical property of each:

* gap-fill: the time spine is generated PER KEY from that key's own
  bounds (``sequence`` + ``explode``), so spine size ~ keys x active span,
  never keys x global calendar; forward-fill is one partitioned window.
* OHLC resample: one hash aggregate; open/close come from a single
  ``min/max(struct(ts, tiebreak, value))`` — no self-join, no window.
* funnel: sequential-stage minima via per-stage aggregate + equi-join on
  (user, day) — shuffle keys stay fine-grained, no per-user collect.
* retention: two hash aggregates on (user) then (cohort, offset); all
  arithmetic integer/timestamp (bit-exact across engines).
* z-score: per-type stats (tiny: one row per event type) joined back —
  Catalyst broadcasts the stats side automatically.

All money-style sums go through DECIMAL (see functions/numeric.py) so the
oracle hash is order-independent; z-scores are rounded on BOTH sides
before the threshold compare so the flag decision is taken on identical
values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import load_table
from .registry import query
from .util import MONEY


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "ts_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour_ts, user_id,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS hour_value
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT user_id, min(hour_ts) AS mn, max(hour_ts) AS mx
               FROM hourly GROUP BY 1),
    spine AS (SELECT user_id,
                     unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS hour_ts
              FROM bounds)
    SELECT s.user_id, s.hour_ts,
           last_value(h.hour_value IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.hour_ts
                   ROWS UNBOUNDED PRECEDING) AS filled_value,
           CAST(h.hour_value IS NULL AS INTEGER) AS is_gap
    FROM spine s
    LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour_ts = h.hour_ts
    """,
)
def ts_gap_fill(spark, sf_dir):
    """Hourly gap-fill with forward-fill: build each user's hour spine from
    their own min/max activity hour, left-join observed hourly totals, and
    carry the last observation forward. The spine is data-driven per key
    (sequence+explode), so a key active for a day never pays for the
    table's full calendar range."""
    ev = _ev(spark, sf_dir)
    # hourly feeds TWO consumers (the per-key bounds and the spine join);
    # without a barrier Catalyst evaluates it twice = two full scans of the
    # fact table at 100 TB. localCheckpoint materializes the (small,
    # keys x active-hours) aggregate once.
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_ts"), "user_id")
        .agg(F.sum(F.col("value").cast(MONEY)).cast("double").alias("hour_value"))
        .localCheckpoint(eager=False)
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("hour_ts").alias("mn"), F.max("hour_ts").alias("mx")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias(
            "hour_ts"
        ),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("hour_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return spine.join(hourly, ["user_id", "hour_ts"], "left").select(
        "user_id",
        "hour_ts",
        F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("hour_value").isNull().cast("int").alias("is_gap"),
    )


@query(
    "ts_resample_ohlc",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS bar_start, event_type,
             ts, event_id, value
      FROM events),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY bar_start, event_type
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY bar_start, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b)
    SELECT bar_start, event_type,
           max(CASE WHEN rn_a = 1 THEN value END) AS open_v,
           max(value) AS high_v,
           min(value) AS low_v,
           max(CASE WHEN rn_d = 1 THEN value END) AS close_v,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS volume
    FROM r GROUP BY 1, 2
    """,
)
def ts_resample_ohlc(spark, sf_dir):
    """Downsample to 1-hour OHLC bars per event type. Open/close are
    selected via min/max over struct(ts, event_id, value) — lexicographic
    struct ordering with the unique event_id tiebreak makes the pick
    deterministic, and the whole bar is ONE partial-aggregatable hash
    aggregate (no window, no self-join: the oracle's row_number CTE is the
    SQL spelling of the same selection)."""
    ev = _ev(spark, sf_dir)
    first_s = F.min(F.struct("ts", "event_id", "value"))
    last_s = F.max(F.struct("ts", "event_id", "value"))
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("bar_start"), "event_type"
        )
        .agg(
            first_s.alias("__f"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            last_s.alias("__l"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(MONEY)).cast("double").alias("volume"),
        )
        .select(
            "bar_start",
            "event_type",
            F.col("__f")["value"].alias("open_v"),
            "high_v",
            "low_v",
            F.col("__l")["value"].alias("close_v"),
            "n_events",
            "volume",
        )
    )


@query(
    "ts_funnel",
    oracle="""
    WITH e AS (SELECT user_id, date_trunc('day', ts) AS day, event_type, ts
               FROM events),
    v AS (SELECT user_id, day, min(ts) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY 1, 2),
    c AS (SELECT e.user_id, e.day, min(e.ts) AS t2
          FROM e JOIN v ON e.user_id = v.user_id AND e.day = v.day
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1, 2),
    p AS (SELECT e.user_id, e.day, min(e.ts) AS t3
          FROM e JOIN c ON e.user_id = c.user_id AND e.day = c.day
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1, 2),
    fv AS (SELECT day, count(*) AS n_view FROM v GROUP BY 1),
    fc AS (SELECT day, count(*) AS n_click FROM c GROUP BY 1),
    fp AS (SELECT day, count(*) AS n_purchase FROM p GROUP BY 1)
    SELECT fv.day, fv.n_view,
           coalesce(fc.n_click, 0) AS n_click,
           coalesce(fp.n_purchase, 0) AS n_purchase
    FROM fv
    LEFT JOIN fc ON fv.day = fc.day
    LEFT JOIN fp ON fv.day = fp.day
    """,
)
def ts_funnel(spark, sf_dir):
    """Ordered 3-step funnel (view -> click -> purchase) per user-day:
    each stage's entry time is the min event time STRICTLY AFTER the
    previous stage's entry, so out-of-order events don't count. Stages are
    per-stage aggregates equi-joined on (user_id, day) — the shuffle key
    stays (user, day)-grained at any scale, and each stage's frame only
    shrinks."""
    ev = _ev(spark, sf_dir).select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
        "ts",
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, ["user_id", "day"])
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, ["user_id", "day"])
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("t3"))
    )
    fv = v.groupBy("day").agg(F.count(F.lit(1)).alias("n_view"))
    fc = c.groupBy("day").agg(F.count(F.lit(1)).alias("n_click"))
    fp = p.groupBy("day").agg(F.count(F.lit(1)).alias("n_purchase"))
    return (
        fv.join(fc, "day", "left")
        .join(fp, "day", "left")
        .select(
            "day",
            "n_view",
            F.coalesce("n_click", F.lit(0)).alias("n_click"),
            F.coalesce("n_purchase", F.lit(0)).alias("n_purchase"),
        )
    )


@query(
    "ts_retention_cohort",
    oracle="""
    WITH f AS (SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
               FROM events GROUP BY 1)
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, date_trunc('day', e.ts)) // 7
                AS BIGINT) AS week_offset,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def ts_retention_cohort(spark, sf_dir):
    """Cohort retention: users grouped by first-seen day, activity counted
    per whole-week offset from their cohort day. Integer day arithmetic
    end-to-end (no float, no week-truncation convention to disagree on);
    two hash aggregates and one equi-join on user_id."""
    ev = _ev(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.expr(
                "CAST(datediff(date_trunc('day', ts), cohort_day) div 7"
                " AS BIGINT)"
            ).alias("week_offset"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "ts_zscore_anomaly",
    oracle="""
    WITH stats AS (SELECT event_type, avg(value) AS mu,
                          stddev_samp(value) AS sd
                   FROM events GROUP BY 1)
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.mu) / s.sd, 3) AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs(round((e.value - s.mu) / s.sd, 3)) > 2.5
    """,
)
def ts_zscore_anomaly(spark, sf_dir):
    """Statistical anomaly flags: events more than 2.5 sample standard
    deviations from their type's mean. The stats side is one row per event
    type, so Catalyst broadcasts it; the threshold compares the ROUNDED
    z on both engines so the pass/fail decision is taken on identical
    values (raw doubles differ in the last bits across summation orders)."""
    ev = _ev(spark, sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 3)
    return (
        ev.join(stats, "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2.5)
        .select("event_id", "event_type", "value", "z")
    )


@query(
    "ts_rolling_1h",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(sum(CAST(value AS DECIMAL(12,2)))
                  OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                          AND CURRENT ROW) AS DOUBLE) AS rolling_1h,
           count(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                            AND CURRENT ROW) AS n_1h
    FROM events
    """,
)
def ts_rolling_1h(spark, sf_dir):
    """Per-key rolling 1-hour aggregate — the time-based (RANGE) window
    frame, not a row-count frame: each event sums every event of the same
    user in the trailing hour. Spark's rangeBetween needs a numeric order
    key, so the frame runs over microseconds-since-epoch with a
    3.6e9-microsecond lookback — semantically identical to the oracle's
    INTERVAL frame. One shuffle per key; frame evaluation is a sliding
    two-pointer per partition, O(n) not O(n*frame)."""
    ev = _ev(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast(MONEY)).over(w).cast("double").alias(
            "rolling_1h"
        ),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@query(
    "ts_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def ts_event_transitions(spark, sf_dir):
    """Per-user event transition counts (round 3): the Markov-chain /
    next-event-prediction aggregate — for each consecutive event pair in a
    user's timeline (total order: ts, then event_id), count (from, to)
    type transitions corpus-wide. One window pass per user partition plus
    one hash aggregate over at most |types|² groups; the raw events only
    shuffle once, on user_id."""
    e = _ev(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "ts_ewma",
    oracle="""
    WITH RECURSIVE s AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             value AS x
      FROM events
    ), r AS (
      SELECT user_id, rn, x AS ewma FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, 0.7 * r.ewma + 0.3 * s.x
      FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id,
           CAST(max(rn) AS BIGINT) AS n_points,
           round(max_by(ewma, rn), 4) AS ewma_last
    FROM r
    GROUP BY user_id
    """,
)
def ts_ewma(spark, sf_dir):
    """Exponentially-weighted moving average per key (X18): the
    recurrence ``y_t = (1-α)·y_{t-1} + α·x_t`` (α = 0.3, y_0 = x_0) over
    each user's event-time-ordered series, reporting the final smoothed
    level. A recurrence is the one shape Catalyst can't express (each
    row needs the previous row's OUTPUT, not its input — window frames
    see inputs only), so this is a deliberate ``applyInPandas`` stateful
    pass: Arrow-batched, one group per user, sequential only WITHIN a
    key while all keys run in parallel across the cluster — the same
    shuffle profile as any groupBy on user_id, with no driver
    involvement. Both engines evaluate the identical multiply-add
    sequence (``0.7*y + 0.3*x`` in series order), so the doubles agree
    bit-for-bit before the defensive 4dp rounding. The oracle replays
    the recurrence as a recursive CTE."""
    import pandas as pd

    ev = _ev(spark, sf_dir).select("user_id", "ts", "event_id", "value")

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        y = None
        for x in pdf["value"].to_numpy():
            y = x if y is None else 0.7 * y + 0.3 * x
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_points": [len(pdf)],
                "ewma_last": [round(y, 4)],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        smooth, "user_id long, n_points long, ewma_last double"
    )


@query(
    "ts_downsample_maxdev",
    oracle="""
    WITH e AS (
      SELECT user_id, date_trunc('day', ts) AS bucket, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), b AS (
      SELECT user_id, bucket,
             count(*) AS n, sum(cents) AS s
      FROM e GROUP BY 1, 2
    ), d AS (
      SELECT e.user_id, e.bucket, e.event_id, e.cents, b.n,
             abs(e.cents * b.n - b.s) AS dev
      FROM e JOIN b USING (user_id, bucket)
    )
    SELECT user_id, bucket, event_id AS kept_event_id,
           cents AS kept_cents, CAST(n AS BIGINT) AS n_events
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, bucket
        ORDER BY dev DESC, event_id) AS rn
      FROM d)
    WHERE rn = 1
    """,
)
def ts_downsample_maxdev(spark, sf_dir):
    """Visual-fidelity downsampling (X19, the LTTB family's
    shuffle-friendly member): per (key, time-bucket), keep the ONE
    point deviating most from the bucket's mean — the point a plotted
    line can least afford to lose — plus the bucket's event count so a
    renderer can badge density. True LTTB is a sequential scan (each
    choice depends on the previous selected point); the per-bucket
    max-deviation variant keeps ~the same visual extremes while
    staying two hash aggregates + one window — fully parallel.

    Determinism across engines: the deviation compares
    ``|cents·n − Σcents|`` — all BIGINT (values are 2dp, scaled to
    integer cents), so no float mean enters the argmax; ties break on
    event_id. At 100 TB: shuffle keys are (user, bucket) both passes,
    output is one row per bucket regardless of input rate."""
    e = _ev(spark, sf_dir).select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("bucket"),
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    b = e.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    d = e.join(b, ["user_id", "bucket"]).withColumn(
        "dev", F.abs(F.col("cents") * F.col("n") - F.col("s"))
    )
    w = W.partitionBy("user_id", "bucket").orderBy(
        F.desc("dev"), F.asc("event_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "bucket",
            F.col("event_id").alias("kept_event_id"),
            F.col("cents").alias("kept_cents"),
            F.col("n").cast("long").alias("n_events"),
        )
    )
