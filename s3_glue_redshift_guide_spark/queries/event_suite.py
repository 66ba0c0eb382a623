"""T2-T9 batch twins — the streaming operators' semantics, checked against
the DuckDB oracle on the batch events table (SURVEY.md §2.8: "every
streaming aggregation needs a batch-equivalent formulation").

The Spark side calls the SAME transform functions the streaming queries
use (streaming/windows.py, streaming/dedup.py) on a batch DataFrame —
so the oracle verifies the one implementation that runs in both modes.
tests/test_streaming.py then proves stream-mode output == batch output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..streaming import (
    first_event_per_key,
    session_stats,
    sliding_counts,
    tumbling_counts,
)
from .registry import query
from .util import money


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "ev_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_total
    FROM events GROUP BY 1, 2
    """,
)
def ev_tumbling_window(spark, sf_dir):
    """Tumbling 10-minute windows per event type (T2)."""
    return tumbling_counts(_ev(spark, sf_dir), "10 minutes")


@query(
    "ev_sliding_window",
    oracle="""
    WITH hits AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', event_type
      FROM events
    )
    SELECT window_start, event_type, count(*) AS n_events
    FROM hits GROUP BY 1, 2
    """,
)
def ev_sliding_window(spark, sf_dir):
    """Sliding 10m/5m windows (T3): each event counts into two windows —
    the oracle materializes both slide-aligned starts explicitly."""
    return sliding_counts(_ev(spark, sf_dir), "10 minutes", "5 minutes")


@query(
    "ev_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT min(ts)                         AS session_start,
           max(ts) + INTERVAL '5 minutes'  AS session_end,
           user_id,
           count(*)                        AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_total
    FROM sessions GROUP BY user_id, sid
    """,
)
def ev_session_window(spark, sf_dir):
    """Gap-based session windows per user (T4); the oracle re-derives
    sessions with lag + running sum (a new session starts when the gap
    reaches the 5-minute threshold, matching session_window's [start,
    last+gap) merge rule)."""
    return session_stats(_ev(spark, sf_dir), "5 minutes")


@query(
    "ev_dedup_first",
    oracle="""
    SELECT user_id, event_type, event_id, ts, round(value, 2) AS value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def ev_dedup_first(spark, sf_dir):
    """Dedup-keep-first per key (T6 batch twin): deterministic earliest row."""
    return first_event_per_key(_ev(spark, sf_dir), ["user_id", "event_type"]).select(
        "user_id", "event_type", "event_id", "ts", F.round("value", 2).alias("value")
    )


@query(
    "ev_enrich_static",
    oracle="""
    SELECT n.n_name,
           count(*) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS value_total
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def ev_enrich_static(spark, sf_dir):
    """Stream-static enrichment join (T8 batch twin): events against the
    broadcast nation dimension — in streaming the same join runs per
    micro-batch with the static side broadcast once."""
    ev = _ev(spark, sf_dir)
    n = load_table(spark, sf_dir, "nation")
    return (
        ev.join(F.broadcast(n), ev.user_id % 25 == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("value_total"),
        )
    )
