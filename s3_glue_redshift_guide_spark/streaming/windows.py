"""T2-T5 — time-window aggregations, batch/stream polymorphic.

Each function takes any events-shaped DataFrame (batch or streaming) and
returns the windowed aggregate. In streaming mode, call ``withWatermark``
on the input first (T5) — the transform itself is mode-agnostic, which is
what keeps the batch twin and the streaming query provably the same plan.

Scale: windowed groupBy shuffles on (window, key); state size in streaming
is bounded by watermark eviction. ``value`` money sums go through DECIMAL
per the engine-wide parity policy (queries/util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.numeric import money


def tumbling_counts(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Tumbling window per event_type: count + exact value total (T2)."""
    return (
        events.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("value_total"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "value_total",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Sliding window totals (T3): each event lands in width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_stats(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Session windows per user (T4): events within ``gap`` of each other
    merge into one session; session end extends gap past the last event."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("value_total"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("session_start"),
            F.col("win.end").cast("timestamp_ntz").alias("session_end"),
            "user_id",
            "n_events",
            "value_total",
        )
    )
