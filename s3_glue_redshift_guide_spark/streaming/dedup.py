"""T6 — streaming dedup with bounded state.

``streaming_dedup`` is the streaming form: dropDuplicates under a watermark
so state for old keys is evicted (without the watermark, 100 TB of history
means unbounded state — the watermark IS the scale design).

``first_event_per_key`` is the batch twin with identical semantics on a
finite input: the earliest event per key, deterministically (ties broken by
event_id), expressible in SQL for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def streaming_dedup(
    events: DataFrame, keys: list[str], ts_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """Keep the first-seen row per key within the watermark horizon."""
    return events.withWatermark(ts_col, delay).dropDuplicates(keys)


def first_event_per_key(events: DataFrame, keys: list[str]) -> DataFrame:
    """Batch twin: earliest event per key with a total tiebreak order."""
    w = W.partitionBy(*keys).orderBy("ts", "event_id")
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
