"""Structured Streaming data plane (SURVEY.md §2.8).

The reference's streaming surface is control-plane only (S3 events trigger
the pipeline, bookmarks give incremental file processing — README.md:145,
173,193-199); the engine generalizes it to data-plane streaming over the
events table. Every transform here is written against a plain DataFrame so
the SAME code runs in batch mode (where the DuckDB oracle can check it) and
under ``readStream`` (where watermarks/output modes apply) — the
batch-twin design SURVEY.md §2.8 calls for.

windows   — tumbling / sliding / session window aggregations (T2-T4)
dedup     — watermarked streaming dedup (T6)
stateful  — applyInPandasWithState sessionization (T7)
joins     — stream-stream interval join with bounded state (T10)
source    — readStream wrapper for the events table (T1 lives in
            sources/incremental.py)
Sinks (T9): StagedCopyWriter.foreach_batch (sinks/warehouse_copy.py) is the
streaming warehouse loader; memory/append sinks are test-side.
"""

from .windows import session_stats, sliding_counts, tumbling_counts
from .dedup import first_event_per_key, streaming_dedup
from .joins import interval_join_stream

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_stats",
    "first_event_per_key",
    "streaming_dedup",
    "interval_join_stream",
]
