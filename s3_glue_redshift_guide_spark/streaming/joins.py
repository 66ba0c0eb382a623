"""Stream-stream interval join (T10) — correlate two live event streams.

The batch engine's ``operators/joins.py::range_join`` answers "which right
rows land in each left row's time window" over data at rest; this is the
same question asked of two unbounded streams (click->purchase attribution,
request->response pairing). Structured Streaming supports it natively IF
the join carries (a) watermarks on both sides and (b) an event-time bound
between the two time columns — together they let the state store evict
buffered rows once the watermark passes their window, so state stays
bounded by (watermark horizon x arrival rate) instead of growing forever.
This module builds exactly that condition shape; the time bound is written
as a half-open interval ``[left_ts + lower, left_ts + upper)`` to match
``range_join`` semantics, so the stream and batch formulations are
row-identical (proven in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``on`` where ``right_ts`` falls in
    ``[left_ts + lower_seconds, left_ts + upper_seconds)``.

    Works on streaming *and* batch frames (``withWatermark`` is a no-op in
    batch, so the batch twin runs the identical plan minus state). For
    streaming, ``how`` may be ``inner`` or ``leftOuter`` (outer results
    emit only after the watermark closes the window — correct, but late by
    the watermark delay; note the GLOBAL watermark is the MIN across both
    sides' watermarks, so a side that stops receiving events stalls outer
    emission — the multipleWatermarkPolicy=min default, pinned in
    tests/test_streaming.py). Column names must be disjoint apart from
    ``on`` — project/alias before calling, as with any self-join.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (
            rw[right_ts]
            >= lw[left_ts] + F.expr(f"interval {lower_seconds} seconds")
        )
        & (
            rw[right_ts]
            < lw[left_ts] + F.expr(f"interval {upper_seconds} seconds")
        )
    )
    if how == "fullOuter":
        # right-preserved rows carry a NULL left key, so the surviving
        # key must coalesce across sides instead of dropping the right's;
        # the right key is physically renamed first so the coalesce is
        # unambiguous even when both inputs share lineage (self-joins)
        rkey = f"__{on}_right"
        rw2 = rw.withColumnRenamed(on, rkey)
        cond2 = (
            (lw[on] == rw2[rkey])
            & (
                rw2[right_ts]
                >= lw[left_ts]
                + F.expr(f"interval {lower_seconds} seconds")
            )
            & (
                rw2[right_ts]
                < lw[left_ts]
                + F.expr(f"interval {upper_seconds} seconds")
            )
        )
        joined = lw.join(rw2, cond2, how)
        return (
            joined.withColumn(
                "__key_coalesced", F.coalesce(F.col(on), F.col(rkey))
            )
            .drop(on, rkey)
            .withColumnRenamed("__key_coalesced", on)
        )
    return lw.join(rw, cond, how).drop(rw[on])
