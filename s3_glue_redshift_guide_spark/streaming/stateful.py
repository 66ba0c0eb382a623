"""T7 — custom stateful per-key processing via applyInPandasWithState.

Sessionization beyond ``session_window``: per-user state carries the open
session across micro-batches; a session closes when the gap since its last
event exceeds ``gap_seconds`` (decided against event time within the
batch; a processing-time timeout would also flush on stream idle — omitted
here to keep batch/stream outputs comparable) or on timeout. Emits one row
per CLOSED session; open sessions stay in state.

This is the pattern for any custom stateful operator the reference's
managed services can't express (and the one place the engine holds
explicit state): Arrow-batched per-key pandas with a typed state tuple.
State per key is O(1) — four scalars — so 10^9 users fit comfortably
across executors.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, value_total double"
)
STATE_SCHEMA = "start bigint, last bigint, n bigint, total double"


def make_sessionizer(gap_seconds: int = 300, use_timeout: bool = False):
    """Build the applyInPandasWithState function for gap-based sessions.

    ``use_timeout`` arms a processing-time timeout that flushes idle open
    sessions — required on an unbounded production stream, but it keeps
    scheduling timeout micro-batches, so a finite ``availableNow`` run
    would never terminate; leave it off for bounded/backfill runs.
    """

    gap_us = gap_seconds * 1_000_000

    def sessionize(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                state.remove()
                yield _emit(user_id, start, last, n, total)
            return

        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = n = 0
            total = 0.0

        closed: list[pd.DataFrame] = []
        # applyInPandasWithState does NOT guarantee event-time order across
        # the Arrow chunks of one group — concatenate and sort ONCE, or a
        # large group split across chunks sessionizes out of order.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ts_us = int(ts.value // 1_000)  # pandas ns -> us
                if n == 0:
                    start, last, n, total = ts_us, ts_us, 1, float(value)
                elif ts_us - last > gap_us:
                    closed.append(_emit(user_id, start, last, n, total))
                    start, last, n, total = ts_us, ts_us, 1, float(value)
                else:
                    # a late event (ts < state's last, within gap) must not
                    # move the session end backwards — clamp both bounds
                    start = min(start, ts_us)
                    last, n, total = max(last, ts_us), n + 1, total + float(value)
        if n > 0:
            state.update((start, last, n, total))
            if use_timeout:
                state.setTimeoutDuration(gap_seconds * 1000)
        for out in closed:
            yield out

    return sessionize


def _emit(user_id, start_us, last_us, n, total) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "value_total": [round(total, 2)],
        }
    )


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 300, use_timeout: bool = False
) -> DataFrame:
    """Wire the sessionizer onto a (streaming) events DataFrame."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if use_timeout
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds, use_timeout),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
