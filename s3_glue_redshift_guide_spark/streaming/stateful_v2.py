"""T7 (Spark 4 API) — stateful per-key processing via transformWithState.

The same gap-based sessionizer as ``stateful.py``, rewritten on Spark 4's
``transformWithStateInPandas``/``StatefulProcessor`` API — the successor to
``applyInPandasWithState`` with named state variables (value/list/map),
TTL, and timers managed by the state-store layer instead of a single
packed tuple. Both implementations are kept: the v1 operator proves the
long-stable API; this one is where new stateful operators should land.

Semantics are identical to ``stateful.make_sessionizer`` (and are asserted
equal in tests): events sort by event time within the batch, a session
closes when the gap exceeds ``gap_seconds``, late events clamp the session
bounds rather than moving them backwards, and one row is emitted per
CLOSED session. State per key is four scalars, so 10^9 keys distribute
across executors at O(1) memory each.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from .stateful import OUTPUT_SCHEMA, STATE_SCHEMA, _emit


def transform_with_state_available() -> bool:
    """transformWithState's Python worker speaks protobuf to the JVM state
    server; without the package the worker crashes at init. Callers use this
    to fall back to the v1 ``applyInPandasWithState`` sessionizer (identical
    semantics) and log the degradation once."""
    from importlib.util import find_spec

    try:
        return find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent ``google`` namespace absent
        return False


class SessionProcessor(StatefulProcessor):
    """Gap-based sessionizer on the named-state API."""

    def __init__(self, gap_seconds: int = 300, use_timeout: bool = False):
        self.gap_us = gap_seconds * 1_000_000
        self.gap_ms = gap_seconds * 1_000
        self.use_timeout = use_timeout

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.session = handle.getValueState("session", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self.session.exists():
            start, last, n, total = self.session.get()
        else:
            start = last = n = 0
            total = 0.0

        # same chunking caveat as applyInPandasWithState: Arrow chunks of
        # one group are not event-time ordered — concat and sort once
        chunks = [pdf for pdf in rows if len(pdf)]
        closed: list[pd.DataFrame] = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ts_us = int(ts.value // 1_000)
                if n == 0:
                    start, last, n, total = ts_us, ts_us, 1, float(value)
                elif ts_us - last > self.gap_us:
                    closed.append(_emit(user_id, start, last, n, total))
                    start, last, n, total = ts_us, ts_us, 1, float(value)
                else:
                    start = min(start, ts_us)
                    last, n = max(last, ts_us), n + 1
                    total = total + float(value)
        if n > 0:
            self.session.update((start, last, n, total))
            if self.use_timeout:
                # one live timer per key: drop the stale one, re-arm one gap
                # past now, so an idle key flushes its open session exactly
                # once (the v1 setTimeoutDuration contract)
                for t in self.handle.listTimers():
                    self.handle.deleteTimer(t)
                self.handle.registerTimer(
                    timerValues.getCurrentProcessingTimeInMs() + self.gap_ms
                )
        yield from closed

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # idle-timeout flush, mirroring v1's ``state.hasTimedOut`` branch:
        # emit the open session and clear state so the next event starts
        # a fresh session
        (user_id,) = key
        if self.session.exists():
            start, last, n, total = self.session.get()
            self.session.clear()
            if n > 0:
                yield _emit(user_id, start, last, n, total)

    def close(self) -> None:
        pass


def sessionize_stream_v2(
    events: DataFrame, gap_seconds: int = 300, use_timeout: bool = False
) -> DataFrame:
    """Wire the Spark 4 stateful sessionizer onto a (streaming) events
    DataFrame.

    ``use_timeout=False`` runs timeMode='none': flushing idle sessions on a
    wall clock would diverge stream output from the batch twin (see
    stateful.py). ``use_timeout=True`` arms per-key processing-time timers —
    the unbounded-production-stream mode, same caveat as v1: a finite
    ``availableNow`` run keeps scheduling timer batches.
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(gap_seconds, use_timeout),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="processingTime" if use_timeout else "none",
        )
    )
