"""Unit coverage for the transformWithState sessionizer's state machine.

The full operator needs google.protobuf (JVM state-server wire protocol),
absent in this environment — but SessionProcessor's logic is plain Python
over pandas batches, so the input-handling and timer-expiry paths run here
against fake state/handle objects. When the env gains protobuf, the
stream-level v1==v2 equivalence test in test_streaming.py takes over.
"""

from __future__ import annotations

import pandas as pd

from s3_glue_redshift_guide_spark.streaming.stateful_v2 import SessionProcessor


class FakeValueState:
    def __init__(self):
        self.value = None

    def exists(self):
        return self.value is not None

    def get(self):
        return self.value

    def update(self, v):
        self.value = tuple(v)

    def clear(self):
        self.value = None


class FakeHandle:
    def __init__(self):
        self.state = FakeValueState()
        self.timers: list[int] = []

    def getValueState(self, name, schema):
        return self.state

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


class FakeTimerValues:
    def __init__(self, now_ms=1_000_000):
        self.now_ms = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self.now_ms


class FakeExpiredTimerInfo:
    def getExpiryTimeInMs(self):
        return 0


def _batch(ts_seconds, values):
    return pd.DataFrame(
        {
            "ts": pd.to_datetime(ts_seconds, unit="s"),
            "value": values,
        }
    )


def _proc(gap_seconds=300, use_timeout=True):
    p = SessionProcessor(gap_seconds=gap_seconds, use_timeout=use_timeout)
    h = FakeHandle()
    p.init(h)
    return p, h


def test_handle_input_rows_closes_on_gap_and_keeps_open_session():
    p, h = _proc()
    out = list(
        p.handleInputRows((7,), iter([_batch([0, 100, 1000], [1.0, 2.0, 5.0])]),
                          FakeTimerValues())
    )
    # 0 and 100 are one session (gap 300s); 1000 opens a new one
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["user_id"] == 7 and row["n_events"] == 2 and row["value_total"] == 3.0
    # open session (the ts=1000 event) stays in state, timer armed one gap out
    assert h.state.value == (1_000_000_000, 1_000_000_000, 1, 5.0)
    assert h.timers == [1_000_000 + 300_000]


def test_rearming_replaces_the_stale_timer():
    p, h = _proc()
    list(p.handleInputRows((7,), iter([_batch([0], [1.0])]), FakeTimerValues(10_000)))
    list(p.handleInputRows((7,), iter([_batch([10], [1.0])]), FakeTimerValues(20_000)))
    assert h.timers == [20_000 + 300_000]  # exactly one live timer per key


def test_expired_timer_flushes_open_session_and_clears_state():
    p, h = _proc()
    list(p.handleInputRows((7,), iter([_batch([50], [4.5])]), FakeTimerValues()))
    out = list(p.handleExpiredTimer((7,), FakeTimerValues(), FakeExpiredTimerInfo()))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["user_id"] == 7 and row["n_events"] == 1 and row["value_total"] == 4.5
    assert row["session_start"] == pd.Timestamp(50, unit="s")
    assert h.state.value is None  # next event starts a fresh session


def test_expired_timer_with_no_state_emits_nothing():
    p, _ = _proc()
    assert list(p.handleExpiredTimer((7,), FakeTimerValues(), FakeExpiredTimerInfo())) == []


def test_no_timeout_mode_never_touches_timers():
    p, h = _proc(use_timeout=False)
    list(p.handleInputRows((7,), iter([_batch([0], [1.0])]), FakeTimerValues()))
    assert h.timers == []
