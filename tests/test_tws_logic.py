"""Execute the tws SessionFinalizer's PROCESSOR LOGIC with fake handles.

The real transformWithStateInPandas worker cannot start in this sandbox
(its state-server protocol needs protobuf — tests/test_tws_sessions.py
skips with the verbatim reason), but the processor itself is plain Python
over three tiny interfaces (ValueState, handle timers, timerValues). Faking
those executes every branch of the watermark-gated session logic —
handleInputRows' late-row filter and emit gate, handleExpiredTimer's
ripe/rest split and timer re-arm — so the only thing left unproven here is
the engine wiring itself, which tests/test_tws_sessions.py covers wherever
protobuf exists. The scenarios deliberately mirror
tests/test_stateful_sessions.py so the two APIs' logic is pinned to the
same behavior on the same timelines.
"""

from __future__ import annotations

import sys
import types

import pandas as pd

# stub the pyspark stateful_processor import if protobuf's absence breaks it
try:
    from market_flow_spark.streaming.tws import SessionFinalizer
except ImportError:  # pragma: no cover - depends on sandbox wheels
    mod = types.ModuleType("pyspark.sql.streaming.stateful_processor")

    class StatefulProcessor:  # noqa: D401 - minimal stand-in
        pass

    class StatefulProcessorHandle:
        pass

    mod.StatefulProcessor = StatefulProcessor
    mod.StatefulProcessorHandle = StatefulProcessorHandle
    sys.modules["pyspark.sql.streaming.stateful_processor"] = mod
    from market_flow_spark.streaming.tws import SessionFinalizer


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


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
    def __init__(self, wm_ms: int):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm


def _batch(ts_us, vals):
    return iter(
        [
            pd.DataFrame(
                {
                    "ts": pd.to_datetime([t * 1_000 for t in ts_us], unit="ns"),
                    "value": vals,
                }
            )
        ]
    )


def _rows(frames):
    out = []
    for f in frames:
        for r in f.itertuples(index=False):
            out.append(
                (
                    int(r.session_start.value // 1_000),
                    int(r.session_end.value // 1_000),
                    int(r.n_events),
                    float(r.total_value),
                )
            )
    return out


SEC = 1_000_000  # us


def _mk(gap_s: int):
    proc = SessionFinalizer(gap_s * 1_000)
    handle = FakeHandle()
    proc.init(handle)
    return proc, handle


def test_sessions_held_until_watermark_then_timer_emits():
    """In-batch closure is never final (late rows are admitted by these
    APIs): at watermark 0 everything is held with one timer at the
    earliest end + gap; the timer expiry emits the ripe session."""
    proc, handle = _mk(gap_s=60)
    out = _rows(
        proc.handleInputRows(
            (1,), _batch([0, 10 * SEC, 100 * SEC], [1.0, 2.0, 4.0]), FakeTimerValues(0)
        )
    )
    assert out == []
    starts, ends, ns, totals = handle.state.get()
    assert starts == [0, 100 * SEC] and ends == [10 * SEC, 100 * SEC]
    assert handle.timers == [70_000]  # earliest held end 10s + gap 60s

    out2 = _rows(proc.handleExpiredTimer((1,), FakeTimerValues(100_000), None))
    assert out2 == [(0, 10 * SEC, 2, 3.0)]
    assert handle.state.get()[0] == [100 * SEC]
    assert handle.timers == [160_000]  # re-armed for the survivor


def test_late_event_bridges_held_sessions_emitonce():
    """The round-7 advice scenario on the tws twin: a late 50s event in
    batch 2 bridges the two held sessions; the timer expiry at a far
    watermark emits ONE merged row, never a premature split."""
    proc, handle = _mk(gap_s=60)
    assert (
        _rows(
            proc.handleInputRows(
                (1,),
                _batch([0, 10 * SEC, 100 * SEC], [1.0, 2.0, 4.0]),
                FakeTimerValues(0),
            )
        )
        == []
    )
    assert (
        _rows(proc.handleInputRows((1,), _batch([50 * SEC], [3.0]), FakeTimerValues(0)))
        == []
    )
    starts, ends, ns, totals = handle.state.get()
    assert starts == [0] and ends == [100 * SEC] and ns == [4] and totals == [10.0]
    assert handle.timers == [160_000]

    out = _rows(proc.handleExpiredTimer((1,), FakeTimerValues(200_000), None))
    assert out == [(0, 100 * SEC, 4, 10.0)]
    assert not handle.state.exists()


def test_expired_timer_keeps_unripe_sessions_and_rearms():
    proc, handle = _mk(gap_s=60)
    proc.handleInputRows((1,), _batch([0, 1000 * SEC], [1.0, 2.0]), FakeTimerValues(0))
    assert handle.timers == [60_000]
    # watermark ripens only the first (0+60 <= 200 < 1000+60)
    out = _rows(proc.handleExpiredTimer((1,), FakeTimerValues(200_000), None))
    assert out == [(0, 0, 1, 1.0)]
    assert handle.state.get()[0] == [1000 * SEC]
    assert handle.timers == [1_060_000]  # re-armed for the survivor


def test_sealed_window_rows_dropped_adjacent_rows_merge():
    """The late-row contract: a row whose gap window the watermark sealed
    (ts + gap <= wm) is discarded — it could only re-create a finalized
    session — while a watermark-adjacent row (wm - gap < ts < wm) still
    merges into a held session. Also pins that dropped rows never raise
    the INVALID_TIMEOUT_TIMESTAMP failure the unfiltered fold hit: the
    held session's timer stays strictly ahead of the watermark."""
    proc, handle = _mk(gap_s=60)
    # a held session [100s, 100s] survives a 90s watermark (100+60 > 90)
    proc.handleInputRows((1,), _batch([100 * SEC], [4.0]), FakeTimerValues(0))
    # wm=90s: ts=20s is sealed (20+60 <= 90, dropped); ts=70s is adjacent
    # (70+60 > 90, kept) and merges into the held session
    out = _rows(
        proc.handleInputRows(
            (1,), _batch([20 * SEC, 70 * SEC], [9.0, 3.0]), FakeTimerValues(90_000)
        )
    )
    assert out == []
    starts, ends, ns, totals = handle.state.get()
    assert starts == [70 * SEC] and ends == [100 * SEC]
    assert ns == [2] and totals == [7.0]  # the 9.0 sealed row is gone
    assert handle.timers == [160_000]
    assert handle.timers[0] > 90_000  # timer strictly ahead of the watermark


def test_all_rows_sealed_emits_nothing():
    """If every input row is sealed and nothing is held, the batch is a
    no-op: no emission, no state, no timer (emitting would duplicate
    already-final sessions)."""
    proc, handle = _mk(gap_s=60)
    out = _rows(
        proc.handleInputRows(
            (1,), _batch([0, 10 * SEC], [1.0, 2.0]), FakeTimerValues(500_000)
        )
    )
    assert out == []
    assert not handle.state.exists()
    assert handle.timers == []
