"""Session finalization on transformWithStateInPandas (Spark 4's
arbitrary-stateful API — north-star extension; the reference has no
streaming at all, SURVEY §2.9).

`stateful.running_user_totals` covers the legacy applyInPandasWithState
shape (one blob of state per key, emit every batch), and
`stateful.finalized_user_sessions_legacy` is THIS operator's semantic twin
on that API — same output schema, same emit-once contract, and the same
shared `_sessionize_batch` core, so the session algebra is executed and
oracle-checked (tests/test_stateful_sessions.py) even where this module's
Python worker cannot start (it needs protobuf). This operator uses what
the new API adds on top:

- **named, typed state handles** (a ValueState per concern instead of
  one packed tuple),
- **event-time TIMERS**: a session emits exactly ONCE — when the
  watermark passes last_event + gap, `handleExpiredTimer` fires, the
  finalized row is emitted, and the state is deleted. The legacy API
  approximates this with per-key timeouts; timers make it explicit and
  allow several per key.

Semantics (classic gap sessionization, the streaming twin of the batch
`session_window` query):

- events for a user extend their open session while they arrive within
  `gap` of the current end (event time);
- late input is the OPERATOR's contract on the arbitrary-stateful APIs
  (they do not auto-drop below-watermark rows the way windowed
  aggregations do): rows whose gap window the watermark sealed are
  discarded, watermark-adjacent rows still merge into held sessions.
  Best-effort divergence: a kept below-watermark row adjacent to an
  ALREADY-EMITTED session (end <= watermark - gap) starts a separate
  session instead of extending it — the batch oracle would merge the
  two; emit-once holds either way, and the split is the inherent cost
  of admitting data beyond the declared disorder bound;
- when the watermark passes `session_end + gap`, the session row
  (user_id, session_start, session_end, n_events, total_value) is
  emitted and dropped from state — so state size tracks the sessions
  still inside the watermark's disorder window (with delay 0, open
  sessions only), the property that keeps a 100 TB/day stream's state
  store bounded.

State-store scale notes: state is keyed and RocksDB-backed on a real
cluster; each micro-batch touches only keys present in the batch plus
keys whose timers fire; rescaling redistributes key ranges. Emission is
append-mode (finalized facts), so the sink can be parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
# state timestamps in MICROSECONDS since epoch (full parquet precision;
# same rationale and ARRAY layout as stateful._SESSION_STATE: the
# finalizer holds every session not yet past the watermark horizon, not
# just the newest — see finalized_user_sessions_legacy's docstring for
# why eager sessions[:-1] emission breaks emit-once when delay > 0)
_SESS_SCHEMA = (
    "starts array<bigint>, ends array<bigint>, "
    "ns array<bigint>, totals array<double>"
)


def _frame(key, sessions):
    return pd.DataFrame(
        {
            "user_id": [key[0]] * len(sessions),
            "session_start": [pd.Timestamp(s, unit="us") for s, *_ in sessions],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in sessions],
            "n_events": [n for _, _, n, _ in sessions],
            "total_value": [t for *_, t in sessions],
        }
    )


class SessionFinalizer(StatefulProcessor):
    def __init__(self, gap_ms: int) -> None:
        self.gap_ms = gap_ms
        self.gap_us = gap_ms * 1_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.sess = handle.getValueState("sess", _SESS_SCHEMA)

    def _held(self):
        if not self.sess.exists():
            return []
        starts, ends, ns, totals = self.sess.get()
        return [
            (int(s), int(e), int(n), float(t))
            for s, e, n, t in zip(starts, ends, ns, totals)
        ]

    def _hold(self, sessions) -> None:
        """Store the not-yet-ripe sessions; one live timer per key, armed
        at the EARLIEST held end + gap (ms-epoch clock — round the us end
        UP so the timer never fires a sub-ms early)."""
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.sess.update(
            (
                [s[0] for s in sessions],
                [s[1] for s in sessions],
                [s[2] for s in sessions],
                [s[3] for s in sessions],
            )
        )
        self.handle.registerTimer(
            -(-min(s[1] for s in sessions) // 1_000) + self.gap_ms
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        # session algebra shared with (and executed/oracle-checked via)
        # the applyInPandasWithState twin — see stateful._sessionize_batch.
        # Same contract as the legacy twin: the arbitrary-stateful APIs do
        # NOT auto-drop below-watermark input, so discard rows whose gap
        # window the watermark already sealed (they can only re-create
        # finalized sessions), keep watermark-adjacent rows (they still
        # merge into HELD sessions), and emit only sessions the WATERMARK
        # has sealed — a later batch may deliver an admissible event inside
        # an in-batch-closed session's gap window, so in-batch closure is
        # never final evidence.
        from market_flow_spark.streaming.stateful import _sessionize_batch

        wm_us = timerValues.getCurrentWatermarkInMs() * 1_000
        live = [
            p[(p["ts"].astype("int64") // 1_000) + self.gap_us > wm_us]
            for p in rows
        ]
        sessions = _sessionize_batch(live, self.gap_us, self._held() or None)
        if not sessions:
            return iter(())
        ripe = [s for s in sessions if s[1] + self.gap_us <= wm_us]
        rest = [s for s in sessions if s[1] + self.gap_us > wm_us]
        if rest:
            self._hold(rest)
        elif self.sess.exists():
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            self.sess.clear()
        return iter([_frame(key, ripe)]) if ripe else iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        # watermark passed the earliest held end + gap: finalize every
        # ripe session exactly once, keep (and re-arm for) the rest
        wm_us = timerValues.getCurrentWatermarkInMs() * 1_000
        sessions = self._held()
        ripe = [s for s in sessions if s[1] + self.gap_us <= wm_us]
        rest = [s for s in sessions if s[1] + self.gap_us > wm_us]
        if rest:
            self._hold(rest)
        else:
            self.sess.clear()
        if ripe:
            yield _frame(key, ripe)

    def close(self) -> None:
        pass


def finalized_user_sessions(
    events: DataFrame, gap: str = "5 minutes", watermark_delay: str = "0 seconds"
) -> DataFrame:
    """Append-mode stream of COMPLETED per-user sessions (gap
    sessionization with event-time timers). `events` needs (user_id,
    ts timestamp, value double)."""
    unit_ms = {"seconds": 1_000, "minutes": 60_000, "hours": 3_600_000}
    qty, unit = gap.split()
    gap_ms = int(qty) * unit_ms[unit]
    with_wm = events.withWatermark("ts", watermark_delay)
    return with_wm.groupBy("user_id").transformWithStateInPandas(
        SessionFinalizer(gap_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
