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
- a late event beyond the watermark is dropped by the engine before the
  operator sees it (standard watermark contract);
- when the watermark passes `session_end + gap`, the session row
  (user_id, session_start, session_end, n_events, total_value) is
  emitted and the per-key state cleared — so state size tracks OPEN
  sessions only, the property that keeps a 100 TB/day stream's state
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
# same rationale and layout as stateful._SESSION_STATE)
_SESS_SCHEMA = "start_us bigint, end_us bigint, n bigint, total double"


class SessionFinalizer(StatefulProcessor):
    def __init__(self, gap_ms: int) -> None:
        self.gap_ms = gap_ms
        self.gap_us = gap_ms * 1_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.sess = handle.getValueState("sess", _SESS_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        # session algebra shared with (and executed/oracle-checked via)
        # the applyInPandasWithState twin — see stateful._sessionize_batch
        from market_flow_spark.streaming.stateful import _sessionize_batch

        sessions = _sessionize_batch(
            rows, self.gap_us, self.sess.get() if self.sess.exists() else None
        )
        if not sessions:
            return iter(())
        # the last (latest) session stays open; one live timer per key,
        # re-armed at the new session end + gap. Every earlier session was
        # closed by a later in-batch event beyond the gap — final now, so
        # emit immediately (the same rows session_window would produce)
        # instead of waiting for the watermark.
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.sess.update(sessions[-1])
        # the timer clock is ms-epoch; round the us session end UP so the
        # timer never fires a sub-ms early
        self.handle.registerTimer(-(-sessions[-1][1] // 1_000) + self.gap_ms)
        closed = sessions[:-1]
        if not closed:
            return iter(())
        return iter(
            [
                pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(closed),
                        "session_start": [
                            pd.Timestamp(s, unit="us") for s, *_ in closed
                        ],
                        "session_end": [
                            pd.Timestamp(e, unit="us") for _, e, *_ in closed
                        ],
                        "n_events": [n for _, _, n, _ in closed],
                        "total_value": [t for *_, t in closed],
                    }
                )
            ]
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if not self.sess.exists():
            return iter(())
        start_us, end_us, n, total = self.sess.get()
        self.sess.clear()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
                "total_value": [total],
            }
        )

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
