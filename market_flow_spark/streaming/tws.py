"""Session finalization on transformWithStateInPandas (Spark 4's
arbitrary-stateful API — north-star extension; the reference has no
streaming at all, SURVEY §2.9).

`stateful.running_user_totals` covers the legacy applyInPandasWithState
shape (one blob of state per key, emit every batch). This operator uses
what the new API adds on top:

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
_SESS_SCHEMA = "start_ms bigint, end_ms bigint, n bigint, total double"


class SessionFinalizer(StatefulProcessor):
    def __init__(self, gap_ms: int) -> None:
        self.gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.sess = handle.getValueState("sess", _SESS_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        start_ms = end_ms = None
        n = 0
        total = 0.0
        if self.sess.exists():
            start_ms, end_ms, n, total = self.sess.get()
        for pdf in rows:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            start_ms = lo if start_ms is None else min(start_ms, lo)
            end_ms = hi if end_ms is None else max(end_ms, hi)
            n += len(pdf)
            total += float(pdf["value"].sum())
        if start_ms is None:
            return iter(())
        # one live timer per key: re-arm at the new session end + gap
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.sess.update((start_ms, end_ms, n, total))
        self.handle.registerTimer(end_ms + self.gap_ms)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if not self.sess.exists():
            return iter(())
        start_ms, end_ms, n, total = self.sess.get()
        self.sess.clear()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
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
