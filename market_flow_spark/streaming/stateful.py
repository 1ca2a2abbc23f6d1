"""Custom stateful streaming operators via applyInPandasWithState
(north-star extension; the reference has no streaming at all, SURVEY §2.9).

``running_user_totals`` maintains per-user cumulative (count, sum) state
across micro-batches — the canonical arbitrary-stateful shape
(sessionization, running CDC merges, and online feature aggregation all
look like this). State lives in the state store (checkpointed, rescalable
by key); each micro-batch touches only the keys present in the batch.

``finalized_user_sessions_legacy`` is gap sessionization with emit-once
semantics on THIS (Spark 3.x-era) API: per-key EventTimeTimeout stands in
for the explicit event-time timers of Spark 4's
transformWithStateInPandas. It is semantically identical to
``tws.finalized_user_sessions`` — same output schema, same
one-row-per-closed-session contract — and exists precisely so the session
design is EXECUTED and oracle-checked in environments where the Spark-4
state-server protocol cannot run (its Python worker needs protobuf, absent
here); the tws twin then only ports verified logic onto the newer handles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: emit updated per-user cumulative totals each micro-batch.

    Works only on a streaming DataFrame (use ``tumbling``/batch aggregates
    for batch inputs — this operator exists precisely for the cross-batch
    state the batch planner doesn't need).
    """

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
# state timestamps in MICROSECONDS since epoch: the events tables carry
# us-precision timestamps, and a coarser state unit would shift emitted
# session bounds off the batch session_window oracle (ms truncation was
# a real, test-caught bug). Array-valued: the finalizer holds EVERY
# session not yet past the watermark horizon (end + gap <= watermark),
# not just the newest — with watermark_delay > 0 an admissible late
# event can extend or bridge a session that in-batch evidence alone
# would have closed, so emitting sessions[:-1] eagerly would break the
# emit-once contract (premature finalization).
_SESSION_STATE = (
    "starts array<bigint>, ends array<bigint>, "
    "ns array<bigint>, totals array<double>"
)


def _sessionize_batch(pdfs, gap_us: int, open_state):
    """Fold a micro-batch's rows (plus carried session state, if any)
    into gap sessions. Returns [(start_us, end_us, n, total), ...]
    (timestamps in MICROSECONDS since epoch — full parquet us precision,
    so emitted bounds match session_window exactly) in event-time order —
    every entry but the LAST was closed by a later event more than
    `gap_us` after it; the last is the still-open session.

    ``open_state`` is None, one carried session tuple, or a LIST of
    carried session tuples (the watermark-gated finalizer holds every
    not-yet-emittable session, not just the newest — see
    finalized_user_sessions_legacy).

    Vectorized (one sort + one diff over the batch, no per-event Python
    loop): session boundaries are exactly the positions where consecutive
    event-time deltas exceed the gap. Shared by BOTH stateful APIs — the
    applyInPandasWithState operator below (executed + oracle-checked in
    this repo's suite) and the transformWithStateInPandas twin in tws.py
    — so the session algebra is verified once and ported nowhere.

    Out-of-order events are handled exactly within a batch (the sort);
    cross-batch disorder is bounded by the watermark contract — which on
    the arbitrary-stateful APIs the CALLER enforces (they do not auto-drop
    late rows; both finalizers filter sealed-window rows before calling
    this) — and absorbed by the carried-state merge below. Carried sessions are folded in with a
    SYMMETRIC interval-gap merge pass over the start-sorted session list:
    two sessions merge iff the gap between them (later start minus
    earlier end) is <= gap_us. A late batch may lie entirely BEFORE a
    carried session (one-sided `first_start <= open_end + gap` would
    wrongly merge it and mis-order the emitted list), and a carried
    session may bridge two batch sessions into one."""
    import numpy as np

    if open_state is None:
        carried = []
    elif isinstance(open_state[0], (tuple, list)):
        carried = [tuple(s) for s in open_state]
    else:
        carried = [tuple(open_state)]

    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return sorted(carried, key=lambda s: (s[0], s[1]))
    pdf = pd.concat(frames, ignore_index=True).sort_values("ts")
    ts_us = (pdf["ts"].astype("int64") // 1_000).to_numpy()
    vals = pdf["value"].to_numpy()
    starts = np.flatnonzero(np.diff(ts_us) > gap_us) + 1
    segs = np.split(np.arange(len(ts_us)), starts)
    sessions = [
        (int(ts_us[s[0]]), int(ts_us[s[-1]]), len(s), float(vals[s].sum()))
        for s in segs
    ]
    if carried:
        sessions.extend(carried)
        sessions.sort(key=lambda s: (s[0], s[1]))
        merged = [sessions[0]]
        for cur in sessions[1:]:
            ps, pe, pn, pt = merged[-1]
            if cur[0] <= pe + gap_us:
                merged[-1] = (ps, max(pe, cur[1]), pn + cur[2], pt + cur[3])
            else:
                merged.append(cur)
        sessions = merged
    return sessions


def _gap_to_us(gap: str) -> int:
    unit_ms = {"seconds": 1_000, "minutes": 60_000, "hours": 3_600_000}
    qty, unit = gap.split()
    return int(qty) * unit_ms[unit] * 1_000


def batch_user_sessions(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Batch execution of the SAME session core both streaming operators
    share: one ``applyInPandas`` per user over the full history (one
    "batch" containing everything, no carried state), every session
    emitted — in batch the stream is fully drained, so the trailing open
    session is final too.

    This exists so ``_sessionize_batch`` — the algebra
    ``finalized_user_sessions_legacy`` and ``tws.finalized_user_sessions``
    wire into the two stateful APIs — is certifiable against a plain
    gaps-and-islands SQL oracle (registered as ``user_sessions_core``),
    not just property-tested. Gap semantics match the core exactly: an
    event lands in the current session iff its distance from the session
    end is <= gap (``np.diff > gap_us`` starts a new one).

    At scale this is one shuffle on user_id; per-group cost is a sort +
    one vectorized diff/split, peak memory one user's history per task —
    the standard batch-sessionization shape.
    """
    gap_us = _gap_to_us(gap)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # the shared core indexes time as int64 nanoseconds // 1000; pin
        # the dtype so pandas' unit inference can never change the scale
        pdf = pdf.assign(ts=pdf["ts"].astype("datetime64[ns]"))
        sessions = _sessionize_batch([pdf], gap_us, None)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].iloc[0],
                "session_start": [
                    pd.Timestamp(s, unit="us") for s, *_ in sessions
                ],
                "session_end": [
                    pd.Timestamp(e, unit="us") for _, e, *_ in sessions
                ],
                "n_events": [n for _, _, n, _ in sessions],
                "total_value": [t for *_, t in sessions],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fold, SESSION_SCHEMA)
    )


def finalized_user_sessions_legacy(
    events: DataFrame, gap: str = "5 minutes", watermark_delay: str = "0 seconds"
) -> DataFrame:
    """Append-mode stream of COMPLETED per-user sessions (classic gap
    sessionization) on applyInPandasWithState + EventTimeTimeout.

    Semantics (identical to tws.finalized_user_sessions):
    - events for a user extend their open session while they arrive
      within `gap` of the current end (event time);
    - a session row (user_id, session_start, session_end, n_events,
      total_value) is emitted exactly ONCE — when the WATERMARK passes
      session_end + gap. Until then the session is held in state, even
      if a later in-batch event already lies beyond the gap: a later
      micro-batch can still deliver an admissible event that extends —
      or bridges into a neighbor — a session that in-batch evidence
      alone would have closed. Emission gated on the watermark is what
      makes emit-once hold for ANY delay/gap combination (including
      delay >= gap). State therefore holds every session not yet past
      the watermark horizon for its key, which the horizon itself
      bounds: sessions older than watermark - gap are emitted and
      dropped, so state tracks the disorder window, not history — the
      property that keeps a 100 TB/day stream's RocksDB store bounded.
    - LATE ROWS: unlike windowed aggregations, the arbitrary-stateful
      APIs do NOT auto-drop below-watermark input (verified empirically
      on this API: a disordered replay delivers month-old rows with the
      watermark already at end-of-stream). Handling them is the
      operator's contract, and this operator discards exactly the rows
      whose whole gap window the watermark has sealed
      (ts + gap <= watermark): such a row can only form or re-open a
      session that is already final — the emit-once hazard — while a
      row between watermark - gap and watermark can still legitimately
      merge into a HELD session and is kept. This is also what keeps
      every held session's timeout strictly ahead of the engine's
      watermark clock (setTimeoutTimestamp rejects timestamps at or
      below it). One best-effort divergence for such kept rows: if a
      kept below-watermark row falls within `gap` of a session that was
      ALREADY emitted (its end <= watermark - gap), it starts a NEW
      session rather than extending the finalized one — the batch
      `session_window` oracle would have merged them (and a windowed
      aggregation would have dropped the row entirely). Emit-once still
      holds; the extra row is the inherent cost of admitting data
      beyond the declared disorder bound instead of silently dropping
      it.

    `events` needs (user_id, ts timestamp, value double).
    """
    gap_us = _gap_to_us(gap)
    gap_ms = gap_us // 1_000

    def emit(rows):
        return pd.DataFrame(
            {
                "user_id": [key_id for key_id, *_ in rows],
                "session_start": [pd.Timestamp(s, unit="us") for _, s, *_ in rows],
                "session_end": [pd.Timestamp(e, unit="us") for _, _, e, *_ in rows],
                "n_events": [n for *_, n, _ in rows],
                "total_value": [t for *_, t in rows],
            }
        )

    def _held(state: GroupState):
        if not state.exists:
            return []
        starts, ends, ns, totals = state.get
        return [
            (int(s), int(e), int(n), float(t))
            for s, e, n, t in zip(starts, ends, ns, totals)
        ]

    def _hold(state: GroupState, sessions):
        state.update(
            (
                [s[0] for s in sessions],
                [s[1] for s in sessions],
                [s[2] for s in sessions],
                [s[3] for s in sessions],
            )
        )
        # the engine's timeout clock is ms-epoch; round the us-precision
        # earliest-held session end UP so the timeout never fires a
        # sub-ms early (one timeout per key on this API — armed for the
        # next session to ripen)
        state.setTimeoutTimestamp(
            -(-min(s[1] for s in sessions) // 1_000) + gap_ms
        )

    def update(key, pdfs, state: GroupState):
        wm_us = state.getCurrentWatermarkMs() * 1_000
        if state.hasTimedOut:
            # watermark passed the earliest held end + gap: finalize every
            # ripe session exactly once, keep (and re-arm for) the rest
            sessions = _held(state)
        else:
            # enforce the late-row contract ourselves (see docstring):
            # a row whose gap window the watermark already sealed can
            # only re-create a finalized session
            live = [
                p[(p["ts"].astype("int64") // 1_000) + gap_us > wm_us]
                for p in pdfs
            ]
            sessions = _sessionize_batch(live, gap_us, _held(state) or None)
            if not sessions:
                return
        ripe = [s for s in sessions if s[1] + gap_us <= wm_us]
        rest = [s for s in sessions if s[1] + gap_us > wm_us]
        if rest:
            _hold(state, rest)
        elif state.exists:
            state.remove()
        if ripe:
            yield emit([(key[0], *s) for s in ripe])

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
