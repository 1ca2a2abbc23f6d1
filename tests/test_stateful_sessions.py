"""applyInPandasWithState session finalizer: event-time timeouts emit each
session exactly once, state clears after emission, equivalence with the
batch session_window aggregate on closed sessions.

This is the EXECUTED verification of the session design that
tests/test_tws_sessions.py can only run where protobuf is installed (the
Spark-4 transformWithStateInPandas worker needs it): the two operators
share semantics and output schema by construction, so green here certifies
the state design itself; the tws module is a port of this verified logic
onto the newer typed-handle/timer API.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from market_flow_spark.streaming.stateful import finalized_user_sessions_legacy

SCHEMA = "user_id bigint, ts timestamp, value double"


def _write_batch(spark, rows, landing):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        landing
    )


def test_sessions_emit_once_on_watermark(spark, tmp_path):
    landing = str(tmp_path / "landing")
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def ts(sec):
        return (t0 + pd.Timedelta(seconds=sec)).to_pydatetime()

    # batch 1: user 1 has a 2-event burst; user 2 one event
    _write_batch(
        spark,
        [(1, ts(0), 1.0), (1, ts(10), 2.0), (2, ts(5), 5.0)],
        landing,
    )
    # batch 2: far-future event advances the watermark past both sessions'
    # gap, closing them; also opens a new session for user 3
    _write_batch(spark, [(3, ts(10_000), 7.0)], landing)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(landing)
    )
    out = finalized_user_sessions_legacy(stream, gap="1 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("legacy_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    rows = {
        r["user_id"]: r
        for r in spark.sql("SELECT * FROM legacy_sessions").collect()
    }
    # users 1 and 2 closed (watermark passed end+gap); user 3 still open
    assert set(rows) == {1, 2}
    assert rows[1]["n_events"] == 2 and rows[1]["total_value"] == 3.0
    assert rows[1]["session_start"] == ts(0)
    assert rows[1]["session_end"] == ts(10)
    assert rows[2]["n_events"] == 1 and rows[2]["total_value"] == 5.0

    # exactly once: no duplicate emission rows
    all_rows = spark.sql("SELECT * FROM legacy_sessions").collect()
    assert len(all_rows) == 2


def test_gap_extension_keeps_one_session(spark, tmp_path):
    """Events within the gap across micro-batches extend ONE session
    (timeout re-armed), not two."""
    landing = str(tmp_path / "landing")
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def ts(sec):
        return (t0 + pd.Timedelta(seconds=sec)).to_pydatetime()

    _write_batch(spark, [(1, ts(0), 1.0)], landing)
    _write_batch(spark, [(1, ts(30), 1.0)], landing)  # within 1-minute gap
    _write_batch(spark, [(1, ts(10_000), 9.0)], landing)  # closes it

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(landing)
    )
    out = finalized_user_sessions_legacy(stream, gap="1 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("legacy_ext")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    rows = spark.sql("SELECT * FROM legacy_ext ORDER BY session_start").collect()
    assert len(rows) == 1  # merged, and the t=10000 session is still open
    assert rows[0]["n_events"] == 2
    assert rows[0]["session_start"] == ts(0)
    assert rows[0]["session_end"] == ts(30)


def test_delayed_watermark_late_event_bridges_emitonce(spark, tmp_path):
    """watermark_delay >= gap emit-once regression (round-7 advice): with
    delay > 0, an in-batch event beyond the gap does NOT finalize the
    earlier session — a later micro-batch may still deliver an admissible
    event (ts >= watermark) inside that session's gap window, extending
    it or bridging it into its neighbor. The old code emitted
    sessions[:-1] immediately and would have produced TWO rows here;
    watermark-gated emission produces exactly ONE merged session.

    Timeline (gap 1 min, delay 2 min, all user 1):
      batch 1: t=0s, t=10s (session A) and t=100s (B — beyond A's gap;
               in-batch evidence alone would close A). Watermark after
               batch 1 = max(100s) - 120s < 0 -> 0: A must stay held.
      batch 2: late event t=50s (>= watermark 0, admissible) — lands in
               A's gap window AND within gap of B: bridges A and B into
               one session [0s, 100s] with 4 events.
      batch 3: sentinel user at t=100000s advances the watermark past
               100s + gap, ripening the merged session via the timeout.
    """
    landing = str(tmp_path / "landing")
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def ts(sec):
        return (t0 + pd.Timedelta(seconds=sec)).to_pydatetime()

    _write_batch(
        spark, [(1, ts(0), 1.0), (1, ts(10), 2.0), (1, ts(100), 4.0)], landing
    )
    _write_batch(spark, [(1, ts(50), 3.0)], landing)
    _write_batch(spark, [(999, ts(100_000), 0.0)], landing)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(landing)
    )
    out = finalized_user_sessions_legacy(
        stream, gap="1 minutes", watermark_delay="2 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("legacy_delay")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    rows = spark.sql(
        "SELECT * FROM legacy_delay WHERE user_id = 1 ORDER BY session_start"
    ).collect()
    assert len(rows) == 1  # ONE merged session, not a premature A + rest
    assert rows[0]["session_start"] == ts(0)
    assert rows[0]["session_end"] == ts(100)
    assert rows[0]["n_events"] == 4
    assert rows[0]["total_value"] == 10.0


def test_closed_sessions_match_batch_session_window(spark, sf_dir, tmp_path):
    """On the events table (plus a watermark-advancing sentinel), the
    streamed finalized sessions equal the batch session_window aggregate —
    the operator is the streaming twin of the in-window session query."""
    from market_flow_spark.tables import load_table

    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
        .limit(2000)
    )
    landing = str(tmp_path / "landing")
    events.coalesce(1).write.mode("append").parquet(landing)
    sentinel_ts = events.agg(
        (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("m")
    ).first()["m"]
    _write_batch(spark, [(999_999, sentinel_ts, 0.0)], landing)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    out = finalized_user_sessions_legacy(stream, gap="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("legacy_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in spark.sql("SELECT * FROM legacy_parity").collect()
    }
    exp = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in events.groupBy(
            "user_id", F.session_window("ts", "5 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            # session_window's end is last_event + gap; the finalizer
            # reports the LAST EVENT — align by subtracting the gap
            (F.col("w.end") - F.expr("INTERVAL 5 MINUTES")).alias("session_end"),
            "n_events",
            "total_value",
        )
        .collect()
    }
    assert got == exp


# ---- property test for the shared session core (no Spark involved) ----

from hypothesis import given, settings
from hypothesis import strategies as st

from market_flow_spark.streaming.stateful import _sessionize_batch


def _naive_sessions(ts_us_sorted, vals, gap_us):
    out = []
    for t, v in zip(ts_us_sorted, vals):
        if out and t <= out[-1][1] + gap_us:
            s, e, n, tot = out[-1]
            out[-1] = (s, max(e, t), n + 1, tot + v)
        else:
            out.append((t, t, 1, v))
    return out


def _naive_fold_units(units, gap_us):
    """Event-at-a-time fold over start-sorted units, each an atomic
    (start, end, n, total) interval (batch events are point intervals,
    the carried open session an interval summary): a unit joins the
    current session iff its start is within gap of the current end —
    the symmetric interval-gap rule."""
    out = []
    for s, e, n, v in sorted(units, key=lambda u: (u[0], u[1])):
        if out and s <= out[-1][1] + gap_us:
            ps, pe, pn, pt = out[-1]
            out[-1] = (ps, max(pe, e), pn + n, pt + v)
        else:
            out.append((s, e, n, v))
    return out


@settings(max_examples=200, deadline=None)
@given(
    ts=st.lists(st.integers(0, 10_000_000), min_size=1, max_size=60),
    gap_us=st.integers(1, 2_000_000),
    carry=st.sampled_from(["none", "before", "inside", "after"]),
    span=st.integers(0, 3_000_000),
)
def test_sessionize_batch_matches_naive(ts, gap_us, carry, span):
    """The vectorized diff/split sessionizer equals an event-at-a-time
    fold for any event-time multiset and gap — including a carried open
    session placed before, within, or after the batch's span (the
    round-6 advice's late-batch case: a batch entirely preceding the
    open session by more than the gap must NOT merge into it)."""
    ts_sorted = sorted(ts)
    vals = [float(i) for i in range(len(ts_sorted))]
    order = sorted(range(len(ts)), key=lambda i: ts[i])
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([t * 1_000 for t in ts], unit="ns"),
            "value": [vals[order.index(i)] for i in range(len(ts))],
        }
    )
    starts = {
        "none": None,
        "before": -5_000_000,
        "inside": ts_sorted[len(ts_sorted) // 2],
        "after": ts_sorted[-1] + 500_000,
    }[carry]
    open_state = None if starts is None else (starts, starts + span, 2, 7.0)
    got = _sessionize_batch([pdf], gap_us, open_state)

    units = [(t, t, 1, v) for t, v in zip(ts_sorted, vals)]
    if open_state is not None:
        units.append(open_state)
    exp = _naive_fold_units(units, gap_us)
    assert [(s, e, n) for s, e, n, _ in got] == [(s, e, n) for s, e, n, _ in exp]
    for (_, _, _, g), (_, _, _, x) in zip(got, exp):
        assert abs(g - x) < 1e-9


def test_late_batch_before_open_session_stays_separate():
    """watermark_delay >= gap regression (round-6 advice): a late batch
    lying entirely BEFORE the carried open session by more than the gap
    must come back as its own CLOSED session, ordered before the open
    one — the old one-sided `first_start <= open_end + gap` test merged
    it (trivially true) and could emit the open session out of order."""
    gap_us = 1_000_000
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([0, 100_000], unit="us"),
            "value": [1.0, 2.0],
        }
    )
    open_state = (10_000_000, 10_500_000, 3, 9.0)
    got = _sessionize_batch([pdf], gap_us, open_state)
    assert got == [(0, 100_000, 2, 3.0), (10_000_000, 10_500_000, 3, 9.0)]


def test_open_session_bridges_two_batch_sessions():
    """A carried open session whose interval sits between two batch
    sessions and is within gap of BOTH collapses all three into one —
    only a full merge pass (not a first-session-only merge) gets this."""
    gap_us = 1_000_000
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([0, 100, 5_000_000, 5_000_100], unit="us"),
            "value": [1.0, 1.0, 1.0, 1.0],
        }
    )
    open_state = (900_000, 4_500_000, 5, 10.0)
    got = _sessionize_batch([pdf], gap_us, open_state)
    assert got == [(0, 5_000_100, 9, 14.0)]


def test_batch_user_sessions_via_core(spark):
    """The batch twin (applyInPandas over the shared _sessionize_batch
    core) sessionizes a multi-user history correctly, including the
    exact-gap boundary: an event landing EXACTLY gap after the session
    end stays in the session (diff > gap starts a new one), one past it
    does not."""
    from market_flow_spark.streaming.stateful import batch_user_sessions

    gap_us = 300_000_000  # 5 minutes
    rows = [
        # user 1: three events chained at exactly-gap spacing -> ONE session
        (1, 0, 1.0),
        (1, gap_us, 2.0),
        (1, 2 * gap_us, 3.0),
        # then one event gap+1us after the end -> second session
        (1, 3 * gap_us + 1, 4.0),
        # user 2: a single event
        (2, 42, 7.0),
    ]
    pdf = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
            "value": [r[2] for r in rows],
        }
    )
    out = (
        batch_user_sessions(spark.createDataFrame(pdf), "5 minutes")
        .orderBy("user_id", "session_start")
        .collect()
    )
    got = [
        (
            r["user_id"],
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
            r["n_events"],
            r["total_value"],
        )
        for r in out
    ]
    assert got == [
        (1, 0, 2 * gap_us, 3, 6.0),
        (1, 3 * gap_us + 1, 3 * gap_us + 1, 1, 4.0),
        (2, 42, 42, 1, 7.0),
    ]
