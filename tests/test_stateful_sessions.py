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
