"""Structured Streaming parity: the same window shape must produce the same
result in streaming (file source → memory sink) and batch mode."""

from __future__ import annotations

import shutil

from market_flow_spark.streaming.windows import stream_events, tumbling_stats
from market_flow_spark.tables import load_table


def test_stream_events_archives_source_files(spark, sf_dir, tmp_path):
    """S5: with archive_dir set, processed landing files are moved out of
    the source prefix after their micro-batch commits (at-most-once
    pickup — the reference's move-to-archive after load)."""
    import time as _time

    events = load_table(spark, sf_dir, "events").limit(100)
    landing = tmp_path / "landing"
    archive = tmp_path / "archive"
    events.write.parquet(str(landing))
    schema = events.schema.simpleString().replace("struct<", "").rstrip(">").replace(
        ":", " "
    )
    stream = stream_events(
        spark, str(landing), schema=schema, archive_dir=str(archive)
    )
    for i in range(2):
        # the file-source cleaner archives a batch's files while processing
        # LATER batches, so run two availableNow rounds over one checkpoint
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if i == 0:  # second round needs new data to schedule a batch
            events.limit(10).write.mode("append").parquet(str(landing))
    # the cleaner runs async in the background; poll briefly
    deadline = _time.time() + 30
    archived = []
    while _time.time() < deadline:
        archived = list(archive.rglob("*.parquet")) if archive.exists() else []
        if archived:
            break
        _time.sleep(1)
    assert archived, "no source files were archived"


def test_stream_tumbling_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    # stage the event data as files appearing in a landing dir
    landing = str(tmp_path / "landing")
    events.write.parquet(landing)
    schema = events.schema.simpleString().replace("struct<", "").rstrip(">").replace(
        ":", " "
    )

    stream = stream_events(spark, landing, schema=schema, watermark="2 hours")
    agg = tumbling_stats(stream, "1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.avg_value)
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    from pyspark.sql import functions as F

    batch = {
        (r.window_start, r.event_type): (r.n_events, r.avg_value)
        for r in tumbling_stats(
            events.withColumn("ts", F.col("ts").cast("timestamp")), "1 hour"
        ).collect()
    }
    assert streamed == batch
    assert len(batch) > 0
    shutil.rmtree(landing, ignore_errors=True)


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream interval join (view→clicks within 1h)
    produces exactly the batch twin's pairs once all data is processed."""
    from pyspark.sql import functions as F

    from market_flow_spark.streaming.joins import (
        interval_join,
        view_click_attribution,
    )

    events = load_table(spark, sf_dir, "events")
    landing = str(tmp_path / "landing_ssj")
    events.write.parquet(landing)
    schema = events.schema.simpleString().replace("struct<", "").rstrip(">").replace(
        ":", " "
    )
    # two independent readers over the same landing dir: each side of a
    # stream-stream join needs its OWN watermark column, and defining two
    # watermarks over one shared source node is disallowed
    stream_v = stream_events(spark, landing, schema=schema, watermark=None)
    stream_c = stream_events(spark, landing, schema=schema, watermark=None)
    views = (
        stream_v.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_event_id"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    clicks = (
        stream_c.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_event_id"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    joined = interval_join(
        views, clicks, key="user_id", left_ts="view_ts",
        right_ts="click_ts", max_delay="1 hour",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = sorted(
        (r.view_event_id, r.click_event_id)
        for r in spark.sql("SELECT * FROM ssj_test").collect()
    )
    batch = sorted(
        (r.view_event_id, r.click_event_id)
        for r in view_click_attribution(events, "1 hour").collect()
    )
    assert streamed == batch and len(batch) > 0
