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
