"""Time-window aggregations over the events stream (north-star extension —
the reference is batch-only, SURVEY.md §2.9).

Each window shape is defined once and runs in BOTH modes: on a batch
DataFrame (used by the oracle-checked queries) and on a streaming DataFrame
(``readStream`` + watermark — exercised in tests with the file source and a
memory sink). Identical plan, identical semantics; that's the point of
Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_flow_spark.functions.aggregates import det_avg


def tumbling_stats(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window per-type stats. Batch + streaming compatible."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            det_avg("value").alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def sliding_stats(
    events: DataFrame, window: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding-window stats: each event lands in window/slide windows."""
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            det_avg("value").alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def session_stats(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Gap-based session windows per user: a session extends while events
    arrive within `gap` of the previous one. session_window's end is
    last-event + gap by definition, so the comparable outputs are the
    session start, the event count, and the observed last event time."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_event"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "last_event",
        )
    )


def stream_events(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    watermark: str = "2 hours",
    archive_dir: str | None = None,
) -> DataFrame:
    """File-source stream of event files with a watermark for late data —
    the streaming twin of the batch events table. New files appearing in
    source_dir become micro-batches (the production shape: a landing
    prefix on object storage).

    S5 (archive-after-load): pass ``archive_dir`` to move each source file
    out of the landing prefix once its micro-batch commits
    (``cleanSource=archive`` + ``sourceArchiveDir``) — the reference's
    shutil.move-to-archive after load
    (/root/reference/dags/raw/ingest_kaggle_data.py:204-212), giving the
    at-most-once-pickup guarantee a landing directory needs.

    Watermarks require TIMESTAMP (not TIMESTAMP_NTZ) event time; with the
    session timezone pinned to UTC the cast is value-preserving.
    ``watermark=None`` skips the watermark — for consumers that define
    their own on a derived column (e.g. the stream-stream interval join,
    where each side watermarks its renamed timestamp and a second
    definition in the lineage is disallowed)."""
    reader = spark.readStream.schema(schema)
    if archive_dir is not None:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    out = reader.parquet(source_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    if watermark is not None:
        out = out.withWatermark("ts", watermark)
    return out
