"""Streaming ingest pipeline (north-star extension): the landing-zone →
warehouse shape a continuous 100 TB pipeline runs.

    files land in a prefix
      → file-source stream (schema-pinned, archive-after-read)
      → watermarked dedup on the event key (late duplicates dropped once
        they're older than the watermark — bounded state)
      → tumbling aggregation
      → foreachBatch upsert into partitioned parquet (idempotent per
        micro-batch via checkpointing + overwrite-by-partition)

Each stage is the streaming twin of a batch operator already in the
engine (exact dedup, tumbling_stats, upsert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from market_flow_spark.functions.aggregates import det_avg


def dedup_stream(events: DataFrame, key: str = "event_id") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon: duplicates of a
    key arriving inside the watermark are dropped; state for keys older
    than the watermark is evicted (bounded memory — the property that lets
    this run forever)."""
    return events.dropDuplicatesWithinWatermark([key])


def hourly_stats_stream(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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


def start_ingest(
    stream: DataFrame,
    warehouse_path: str,
    checkpoint: str,
    key: str = "event_id",
):
    """Wire the full pipeline and start it (availableNow semantics are the
    caller's choice via trigger on the returned writer)."""
    deduped = dedup_stream(stream, key)
    stats = hourly_stats_stream(deduped)

    def upsert_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # per-micro-batch upsert: replace the touched windows only —
        # dynamic partition overwrite keeps untouched history intact
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            batch_df.withColumn("window_date", F.to_date("window_start"))
            .write.mode("overwrite")
            .partitionBy("window_date")
            .parquet(warehouse_path)
        )

    return (
        stats.writeStream.foreachBatch(upsert_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
