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


def dedup_url_stream(
    pages: DataFrame, url_col: str = "url", watermark_col: str = "fetch_ts"
) -> DataFrame:
    """Streaming crawl-feed URL dedup: canonicalize in the stream
    projection, then exactly-once-per-canonical-URL within the watermark
    horizon. The canonicalization is scan-local column algebra (no state);
    only the per-canonical dedup key lives in the state store, and
    watermark eviction bounds it — the property that lets a continuous
    crawl feed run forever. Caller must have set
    ``withWatermark(watermark_col, ...)`` upstream."""
    from market_flow_spark.extensions.web import canonical_url

    return pages.withColumn(
        "canonical_url", canonical_url(F.col(url_col))
    ).dropDuplicatesWithinWatermark(["canonical_url"])


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


def start_corpus_ingest_dedup(
    doc_stream: DataFrame,
    corpus_path: str,
    checkpoint: str,
    threshold: float = 0.8,
):
    """Continuously deduplicated corpus ingest — the streaming form of the
    incremental MinHash operator: every micro-batch of documents is

    1. deduped WITHIN the batch (pair graph → connected components → keep
       minimum doc_id per cluster), then
    2. banded AGAINST the accumulated corpus (``minhash_lsh_pairs_against``
       — cross-side band joins only, cost scales with the batch), and
    3. only novel survivors are appended to the corpus.

    The heavy streaming machinery is exactly the batch operators — the
    candidate/verify plans are identical — wrapped in ``foreachBatch``,
    which is the production shape for stateful-against-external-store
    logic Structured Streaming cannot express natively (the corpus index
    lives in the warehouse, not in stream state). Delivery is
    at-least-once on retry (append + checkpoint); the downstream exact
    tier makes replays harmless."""
    from pyspark.sql import functions as sf

    from market_flow_spark.extensions.dedup import (
        dedup_keep_list,
        minhash_lsh_pairs,
        minhash_lsh_pairs_against,
    )

    def dedup_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            within = minhash_lsh_pairs(batch_df, threshold=threshold)
            keepers = dedup_keep_list(batch_df, within).filter("keep").select(
                "doc_id"
            )
            batch_keep = batch_df.join(keepers, "doc_id", "left_semi")
            # only a MISSING corpus means "first batch" — any other read
            # failure (corrupt footer, storage fault) must fail the batch
            # loudly rather than silently skip the cross-corpus dedup and
            # append near-duplicates forever
            from pyspark.errors import AnalysisException

            try:
                corpus = spark.read.parquet(corpus_path)
            except AnalysisException as ex:
                if "PATH_NOT_FOUND" not in str(ex) and "Path does not exist" not in str(ex):
                    raise
                corpus = None
            if corpus is not None:
                dups = (
                    minhash_lsh_pairs_against(
                        batch_keep, corpus, threshold=threshold
                    )
                    .select(sf.col("new_doc_id").alias("doc_id"))
                    .distinct()
                )
                novel = batch_keep.join(dups, "doc_id", "left_anti")
            else:
                novel = batch_keep
            novel.write.mode("append").parquet(corpus_path)
        finally:
            batch_df.unpersist()

    return (
        doc_stream.writeStream.foreachBatch(dedup_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
