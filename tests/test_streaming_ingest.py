"""End-to-end streaming ingest: dedup within watermark + windowed stats +
foreachBatch partitioned upsert."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_flow_spark.streaming.ingest import dedup_stream, start_ingest
from market_flow_spark.tables import load_table


def _landing(spark, sf_dir, tmp_path, with_duplicates: bool):
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    landing = str(tmp_path / "landing")
    sample = events.limit(500).coalesce(1)
    sample.write.mode("append").parquet(landing)
    if with_duplicates:
        sample.write.mode("append").parquet(landing)  # full duplicate file
    return events, landing


def test_stream_dedup_drops_duplicates(spark, sf_dir, tmp_path):
    events, landing = _landing(spark, sf_dir, tmp_path, with_duplicates=True)
    stream = (
        spark.readStream.schema(events.schema)
        .parquet(landing)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "24 hours")
    )
    q = (
        dedup_stream(stream, "event_id")
        .groupBy()
        .count()
        .writeStream.format("memory")
        .queryName("dedup_count")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT * FROM dedup_count").collect()[0]["count"]
    assert n == 500  # 1000 rows ingested, every event_id seen once


def test_full_ingest_pipeline(spark, sf_dir, tmp_path):
    events, landing = _landing(spark, sf_dir, tmp_path, with_duplicates=True)
    warehouse = str(tmp_path / "wh")
    stream = (
        spark.readStream.schema(events.schema)
        .parquet(landing)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "24 hours")
    )
    writer = start_ingest(stream, warehouse, str(tmp_path / "ck2"))
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    out = spark.read.parquet(warehouse)
    # totals must equal the deduped batch equivalent
    batch = events.limit(500)
    expected = batch.count()
    got = out.agg(F.sum("n_events")).collect()[0][0]
    assert got == expected, f"pipeline emitted {got} events, expected {expected}"
    # partitioned layout by window_date exists
    import pathlib

    parts = [p.name for p in pathlib.Path(warehouse).iterdir()
             if p.name.startswith("window_date=")]
    assert parts


def test_streaming_corpus_ingest_dedup(spark, tmp_path):
    """Streaming incremental dedup: batch 1 lands {A, B~A} -> corpus keeps
    only A; batch 2 lands {C~A, D novel} -> corpus gains only D. Each
    micro-batch runs within-batch components + cross-corpus band joins —
    the batch operators wrapped in foreachBatch."""
    from market_flow_spark.streaming.ingest import start_corpus_ingest_dedup

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    other = ("completely different content about financial markets and "
             "commodity price indices moving through seasonal cycles")
    landing = tmp_path / "landing"
    landing.mkdir()
    corpus_path = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck_dedup")
    schema = "doc_id long, text string"

    def run_once():
        # the landing batches arrive as subdirectories — glob them (the
        # file stream source does not recurse by default)
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(landing) + "/*")
        q = (
            start_corpus_ingest_dedup(stream, corpus_path, ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(
        [(1, base), (2, base + " extra")], schema
    ).coalesce(1).write.parquet(str(landing / "b1"))
    run_once()
    assert {r.doc_id for r in spark.read.parquet(corpus_path).collect()} == {1}

    spark.createDataFrame(
        [(3, base), (4, other)], schema
    ).coalesce(1).write.parquet(str(landing / "b2"))
    run_once()
    assert {r.doc_id for r in spark.read.parquet(corpus_path).collect()} == {1, 4}


def test_ingest_replay_with_same_checkpoint_is_idempotent(
    spark, sf_dir, tmp_path
):
    """Re-starting the availableNow ingest against the SAME checkpoint
    with no new files must add nothing — the exactly-once property the
    checkpoint exists to provide (a crashed-and-restarted nightly load
    must not double the warehouse)."""
    events, landing = _landing(spark, sf_dir, tmp_path, with_duplicates=False)
    warehouse = str(tmp_path / "wh_idem")
    ck = str(tmp_path / "ck_idem")

    def run_once():
        stream = (
            spark.readStream.schema(events.schema)
            .parquet(landing)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "24 hours")
        )
        q = start_ingest(stream, warehouse, ck).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(warehouse).agg(F.sum("n_events")).collect()[0][0]
    run_once()  # replay: same checkpoint, no new data
    second = spark.read.parquet(warehouse).agg(F.sum("n_events")).collect()[0][0]
    assert first == second, f"replay changed totals: {first} -> {second}"


def test_stream_url_dedup_canonicalizes_before_keying(spark, tmp_path):
    """Crawl-feed shape: four surface forms of ONE canonical URL plus one
    distinct URL arrive in-stream; dropDuplicatesWithinWatermark keyed on
    the canonical form keeps exactly two pages."""
    from market_flow_spark.streaming.ingest import dedup_url_stream

    rows = [
        (1, "2024-01-01 00:00:00", "https://example.com/a"),
        (2, "2024-01-01 00:01:00", "HTTPS://WWW.EXAMPLE.COM/a"),
        (3, "2024-01-01 00:02:00", "https://example.com/a/"),
        (4, "2024-01-01 00:03:00", "https://example.com/a?utm_source=x"),
        (5, "2024-01-01 00:04:00", "https://example.com/b"),
    ]
    landing = str(tmp_path / "crawl")
    df = spark.createDataFrame(rows, ["page_id", "fetch_ts", "url"]).withColumn(
        "fetch_ts", F.col("fetch_ts").cast("timestamp")
    )
    df.coalesce(1).write.parquet(landing)
    stream = (
        spark.readStream.schema(df.schema)
        .parquet(landing)
        .withWatermark("fetch_ts", "1 hour")
    )
    q = (
        dedup_url_stream(stream)
        .writeStream.format("memory")
        .queryName("url_dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_url"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT canonical_url FROM url_dedup_out ORDER BY canonical_url"
    ).collect()
    assert [r["canonical_url"] for r in out] == [
        "https://example.com/a",
        "https://example.com/b",
    ]
