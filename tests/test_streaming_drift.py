"""Streaming corpus-drift monitor (streaming/drift.py): per-micro-batch
token-KL against a persisted reference — the streaming twin of the batch
corpus_kl_by_lang operator, via the same foreachBatch production pattern
as the streaming dedup ingest."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from market_flow_spark.streaming.drift import (
    batch_drift_score,
    start_drift_monitor,
    write_reference_distribution,
)

SCHEMA = "doc_id long, text string"


def test_batch_drift_score_hand_computed(spark, tmp_path):
    """Small enough to replicate in plain Python with the same add-one
    smoothing and 1e-9 quantization."""
    ref_docs = spark.createDataFrame(
        [(1, "x x x y")], SCHEMA
    )  # ref counts: x=3, y=1; t_ref=4
    ref_path = str(tmp_path / "ref")
    write_reference_distribution(ref_docs, ref_path)
    ref = spark.read.parquet(ref_path)

    batch = spark.createDataFrame([(2, "x y z")], SCHEMA)  # z unseen
    row = batch_drift_score(batch, ref).collect()[0]

    # python replica: V_union = {x, y, z} = 3, t_ref = 4
    scale = 1_000_000_000
    c_ref = {"x": 3, "y": 1, "z": 0}
    s = 0
    for tok in ("x", "y", "z"):
        p = 1 / 3
        q = (c_ref[tok] + 1) / (4 + 3)
        s += math.floor(p * math.log(p / q) * scale + 0.5)
    want = s / scale

    assert row["n_tokens"] == 3
    assert row["vocab"] == 3
    assert row["novel_vocab"] == 1
    assert abs(row["kl_nats"] - want) < 1e-9


def test_batch_matching_distribution_scores_near_zero(spark, tmp_path):
    """A batch drawn from the reference distribution itself scores ~0 —
    only the smoothing mass moves it off exactly 0 — while a disjoint-
    vocabulary batch scores far higher."""
    ref_docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(50)], SCHEMA
    )
    ref_path = str(tmp_path / "ref")
    write_reference_distribution(ref_docs, ref_path)
    ref = spark.read.parquet(ref_path)

    same = spark.createDataFrame([(1, "alpha beta gamma delta")], SCHEMA)
    drifted = spark.createDataFrame([(2, "zork quux blarg frotz")], SCHEMA)
    kl_same = batch_drift_score(same, ref).collect()[0]["kl_nats"]
    kl_drift = batch_drift_score(drifted, ref).collect()[0]["kl_nats"]
    assert kl_same < 0.1
    assert kl_drift > 1.0
    assert kl_drift > 10 * max(kl_same, 1e-9)


def test_streaming_monitor_logs_one_row_per_batch(spark, tmp_path):
    """availableNow run over two landed batches appends two epoch rows;
    the drifted batch scores strictly higher than the in-distribution
    one. Scores must equal the shared batch scorer's (one implementation,
    replay-stable)."""
    ref_docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(20)], SCHEMA
    )
    ref_path = str(tmp_path / "ref")
    write_reference_distribution(ref_docs, ref_path)

    landing = tmp_path / "landing"
    landing.mkdir()
    log_path = str(tmp_path / "driftlog")
    ck = str(tmp_path / "ck")

    spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta alpha beta")], SCHEMA
    ).coalesce(1).write.parquet(str(landing / "b1"))
    spark.createDataFrame(
        [(3, "zork quux blarg frotz nix")], SCHEMA
    ).coalesce(1).write.parquet(str(landing / "b2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    q = (
        start_drift_monitor(stream, ref_path, log_path, ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    log = spark.read.parquet(log_path).orderBy("epoch_id").collect()
    assert len(log) == 2
    assert all(r["kl_nats"] is not None for r in log)
    by_novel = sorted(log, key=lambda r: r["novel_vocab"])
    assert by_novel[0]["novel_vocab"] == 0  # in-distribution batch
    assert by_novel[1]["novel_vocab"] == 5  # fully novel batch
    assert by_novel[1]["kl_nats"] > by_novel[0]["kl_nats"]

    # replay-stability: the logged score equals the batch scorer's output
    ref = spark.read.parquet(ref_path)
    b2 = spark.createDataFrame([(3, "zork quux blarg frotz nix")], SCHEMA)
    expect = batch_drift_score(b2, ref).collect()[0]["kl_nats"]
    assert by_novel[1]["kl_nats"] == expect


def test_tokenless_batch_is_skipped(spark, tmp_path):
    """Empty-text batches log nothing (no null-KL rows)."""
    ref_docs = spark.createDataFrame([(1, "alpha beta")], SCHEMA)
    ref_path = str(tmp_path / "ref")
    write_reference_distribution(ref_docs, ref_path)

    landing = tmp_path / "landing"
    landing.mkdir()
    log_path = str(tmp_path / "driftlog")
    ck = str(tmp_path / "ck")
    spark.createDataFrame([(1, "   ")], SCHEMA).coalesce(1).write.parquet(
        str(landing / "b1")
    )
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = (
        start_drift_monitor(stream, ref_path, log_path, ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    import pathlib

    logged = list(pathlib.Path(log_path).glob("*.parquet"))
    assert not logged or spark.read.parquet(log_path).count() == 0
