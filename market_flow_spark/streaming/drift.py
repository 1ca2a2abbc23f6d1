"""Streaming corpus-drift monitor: the streaming twin of the batch
KL-divergence drift operator (extensions/text.py token_kl_divergence).

A crawl ingest wants to know *as batches arrive* whether the incoming
token distribution still looks like the corpus it was tuned on — a
upstream site-mix change, an encoding regression, or a spam flood all
show up as distribution shift long before they show up in downstream
quality metrics. The monitor scores every micro-batch against a
PERSISTED reference distribution and appends one row per epoch to a
drift log; alerting is a filter on that log.

Shape: ``foreachBatch`` wrapping vocabulary-sized batch operators — the
same production pattern as the streaming dedup ingest
(streaming/ingest.py start_corpus_ingest_dedup): the reference lives in
the warehouse, not in stream state, so Structured Streaming's native
stateful operators are the wrong tool. Per batch: one batch-sized
tokenize/aggregate, then joins against the (vocab-sized, broadcastable)
reference counts. At 100 TB-scale ingest the cost per batch scales with
the batch, never with history.

Smoothing: unlike the batch operator (where every group token is in the
corpus by construction), a live batch can contain tokens the reference
has never seen, so Q needs mass there: add-one smoothing over the union
vocabulary, Q(t) = (c_ref(t) + 1) / (t_ref + |V_union|). P stays the
batch's exact empirical distribution. Same 1e-9 fixed-point
quantization as the batch operator, so the scores are deterministic and
replay-stable (at-least-once foreachBatch retries append duplicate
epoch rows; readers dedup on epoch_id — same contract as the ingest's
append path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KL_SCALE = 1_000_000_000  # shared with extensions.text.token_kl_divergence


def _token_counts(docs: DataFrame, text_col: str) -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        docs.select(F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def write_reference_distribution(
    docs: DataFrame, ref_counts_path: str, text_col: str = "text"
) -> None:
    """Persist the reference token-count table (tok, c) the monitor scores
    against — typically built from the accepted corpus at tuning time.
    One corpus explode into a map-side-combined aggregate; output is
    vocabulary-sized."""
    _token_counts(docs, text_col).write.mode("overwrite").parquet(ref_counts_path)


def batch_drift_score(
    batch: DataFrame, ref: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One-row DataFrame (n_tokens, vocab, novel_vocab, kl_nats): KL of the
    batch's token distribution from the add-one-smoothed reference. Pure
    batch DataFrame ops, so the streaming monitor and ad-hoc backfills
    share one implementation (and one set of tests)."""
    b = _token_counts(batch, text_col)
    ref = ref.select(F.col("tok"), F.col("c").alias("c_ref"))
    # Fail fast on a missing/empty reference: SUM over zero rows is NULL,
    # which would otherwise propagate through q into a silent null-KL log
    # row — a monitor that scores against nothing must stop, not log.
    t_ref = ref.agg(F.sum("c_ref")).first()[0]
    if not t_ref:
        raise ValueError(
            "drift reference has no token counts — write it with "
            "write_reference_distribution before attaching the monitor"
        )
    # union-vocabulary size: reference vocab + batch tokens unseen there
    joined = b.join(ref, "tok", "left")
    v_union = ref.select("tok").union(b.select("tok")).distinct().count()
    t_b = b.agg(F.sum("c").alias("t_b"))

    p = F.col("c").cast("double") / F.col("t_b")
    q = (F.coalesce(F.col("c_ref"), F.lit(0)) + F.lit(1)).cast("double") / F.lit(
        float(t_ref + v_union)
    )
    contrib_fx = F.floor(p * F.log(p / q) * F.lit(_KL_SCALE) + F.lit(0.5)).cast(
        "long"
    )
    return (
        joined.crossJoin(F.broadcast(t_b))
        .agg(
            F.max("t_b").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum(
                F.when(F.col("c_ref").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("novel_vocab"),
            (F.sum(contrib_fx).cast("double") / F.lit(float(_KL_SCALE))).alias(
                "kl_nats"
            ),
        )
    )


def start_drift_monitor(
    doc_stream: DataFrame,
    ref_counts_path: str,
    log_path: str,
    checkpoint: str,
    text_col: str = "text",
):
    """Attach the drift monitor to a document stream: every micro-batch is
    scored against the persisted reference and one (epoch_id, n_tokens,
    vocab, novel_vocab, kl_nats) row is appended to the drift log.
    Returns the un-started writeStream (callers pick the trigger), same
    convention as start_corpus_ingest_dedup."""

    def score_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # skip empty AND tokenless batches (nothing to score; an all-empty-
        # text batch would log a null-KL row)
        if batch_df.isEmpty() or _token_counts(batch_df, text_col).isEmpty():
            return
        ref = spark.read.parquet(ref_counts_path)
        row = batch_drift_score(batch_df, ref, text_col=text_col).withColumn(
            "epoch_id", F.lit(int(epoch_id)).cast("bigint")
        )
        row.select("epoch_id", "n_tokens", "vocab", "novel_vocab", "kl_nats").write.mode(
            "append"
        ).parquet(log_path)

    return (
        doc_stream.writeStream.foreachBatch(score_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
