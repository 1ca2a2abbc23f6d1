"""Context-window sequence packing for LLM training-data builds
(north-star extension; no counterpart in the reference, which never
prepares model inputs — its ML surface is per-group Prophet fits,
server/forecast_utils.py:21-34).

The GPT-style packing semantic: documents are concatenated in a fixed
deterministic order and the token stream is cut into fixed-size context
windows, so a document may straddle a window boundary. That semantic is a
pure prefix-sum — exactly expressible as a window cumulative sum, no
stateful loop — which is what makes it (a) one shuffle+sort per shard on a
cluster and (b) bit-exactly oracle-checkable (all-integer arithmetic).

Scale shape: documents are hash-sharded (content-addressed, so the layout
is stable under re-runs and appends) and the cumulative sum runs PER
SHARD — each shard is an independent sort, so a 100 TB corpus packs with
`n_shards`-way parallelism and no global sort. The shard count is the
parallelism knob; packs never cross shards (each shard yields its own
pack sequence), matching how real pipelines write one packed output file
per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    context_len: int = 256,
    n_shards: int = 8,
    text_col: str = "text",
    chars_per_token: int = 4,
    tokens_col: str | None = None,
) -> DataFrame:
    """Assign every document its position in the packed token stream.

    Token counts use the chars/4 heuristic (ceil(len/4); the same
    estimator as `text.approx_bpe_tokens`) so the operator is a pure
    scan; pass ``tokens_col`` to pack by an exact per-document token
    count computed upstream (a real tokenizer's output) instead.

    Returns one row per document:
      (doc_id, shard, n_tokens, start_pack, end_pack, start_offset)
    where `start_pack`/`end_pack` are the first/last context windows the
    document's tokens land in and `start_offset` is the position of its
    first token inside `start_pack`. Documents with zero tokens (NULL/empty
    text) get end_pack = start_pack and occupy no stream positions.
    """
    if tokens_col is not None:
        n_tokens = F.coalesce(F.col(tokens_col), F.lit(0)).cast("bigint")
    else:
        n_tokens = F.ceil(
            F.length(F.coalesce(F.col(text_col), F.lit("")))
            / F.lit(float(chars_per_token))
        ).cast("bigint")
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("bigint"),
        F.lit(n_shards),
    ).cast("int")
    base = docs.select(
        "doc_id", shard.alias("shard"), n_tokens.alias("n_tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        base.withColumn("cum_before", cum_before)
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            F.floor(F.col("cum_before") / context_len)
            .cast("bigint")
            .alias("start_pack"),
            F.floor(
                (
                    F.col("cum_before")
                    + F.greatest(F.col("n_tokens"), F.lit(1))
                    - F.lit(1)
                )
                / context_len
            )
            .cast("bigint")
            .alias("end_pack"),
            F.pmod(F.col("cum_before"), F.lit(context_len))
            .cast("bigint")
            .alias("start_offset"),
        )
    )


def pack_utilization(packed: DataFrame, context_len: int = 256) -> DataFrame:
    """Per-shard packing summary from :func:`pack_sequences` output:
    document and token totals, number of context windows consumed, and the
    fill ratio of the final (only partially filled) window's stream —
    the waste metric packing exists to minimize."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            F.ceil(F.col("total_tokens") / F.lit(float(context_len)))
            .cast("bigint")
            .alias("n_packs"),
        )
    )


def pack_sequences_oracle_sql(
    context_len: int = 256, n_shards: int = 8, chars_per_token: int = 4
) -> str:
    """DuckDB twin of :func:`pack_sequences` over the `documents` view —
    all-integer arithmetic, so the match is exact, not tolerance-based."""
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(CAST('0x' || substring(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % {n_shards} AS INT) AS shard,
         CAST(CEIL(length(COALESCE(text, '')) / {float(chars_per_token)}) AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, shard, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM base
)
SELECT doc_id, shard, n_tokens,
       CAST(FLOOR(cum_before / {context_len}) AS BIGINT) AS start_pack,
       CAST(FLOOR((cum_before + GREATEST(n_tokens, 1) - 1) / {context_len}) AS BIGINT) AS end_pack,
       CAST(cum_before % {context_len} AS BIGINT) AS start_offset
FROM cum
"""


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = 512,
    overlap: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-width overlapping character chunks — the
    RAG-indexing / long-document-training prep step. Chunk i covers
    [i·step, i·step + chunk_chars) with step = chunk_chars - overlap;
    starts are emitted while they fall inside the text, so every character
    lands in ≥ 1 chunk and consecutive chunks share `overlap` characters.

    Pure row-wise explode (sequence/transform/substring): no shuffle, no
    UDF — a map-only pass at any corpus size. NULL/empty documents emit no
    chunks. Returns (doc_id, chunk_idx, start_char, chunk_text)."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    t = F.col(text_col)
    n_chunks = F.when(
        t.isNull() | (F.length(t) == 0), F.lit(0)
    ).otherwise(F.ceil(F.length(t) / F.lit(float(step))).cast("int"))
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: i * step
    )
    exploded = docs.select(
        "doc_id",
        t.alias("__t"),
        F.explode(
            F.when(n_chunks > 0, starts).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("start_char"),
    )
    return exploded.select(
        "doc_id",
        (F.col("start_char") / step).cast("int").alias("chunk_idx"),
        "start_char",
        F.substring(F.col("__t"), F.col("start_char") + 1, chunk_chars).alias(
            "chunk_text"
        ),
    )


def chunk_documents_oracle_sql(chunk_chars: int = 512, overlap: int = 64) -> str:
    """DuckDB twin of :func:`chunk_documents` over the `documents` view."""
    step = chunk_chars - overlap
    return f"""
WITH n AS (
  SELECT doc_id, text,
         CASE WHEN text IS NULL OR length(text) = 0 THEN 0
              ELSE CAST(CEIL(length(text) / {float(step)}) AS INT) END AS n_chunks
  FROM documents
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       CAST(i * {step} AS INT) AS start_char,
       substr(text, CAST(i * {step} + 1 AS INT), {chunk_chars}) AS chunk_text
FROM n, unnest(range(0, n_chunks)) AS u(i)
"""
