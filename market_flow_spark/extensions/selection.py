"""Data selection via hashed-n-gram importance weighting (DSIR-style;
Xie et al., "Data Selection for Language Models via Importance Resampling",
NeurIPS 2023) — pick raw-corpus documents that look like a target domain.

The published recipe, re-expressed as pure DataFrame algebra:

1. **Featurize**: every document becomes a bag of hashed unigram+bigram
   features — ``bucket = md5(feature) mod n_buckets``. Hashing fixes the
   feature space at ``n_buckets`` regardless of vocabulary, so all model
   state below is bounded and broadcastable.
2. **Fit** two bag-of-hashed-n-grams unigram models — one on the target
   corpus, one on the raw corpus: per-bucket occurrence counts with
   Laplace (+alpha) smoothing. Each model is ONE aggregate whose key
   domain is ``n_buckets`` (thousands of rows at any corpus size).
3. **Score**: a document's importance log-weight is
   ``sum_b c_doc(b) * [ln p_target(b) - ln p_raw(b)]`` — the
   log-likelihood ratio of the doc under the two models. The per-bucket
   log-ratio table is bucket-bounded, so scoring is a broadcast join onto
   the per-doc bucket counts plus one per-doc sum.
4. **Select**: keep the top-k raw documents by weight (``dsir_topk``,
   which plans as TakeOrdered — no global sort), or resample by weight.

Scale shape at 100 TB: two corpus-sized tokenize+explode passes (map-only
into map-side-combined aggregates), every model artifact bounded by
``n_buckets``, no self-joins, no driver state.

Determinism: the per-bucket log-ratio is quantized to 1e-6 fixed point
(BIGINT) immediately after the ``ln`` calls, so the per-document sum is
exact integer arithmetic — associativity-safe under any partitioning, and
bit-reproducible in DuckDB for the oracle (same md5 bucketing, same
smoothing expression, same quantization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from market_flow_spark.sources.layout import spread_to_cores as _spread

DEFAULT_BUCKETS = 4096
_LR_SCALE = 1_000_000  # 1e-6 fixed-point quantization of the log-ratio


def hashed_feature_counts(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    bigrams: bool = True,
) -> DataFrame:
    """(doc_id, bucket, c): per-document hashed n-gram occurrence counts.

    Tokens are the corpus-wide convention (trim/lower/split on whitespace;
    NULL/empty text yields no features); features are the tokens plus, when
    ``bigrams``, each adjacent pair joined by a space. The whole build is
    row-wise (split/transform/concat) followed by one explode into a
    (doc_id, bucket) aggregate — a single shuffle whose key grain is at
    most docs x distinct-buckets-per-doc."""
    norm = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    # the explicit empty-token filter (not just an empty-string guard)
    # makes the token array identical to the oracle's list_filter even for
    # pathological leading/trailing non-space whitespace
    toked = _spread(docs, "doc_id").select(
        "doc_id",
        F.filter(F.split(norm, r"\s+"), lambda x: x != "").alias("toks"),
    )
    feats = F.col("toks")
    if bigrams:
        bi = F.expr(
            "CASE WHEN size(toks) >= 2 THEN "
            "transform(sequence(0, size(toks)-2), "
            "i -> concat_ws(' ', toks[i], toks[i+1])) "
            "ELSE cast(array() as array<string>) END"
        )
        feats = F.concat(feats, bi)
    bucket = F.pmod(
        F.conv(F.substring(F.md5("feat"), 1, 8), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )
    return (
        toked.select("doc_id", F.explode(feats).alias("feat"))
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bucket_logratio(
    raw_counts: DataFrame,
    target_counts: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, lr_fixed): 1e-6-fixed-point ``ln p_target - ln p_raw`` per
    hashed bucket, with +alpha Laplace smoothing, for every bucket present
    in the RAW corpus (absent buckets cannot contribute to any raw doc's
    weight). Inputs are ``hashed_feature_counts`` outputs; both model sides
    reduce to n_buckets-bounded aggregates, so the result is broadcastable
    by construction."""
    from pyspark.sql import Window

    raw_b = raw_counts.groupBy("bucket").agg(F.sum("c").alias("cr"))
    tgt_b = target_counts.groupBy("bucket").agg(F.sum("c").alias("ct"))
    # r12: the totals ride along via a whole-frame window over the FULL
    # outer join instead of two crossJoin(broadcast(agg)) branches — the
    # old shape re-computed raw_b AND tgt_b a second time each for their
    # totals (Catalyst does not reuse the duplicated aggregate subtrees),
    # which re-ran the target corpus featurization inside every score
    # pass (measured: 2.13 s -> this shape at sf0.1 even with the raw
    # side checkpointed). The full join keeps both totals exact when
    # either side has buckets the other lacks; the frame is bounded at
    # n_buckets rows, so the single-partition window is free.
    denom = alpha * n_buckets
    lr = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
        / (F.col("t_t") + F.lit(denom))
    ) - F.log((F.col("cr") + F.lit(alpha)) / (F.col("t_r") + F.lit(denom)))
    w = Window.partitionBy()
    return (
        raw_b.join(tgt_b, "bucket", "full")
        .select(
            "bucket",
            "cr",
            "ct",
            F.coalesce(F.sum("cr").over(w), F.lit(0)).alias("t_r"),
            F.coalesce(F.sum("ct").over(w), F.lit(0)).alias("t_t"),
        )
        .filter(F.col("cr").isNotNull())
        .select(
            "bucket",
            F.floor(lr * _LR_SCALE + F.lit(0.5)).cast("bigint").alias(
                "lr_fixed"
            ),
        )
    )


def dsir_logweights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    alpha: float = 1.0,
    bigrams: bool = True,
    materialize: bool = True,
) -> DataFrame:
    """(doc_id, n_feats, logweight) for every raw document: the DSIR
    importance log-weight of the doc toward the target domain. Featureless
    docs (NULL/empty text) score 0 with n_feats 0 — they carry no evidence
    either way.

    The raw featurization feeds both the model fit and the scoring join,
    so by default (``materialize=True``) the compact per-doc count table —
    bounded at docs × min(doc_features, n_buckets) rows of three integers,
    far smaller than the corpus text — is materialized once (eager
    localCheckpoint at construction) and both consumers read it: one
    tokenize+hash pass over the corpus instead of two (measured 3.7 s →
    ~2 s at sf0.1; Catalyst does not exchange-reuse the duplicated
    aggregate subtree on its own). ``materialize=False`` keeps the plan
    fully lazy (two corpus passes) for callers composing into streaming or
    deferred pipelines."""
    raw_counts = hashed_feature_counts(raw_docs, n_buckets, text_col, bigrams)
    if materialize and not raw_docs.isStreaming:
        raw_counts = raw_counts.localCheckpoint(eager=True)
    tgt_counts = hashed_feature_counts(
        target_docs, n_buckets, text_col, bigrams
    )
    lr = bucket_logratio(raw_counts, tgt_counts, n_buckets, alpha)
    scored = (
        raw_counts.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("lr_fixed")).alias("w_fixed"),
        )
    )
    return (
        raw_docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("bigint").alias(
                "n_feats"
            ),
            (F.coalesce(F.col("w_fixed"), F.lit(0)) / _LR_SCALE).alias(
                "logweight"
            ),
        )
    )


def dsir_topk(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    alpha: float = 1.0,
    bigrams: bool = True,
) -> DataFrame:
    """The k raw documents most target-like by DSIR importance weight
    (ties broken by doc_id for a total order). Plans as
    TakeOrderedAndProject — per-partition heaps plus a driver merge of k
    rows, never a global sort."""
    w = dsir_logweights(
        raw_docs, target_docs, n_buckets, text_col, alpha, bigrams
    )
    return w.orderBy(F.col("logweight").desc(), F.col("doc_id").asc()).limit(k)


def dsir_oracle_sql(
    n_buckets: int,
    target_pred: str,
    alpha: float = 1.0,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`dsir_logweights` where the target corpus is
    ``{table} WHERE {target_pred}`` and the raw corpus is its complement.
    Mirrors the tokenization, md5 bucketing, smoothing, and 1e-6 fixed-point
    quantization exactly."""
    denom = alpha * n_buckets
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     x -> x <> '') AS toks
  FROM {table}
),
feats AS (
  SELECT doc_id,
         unnest(list_concat(toks,
           CASE WHEN len(toks) >= 2 THEN
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1])
           ELSE [] END)) AS feat
  FROM base
),
bf AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(feat), 1, 8)) AS BIGINT) % {n_buckets}
           AS bucket
  FROM feats
),
per_doc AS (
  SELECT doc_id, bucket, COUNT(*) AS c FROM bf GROUP BY 1, 2
),
raw_doc AS (SELECT * FROM per_doc WHERE NOT ({target_pred})),
raw_b AS (SELECT bucket, SUM(c) AS cr FROM raw_doc GROUP BY 1),
tgt_b AS (
  SELECT bucket, SUM(c) AS ct FROM per_doc WHERE {target_pred} GROUP BY 1
),
raw_tot AS (SELECT COALESCE(SUM(cr), 0) AS t_r FROM raw_b),
tgt_tot AS (SELECT COALESCE(SUM(ct), 0) AS t_t FROM tgt_b),
lr AS (
  SELECT r.bucket,
         CAST(FLOOR((ln((COALESCE(g.ct, 0) + {alpha})
                        / (tt.t_t + {denom}))
                     - ln((r.cr + {alpha}) / (rt.t_r + {denom})))
                    * {_LR_SCALE} + 0.5) AS BIGINT) AS lr_fixed
  FROM raw_b r
  LEFT JOIN tgt_b g USING (bucket)
  CROSS JOIN raw_tot rt CROSS JOIN tgt_tot tt
),
scored AS (
  SELECT d.doc_id,
         CAST(SUM(d.c) AS BIGINT) AS n_feats,
         SUM(d.c * l.lr_fixed) AS w_fixed
  FROM raw_doc d JOIN lr l USING (bucket)
  GROUP BY d.doc_id
)
SELECT t.doc_id,
       CAST(COALESCE(s.n_feats, 0) AS BIGINT) AS n_feats,
       COALESCE(s.w_fixed, 0) / {_LR_SCALE}.0 AS logweight
FROM {table} t
LEFT JOIN scored s USING (doc_id)
WHERE NOT ({target_pred.replace('doc_id', 't.doc_id')})
"""
