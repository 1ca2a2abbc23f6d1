"""Full-text retrieval scoring over a document corpus (north-star
extension; the reference has no text search — its only text handling is
equality/contains filtering, server/data_loader.py:13-16).

BM25 (Robertson/Spärck Jones, the Okapi weighting) is THE standard
lexical-retrieval baseline a training-data pipeline runs for corpus
exploration, eval-set mining, and RAG-candidate generation. The plan here
is the classic distributed inverted-index shape:

- one corpus scan → exploded (doc_id, term) postings with multiplicity;
- term frequencies per (doc, term) and document lengths by map-side
  combinable aggregates;
- document frequencies ONLY for the query's terms (the postings are
  semi-joined against the — tiny, broadcast — query-term set before the
  df aggregate, so the per-query cost scales with the matched postings,
  not the corpus vocabulary);
- a corpus-stats singleton (N, avgdl) broadcast into the scorer;
- per (query, doc) score = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)),
  with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) — non-negative for all df;
- top-k per query via a rank window over (score desc, doc_id) — the
  tiebreak makes the cut line total-ordered and the result deterministic.

Everything is built-in Column expressions (JVM, codegen); scores are
deterministically rounded before ranking so Spark and the DuckDB oracle
rank identical values. At 100 TB: one corpus scan, two map-side-combined
aggregates, broadcast joins for query terms and corpus stats — no shuffle
larger than the postings of the queried terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_flow_spark.functions.aggregates import det_round
from market_flow_spark.sources.layout import spread_to_cores

# Default query set for the registered query/oracle pair: terms drawn from
# the synthetic corpus vocabulary so scores are non-trivial.
DEFAULT_QUERIES: list[tuple[int, str]] = [
    (0, "hash join table"),
    (1, "sort merge spark"),
    (2, "window agg scan"),
]

K1 = 1.2
B = 0.75


def corpus_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, dl, term) postings WITH multiplicity: lowercase, trim,
    whitespace-split. NULL/empty text contributes no postings (split of
    NULL explodes to nothing; the '' artifact of empty text is filtered),
    mirroring the oracle's `term <> ''` guard.

    The document length ``dl`` is computed ROW-WISE (array size before the
    explode) and rides every posting — this is what lets the scorer avoid
    a separate corpus pass + join just to recover document lengths.

    ``dl`` is computed in its OWN projection below the explode: with
    ``size(clean)`` in the same select as ``explode(clean)``, the analyzer
    places every non-generator expression in a Project ABOVE the Generate,
    so the full split+filter of the document re-ran once per TOKEN
    (O(doc_len x n_tokens) per doc — r12 executed-plan find). Splitting the
    select makes dl a child column the Generate merely retains: the
    tokenize runs twice per DOC (dl + generator), never per token."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    clean = F.filter(toks, lambda t: t != F.lit(""))
    base = spread_to_cores(docs, "doc_id").select(
        "doc_id", F.size(clean).alias("dl"), F.col(text_col)
    )
    return base.select("doc_id", "dl", F.explode(clean).alias("term"))


def query_terms_df(
    spark: SparkSession, queries: list[tuple[int, str]]
) -> DataFrame:
    """(query_id, term) distinct pairs from literal (id, text) queries —
    driver-sized by definition (a query set is human-scale), broadcast into
    every join that touches corpus-sized data."""
    rows = []
    for qid, qtext in queries:
        for term in sorted({t for t in qtext.lower().split() if t}):
            rows.append((qid, term))
    return spark.createDataFrame(rows, "query_id INT, term STRING")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = K1,
    b: float = B,
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents per query by BM25. `queries` is a (query_id, term)
    DataFrame (distinct pairs). Returns (query_id, doc_id, score, rank).

    Scores are rounded (det_round, 4 digits) BEFORE the rank window so the
    ordering is reproducible across engines; rank ties broken by doc_id.
    """
    # Corpus pass 1 (explode): postings carrying their doc length, cut to
    # query terms BEFORE the tf aggregate — per-query cost tracks matched
    # postings, not corpus vocabulary. Corpus pass 2 (map-only, no
    # explode): the (N, avgdl) singleton from row-wise token counts. Two
    # scans total; the r0 shape (df/dl/stats each re-deriving the postings
    # subtree) scanned the corpus four times.
    words = corpus_postings(docs, text_col)
    term_set = queries.select("term").distinct()
    tfq = (
        words.join(F.broadcast(term_set), "term")
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # document frequency as a count-window over the tf rows (one exchange
    # on term) instead of a separate aggregate joined back — tf rows are
    # per (doc, term), so the partition count IS the df
    tfq = tfq.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ntok = F.size(F.filter(toks, lambda t: t != F.lit("")))
    stats = (
        docs.select(ntok.alias("__dl"))
        .filter(F.col("__dl") > 0)
        .agg(F.count(F.lit(1)).alias("n_docs"), F.avg("__dl").alias("avgdl"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    weight = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        F.broadcast(queries)
        .join(tfq, "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(det_round(F.sum(weight), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_oracle_sql(
    queries: list[tuple[int, str]] | None = None,
    k: int = 5,
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB twin of :func:`bm25_topk` over the `documents` view, with the
    same literal query set and deterministic rounding."""
    queries = queries if queries is not None else DEFAULT_QUERIES
    qvals = []
    for qid, qtext in queries:
        for term in sorted({t for t in qtext.lower().split() if t}):
            qvals.append(f"({qid}, '{term}')")
    values = ", ".join(qvals)
    return f"""
WITH words AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents
), postings AS (
  SELECT doc_id, term FROM words WHERE term <> ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM postings GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
), q(query_id, term) AS (
  VALUES {values}
), dfq AS (
  SELECT tf.term, COUNT(*) AS df
  FROM tf JOIN (SELECT DISTINCT term FROM q) qt ON tf.term = qt.term
  GROUP BY tf.term
), scored AS (
  SELECT q.query_id, tf.doc_id,
         FLOOR(SUM(
           ln(1 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
           * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl))
         ) * 10000 + 0.5) / 10000 AS score
  FROM q
  JOIN tf  ON q.term = tf.term
  JOIN dfq ON q.term = dfq.term
  JOIN dl  ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, doc_id, score, CAST(rn AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id
  ) AS rn
  FROM scored
)
WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# Hashed TF-IDF sparse-cosine document similarity
# ---------------------------------------------------------------------------

TFIDF_DIM = 256
_W_SCALE = 1_000  # 1e-3 fixed-point quantization of the tf-idf weight


def hashed_tfidf_weights(
    docs: DataFrame, dim: int = TFIDF_DIM, text_col: str = "text"
) -> DataFrame:
    """(doc_id, bucket, w_fixed): hashed TF-IDF document vectors in sparse
    form — term counts folded into ``dim`` md5 buckets (the hashing trick:
    fixed feature space, no vocabulary state), weighted by bucket-grain
    idf ``ln(N / df_bucket)`` and quantized to 1e-3 fixed point so every
    downstream dot product is exact integer arithmetic (associativity-safe
    AND engine-reproducible — the same determinism recipe as the DSIR
    log-ratios).

    Two map-side-combined aggregates over one tokenize pass (per-doc
    bucket counts; bucket dfs, bounded by ``dim``) plus a broadcast of
    the df table back onto the counts. No UDFs, no driver state."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    clean = F.filter(toks, lambda t: t != F.lit(""))
    bucket = F.pmod(
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("bigint"),
        F.lit(dim),
    )
    counts = (
        spread_to_cores(docs, "doc_id")
        .select("doc_id", F.explode(clean).alias("term"))
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("bw"))
    )
    # r12: counts feeds three branches here (weight join, n_docs, bucket
    # dfs) and tfidf_doc_topk re-traverses the whole weights subtree
    # three more times (norms, query set, dot-product side) — the pruned
    # duplicates never canonicalize identically, so the corpus
    # tokenize+md5 pass re-ran up to 9× per action (executed plan: 24
    # scans). Materialize the docs×dim-bounded count table once (the
    # DSIR raw-counts pattern); every branch then reads the compact
    # checkpoint.
    if not docs.isStreaming:
        counts = counts.localCheckpoint(eager=True)
    # corpus size as a broadcast one-row singleton (the bm25 N/avgdl
    # pattern) — keeps the whole build lazy, no construction-time action
    nd = counts.agg(F.countDistinct("doc_id").alias("n_docs"))
    dfs = counts.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("df_b")
    )
    w = F.col("bw") * F.log(F.col("n_docs").cast("double") / F.col("df_b"))
    return (
        counts.join(F.broadcast(dfs), "bucket")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "bucket",
            F.floor(w * _W_SCALE + F.lit(0.5)).cast("bigint").alias("w_fixed"),
        )
    )


def tfidf_doc_topk(
    docs: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    dim: int = TFIDF_DIM,
    text_col: str = "text",
) -> DataFrame:
    """Top-k most similar corpus documents per query document (doc_id <
    n_queries), by hashed-TF-IDF sparse cosine — lexical doc-to-doc
    similarity search, the inverted-index complement to the dense
    embedding tiers (``similarity.cosine_topk``) and to query-scoring
    BM25.

    The dot product is a bucket equi-join of the (tiny) query weight set
    against the corpus weights with map-side-combined pair sums — cost
    scales with the matched postings, never N². All sums are exact
    BIGINTs; one sqrt + division per (query, doc) pair at the end, then
    det-rounding before the rank window so the k-cut is total-ordered."""
    weights = hashed_tfidf_weights(docs, dim, text_col)
    norms = weights.groupBy("doc_id").agg(
        F.sum(F.col("w_fixed") * F.col("w_fixed")).alias("norm_sq")
    )
    qw = weights.filter(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"),
        "bucket",
        F.col("w_fixed").alias("qw"),
    )
    dots = (
        weights.join(F.broadcast(qw), "bucket")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("w_fixed") * F.col("qw")).alias("dot"))
    )
    qn = norms.select(
        F.col("doc_id").alias("query_id"), F.col("norm_sq").alias("q_norm_sq")
    )
    cos = F.col("dot") / F.sqrt(
        F.col("norm_sq").cast("double") * F.col("q_norm_sq").cast("double")
    )
    scored = (
        dots.join(norms, "doc_id")
        .join(F.broadcast(qn), "query_id")
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            det_round(cos, 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def tfidf_topk_oracle_sql(
    n_queries: int = 5, k: int = 5, dim: int = TFIDF_DIM
) -> str:
    """DuckDB twin of :func:`tfidf_doc_topk` over the `documents` view."""
    return f"""
WITH postings AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(term), 1, 8)) AS UBIGINT) % {dim} AS bucket
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
    FROM documents
  ) WHERE term <> ''
),
counts AS (
  SELECT doc_id, bucket, COUNT(*) AS bw FROM postings GROUP BY 1, 2
),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM counts),
dfs AS (SELECT bucket, COUNT(*) AS df_b FROM counts GROUP BY 1),
weights AS (
  SELECT c.doc_id, c.bucket,
         CAST(FLOOR(c.bw * ln(CAST(nd.n_docs AS DOUBLE) / d.df_b)
                    * {_W_SCALE} + 0.5) AS BIGINT) AS w_fixed
  FROM counts c JOIN dfs d USING (bucket) CROSS JOIN nd
),
norms AS (
  SELECT doc_id, SUM(w_fixed * w_fixed) AS norm_sq FROM weights GROUP BY 1
),
qw AS (
  SELECT doc_id AS query_id, bucket, w_fixed AS qw
  FROM weights WHERE doc_id < {n_queries}
),
dots AS (
  SELECT w.doc_id, q.query_id, SUM(w.w_fixed * q.qw) AS dot
  FROM weights w JOIN qw q USING (bucket)
  WHERE w.doc_id <> q.query_id
  GROUP BY 1, 2
),
scored AS (
  SELECT d.query_id, d.doc_id AS neighbor_id,
         FLOOR(d.dot / sqrt(CAST(n1.norm_sq AS DOUBLE)
                            * CAST(n2.norm_sq AS DOUBLE))
               * 1000000 + 0.5) / 1000000 AS cosine
  FROM dots d
  JOIN norms n1 ON n1.doc_id = d.doc_id
  JOIN norms n2 ON n2.doc_id = d.query_id
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {k}
"""
