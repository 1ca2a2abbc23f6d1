"""Similarity search over embedding columns (north-star extensions).

Two tiers:

- **Brute-force cosine top-k** — broadcast the (small) query set, score
  every corpus vector with JVM-side array expressions (zip_with +
  aggregate: a sequential in-order fold, so results are bit-deterministic),
  rank per query. At 100 TB the corpus side stays partitioned; cost is one
  scan per query batch. The correctness baseline.
- **LSH-bucketed ANN** — sign-bucket blocking (here: signs of the leading
  dimensions; at scale: random hyperplanes), candidates only within the
  query's bucket → turns the scan into an equi-join. The scale path; recall
  is traded for the bucket count.

No Python UDFs: dot products run inside codegen via higher-order functions.
A Pandas-UDF variant would batch via Arrow, but for 64-dim vectors the
built-in fold is already JVM-side and avoids the Python roundtrip entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from market_flow_spark.functions.aggregates import det_round


def _dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i in double, sequential in-order fold (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm_sq(a: Column) -> Column:
    return _dot(a, a)


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (vec_id <
    n_queries), self excluded. Ties broken by neighbor_id so the k-boundary
    is deterministic."""
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.sqrt(_norm_sq(F.col("embedding"))).alias("qnorm"),
    )
    # corpus norms are computed once per vector BEFORE the fan-out to
    # queries — same arithmetic as per-pair (so the oracle agrees), 1/Nth
    # the work
    corpus = embeddings.withColumn(
        "norm", F.sqrt(_norm_sq(F.col("embedding")))
    )
    pairs = corpus.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("embedding"), F.col("qe")) / (F.col("norm") * F.col("qnorm"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        det_round(cos, 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sign_bucket(emb: Column, n_bits: int = 8) -> Column:
    """LSH blocking key: bit i set iff embedding[i] > 0. Deterministic and
    cheap; at scale replace raw leading dims with random-hyperplane
    projections (same plan shape: a per-row expression)."""
    out = None
    for i in range(n_bits):
        bit = F.when(emb.getItem(i) > 0, F.lit(2**i)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    train_rows: int = 2048,
    max_iter: int = 8,
) -> DataFrame:
    """IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    corpus into cells; each query scores only the `nprobe` nearest cells.

    Plan shape at 100 TB: the quantizer is trained once on a bounded sample
    (you never k-means the full corpus — `train_rows` caps the training
    set, taken deterministically as the lowest vec_ids so repeated runs
    agree) and its centroids are a tiny broadcast table; cell assignment is
    a map stage over the FULL corpus; search is an equi-join on cell id —
    identical skeleton to the LSH variant, but with data-adaptive cells
    (better recall per probe on clustered corpora). Training uses Spark ML
    KMeans with a fixed seed; a coarse quantizer doesn't need full Lloyd
    convergence, and each extra iteration is a whole Spark job, so
    `max_iter` stays low.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    data = embeddings.withColumn(
        "features",
        array_to_vector(F.col("embedding").cast("array<double>")),
    ).withColumn("norm", F.sqrt(_norm_sq(F.col("embedding"))))
    train = data.orderBy("vec_id").limit(train_rows).select("features").cache()
    model = KMeans(
        k=n_cells,
        seed=seed,
        maxIter=max_iter,
        featuresCol="features",
        predictionCol="cell",
    ).fit(train)
    train.unpersist()
    assigned = model.transform(data).select("vec_id", "embedding", "norm", "cell")

    # centroid table: n_cells rows — broadcast everywhere
    spark = embeddings.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    # pick nprobe nearest cells per query (distance to centroid, tiny table)
    qc = queries.crossJoin(F.broadcast(centroids))
    d2 = F.aggregate(
        F.zip_with(
            F.col("qe").cast("array<double>"),
            F.col("centroid"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(d2.asc(), F.col("cell"))
    probes = (
        qc.withColumn("cell_rank", F.row_number().over(wq))
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", "qe", "qnorm", "cell")
    )
    cand = assigned.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("embedding"), F.col("qe")) / (F.col("norm") * F.col("qnorm"))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        det_round(cos, 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ann_lsh_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 3, n_bits: int = 8
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sign-bucket —
    an equi-join on the bucket key instead of a full scan per query."""
    with_bucket = embeddings.withColumn(
        "bucket", sign_bucket(F.col("embedding"), n_bits)
    ).withColumn("norm", F.sqrt(_norm_sq(F.col("embedding"))))
    q = with_bucket.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qnorm"),
        "bucket",
    )
    cand = with_bucket.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("embedding"), F.col("qe")) / (F.col("norm") * F.col("qnorm"))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "bucket",
        det_round(cos, 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
