"""Persisted MinHash-LSH index (build-once/query-many) and kNN label
voting — round-4 additions mirroring the IVF-centroid persist shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_flow_spark.extensions import dedup, similarity
from market_flow_spark.tables import load_tables


def _split(docs):
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    return corpus, batch


def test_lsh_index_roundtrip_identical_results(spark, sf_dir, tmp_path):
    docs = load_tables(spark, sf_dir)["documents"]
    corpus, batch = _split(docs)

    live = sorted(
        map(
            tuple,
            dedup.minhash_lsh_pairs_against(batch, corpus, threshold=0.8)
            .collect(),
        )
    )
    path = str(tmp_path / "lsh_index")
    dedup.save_lsh_index(corpus, path)
    loaded = sorted(
        map(
            tuple,
            dedup.minhash_lsh_pairs_against_index(
                batch, dedup.load_lsh_index(spark, path), threshold=0.8
            ).collect(),
        )
    )
    assert live == loaded
    assert len(loaded) > 0  # the synthetic corpus has cross-split near-dups


def test_lsh_index_band_table_is_partition_pruned(spark, sf_dir, tmp_path):
    """A band-restricted probe of the stored band table must prune files:
    band_idx is the partition column, so filtering one band reads 1/4 of
    the partitions."""
    docs = load_tables(spark, sf_dir)["documents"]
    path = str(tmp_path / "lsh_index")
    dedup.save_lsh_index(docs, path)
    banded = spark.read.parquet(f"{path}/banded")
    plan = (
        banded.filter(F.col("band_idx") == 0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "band_idx" in plan  # partition filter reached the scan
    one_band = banded.filter(F.col("band_idx") == 0).count()
    assert one_band == docs.count()  # one row per doc per band


def test_knn_label_vote_majority_and_tiebreak(spark):
    # query 0 at origin-ish; neighbors engineered so labels 1 and 2 tie at
    # 2 votes each with k=4 -> tiebreak picks label 1
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [0.9, 0.1], 1),
        (2, [0.8, 0.2], 1),
        (3, [0.7, 0.3], 2),
        (4, [0.6, 0.4], 2),
        (5, [-1.0, 0.0], 3),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    out = similarity.knn_label_vote(emb, n_queries=1, k=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r.query_id == 0
    assert r.predicted_label == 1  # tie at 2-2, smaller label wins
    assert r.votes == 2 and r.n_neighbors == 4


def test_knn_label_vote_clear_majority(spark):
    rows = [(0, [1.0, 0.0], 9)] + [
        (i, [1.0 - 0.01 * i, 0.01 * i], 7) for i in range(1, 4)
    ] + [(4, [0.0, 1.0], 5)]
    emb = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    r = similarity.knn_label_vote(emb, n_queries=1, k=3).collect()[0]
    assert r.predicted_label == 7 and r.votes == 3
