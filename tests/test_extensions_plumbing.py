"""Non-oracle surfaces: mapInPandas featurizer (multimodal), forecast
pluggability, dedup internals, API-source connectors."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from market_flow_spark.extensions.multimodal import (
    FEATURE_DIM,
    decode_media,
    featurize_assets,
    to_binary_assets,
)
from market_flow_spark.sources.api_source import (
    fetch_keys_distributed,
    fetch_keys_driver_side,
)


def test_featurize_assets_mapinpandas(spark, tables):
    docs = tables["documents"].limit(20)
    feats = featurize_assets(to_binary_assets(docs)).collect()
    assert len(feats) == 20
    by_id = {r.doc_id: r for r in feats}
    src = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, row in by_id.items():
        blob = src[doc_id].encode("utf-8")
        assert row.byte_len == len(blob)
        assert row.content_md5 == hashlib.md5(blob).hexdigest()
        assert len(row.feature) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in row.feature)


def test_featurize_deterministic(spark, tables):
    docs = tables["documents"].limit(5)
    a = sorted(featurize_assets(to_binary_assets(docs)).collect())
    b = sorted(featurize_assets(to_binary_assets(docs)).collect())
    assert a == b


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")


def test_api_source_driver_side(spark):
    keys = [{"city": f"c{i}"} for i in range(4)]

    def fake_geocode(key):
        return {"lat": float(len(key["city"])), "lon": 1.0}

    df = fetch_keys_driver_side(
        spark, keys, fake_geocode, "city string, lat double, lon double",
        calls_per_min=100000,
    )
    assert df.count() == 4
    assert set(df.columns) == {"city", "lat", "lon"}


def test_api_source_distributed(spark):
    keys_df = spark.range(8).select(F.concat(F.lit("k"), "id").alias("k"))

    def fake_fetch(key):
        return {"v": float(len(key["k"]))}

    out = fetch_keys_distributed(
        keys_df, fake_fetch, "k string, v double", calls_per_min_per_task=100000
    )
    assert out.count() == 8


def test_minhash_narrow_verification_equivalent(spark, tables):
    """The 100 TB narrowed-verification path must return exactly the same
    pairs as the direct path."""
    from market_flow_spark.extensions.dedup import minhash_lsh_pairs

    docs = tables["documents"]
    direct = sorted(
        (r.doc1, r.doc2, r.jaccard)
        for r in minhash_lsh_pairs(docs, narrow_verification=False).collect()
    )
    narrowed = sorted(
        (r.doc1, r.doc2, r.jaccard)
        for r in minhash_lsh_pairs(docs, narrow_verification=True).collect()
    )
    assert direct == narrowed
