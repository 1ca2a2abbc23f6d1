"""Behavior tests for the round-4 extension operators: BM25 retrieval,
sequence packing, temperature mixture sampling, unigram log-prob scoring.
(Oracle parity for each is covered by test_oracle_parity via the registry;
these tests pin semantic invariants the SQL-diff can't express.)"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from market_flow_spark.extensions import packing, retrieval, sampling, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_ranks_matching_doc_first(spark):
    docs = _docs(
        spark,
        [
            (1, "spark join hash table"),
            (2, "unrelated words entirely different"),
            (3, "hash hash hash join"),
            (4, "join"),
        ],
    )
    qs = retrieval.query_terms_df(spark, [(0, "hash join")])
    out = retrieval.bm25_topk(docs, qs, k=4).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    # doc 2 shares no term — it must not appear at all
    assert 2 not in ranked
    # every returned score positive, ranks contiguous from 1
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(
        range(1, len(out) + 1)
    )
    assert all(r.score > 0 for r in out)
    # doc 3 (tf-heavy in both terms' postings, short) outranks doc 1
    assert ranked[0] in (1, 3)


def test_bm25_idf_downweights_common_terms(spark):
    # 'the' occurs in every doc, 'rare' in one: a doc matching 'rare'
    # must outscore docs matching only 'the'
    docs = _docs(
        spark,
        [
            (1, "the rare word"),
            (2, "the common word"),
            (3, "the other word"),
        ],
    )
    qs = retrieval.query_terms_df(spark, [(0, "the rare")])
    out = {r.doc_id: r.score for r in retrieval.bm25_topk(docs, qs, k=3).collect()}
    assert out[1] > out[2]
    assert out[1] > out[3]


def test_bm25_handles_null_and_empty_docs(spark):
    docs = _docs(spark, [(1, "hash join"), (2, None), (3, "   ")])
    qs = retrieval.query_terms_df(spark, [(0, "hash")])
    out = retrieval.bm25_topk(docs, qs, k=5).collect()
    assert [r.doc_id for r in out] == [1]


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_stream_is_contiguous_per_shard(spark):
    rows = [(i, "x" * (7 * i % 300 + 1)) for i in range(1, 200)]
    out = packing.pack_sequences(
        _docs(spark, rows), context_len=64, n_shards=4
    ).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(4))
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in docs:
            # start position implied by the running sum
            assert r.start_pack == cum // 64, r
            assert r.start_offset == cum % 64, r
            end = cum + max(r.n_tokens, 1) - 1
            assert r.end_pack == end // 64, r
            cum += r.n_tokens


def test_pack_sequences_zero_token_docs_occupy_nothing(spark):
    out = {
        r.doc_id: r
        for r in packing.pack_sequences(
            _docs(spark, [(1, None), (2, ""), (3, "abcd" * 32)]), context_len=16
        ).collect()
    }
    assert out[1].n_tokens == 0 and out[1].start_pack == out[1].end_pack
    assert out[2].n_tokens == 0
    assert out[3].n_tokens == 32
    # 32 tokens over ctx=16 spans exactly 2 windows when starting at 0
    if out[3].start_offset == 0:
        assert out[3].end_pack == out[3].start_pack + 1


def test_pack_utilization_counts_windows(spark):
    packed = packing.pack_sequences(
        _docs(spark, [(i, "abcd" * 10) for i in range(1, 41)]),
        context_len=64,
        n_shards=2,
    )
    util = packing.pack_utilization(packed, context_len=64).collect()
    for r in util:
        assert r.n_packs == math.ceil(r.total_tokens / 64)
    assert sum(r.n_docs for r in util) == 40


# ---------------------------------------------------------------------------
# Temperature mixture sampling
# ---------------------------------------------------------------------------


def _domain_docs(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for d, n in sorted(sizes.items()):
        for _ in range(n):
            rows.append((i, d))
            i += 1
    return spark.createDataFrame(rows, "doc_id BIGINT, source STRING")


def test_mixture_alpha_flattens_domains(spark):
    df = _domain_docs(spark, {"big": 2000, "small": 100})
    out = sampling.temperature_mixture_sample(
        df, "source", "doc_id", alpha=0.3, target_frac=0.5
    )
    rates = {
        r.source: r.mix_rate
        for r in out.select("source", "mix_rate").distinct().collect()
    }
    # tempering upweights the small domain's rate
    assert rates["small"] > rates["big"]
    # small domain saturates toward keep-everything
    assert rates["small"] == 1.0 or rates["small"] > 0.9


def test_mixture_alpha_one_is_uniform_rate(spark):
    df = _domain_docs(spark, {"a": 500, "b": 1500})
    out = sampling.temperature_mixture_sample(
        df, "source", "doc_id", alpha=1.0, target_frac=0.4
    )
    rates = {
        r.source: r.mix_rate
        for r in out.select("source", "mix_rate").distinct().collect()
    }
    # alpha=1 keeps natural proportions: every domain gets the same rate
    assert rates["a"] == pytest.approx(rates["b"])
    assert rates["a"] == pytest.approx(0.4, abs=1e-6)


def test_mixture_membership_is_content_addressed(spark):
    df = _domain_docs(spark, {"a": 300, "b": 900})
    kept1 = {
        r.doc_id
        for r in sampling.temperature_mixture_sample(df, "source", "doc_id").collect()
    }
    # re-run on a repartitioned frame: identical membership
    kept2 = {
        r.doc_id
        for r in sampling.temperature_mixture_sample(
            df.repartition(7), "source", "doc_id"
        ).collect()
    }
    assert kept1 == kept2


# ---------------------------------------------------------------------------
# Unigram log-prob
# ---------------------------------------------------------------------------


def test_unigram_logprob_prefers_common_tokens(spark):
    docs = _docs(
        spark,
        [
            (1, "common common common"),
            (2, "common rare1 rare2"),
            (3, None),
        ],
    )
    out = {r.doc_id: r for r in text.unigram_logprob(docs).collect()}
    # doc of only the modal token scores higher than the one with hapaxes
    assert out[1].avg_logprob > out[2].avg_logprob
    assert out[3].n_tokens == 0 and out[3].avg_logprob is None
    # hand-check doc 1: p(common) = 4/6
    assert out[1].avg_logprob == pytest.approx(
        math.floor(math.log(4 / 6) * 10000 + 0.5) / 10000, abs=1e-9
    )


# ---------------------------------------------------------------------------
# Document chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_covers_text_with_overlap(spark):
    txt = "abcdefghijklmnopqrstuvwxyz" * 10  # 260 chars
    out = packing.chunk_documents(
        _docs(spark, [(1, txt)]), chunk_chars=100, overlap=20
    ).collect()
    out.sort(key=lambda r: r.chunk_idx)
    # step 80: starts 0,80,160,240 -> 4 chunks
    assert [r.start_char for r in out] == [0, 80, 160, 240]
    # consecutive chunks overlap by exactly 20 chars
    for a, b in zip(out, out[1:]):
        assert a.chunk_text[-20:] == b.chunk_text[:20]
    # reassembling the de-overlapped chunks restores the text
    rebuilt = out[0].chunk_text + "".join(r.chunk_text[20:] for r in out[1:])
    assert rebuilt == txt
    # last chunk is the tail remainder
    assert out[-1].chunk_text == txt[240:]


def test_chunk_documents_edge_cases(spark):
    out = packing.chunk_documents(
        _docs(spark, [(1, None), (2, ""), (3, "short")]),
        chunk_chars=100,
        overlap=20,
    ).collect()
    # null/empty emit nothing; short doc emits exactly one whole-text chunk
    assert [(r.doc_id, r.chunk_idx, r.chunk_text) for r in out] == [
        (3, 0, "short")
    ]
    with pytest.raises(ValueError):
        packing.chunk_documents(_docs(spark, [(1, "x")]), 10, 10)


def test_pack_sequences_with_exact_token_column(spark):
    df = spark.createDataFrame(
        [(1, "ignored", 100), (2, "ignored", 60), (3, "ignored", None)],
        "doc_id BIGINT, text STRING, n_tok INT",
    )
    out = {
        r.doc_id: r
        for r in packing.pack_sequences(
            df, context_len=64, n_shards=1, tokens_col="n_tok"
        ).collect()
    }
    # single shard, doc order 1,2,3: cum 0,100,160
    assert out[1].n_tokens == 100 and out[1].start_pack == 0 and out[1].end_pack == 1
    assert out[2].start_offset == 100 % 64 and out[2].start_pack == 1
    assert out[3].n_tokens == 0  # NULL count packs as empty
