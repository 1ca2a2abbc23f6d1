"""BPE trainer/segmenter pinned against a plain-python replica of the
Sennrich reference semantics (greedy left-to-right merges, word-frequency
weighted pair counts, deterministic tie-breaks)."""

from __future__ import annotations

from collections import Counter

from market_flow_spark.extensions.tokenizer import (
    END_OF_WORD,
    bpe_segment,
    bpe_train,
)


def _py_bpe_train(texts, n_merges, min_pair_freq=2):
    words = Counter()
    for t in texts:
        for w in (t or "").strip().lower().split():
            if w:
                words[w] += 1
    vocab = {w: list(w) + [END_OF_WORD] for w in words}

    def merge_seq(syms, a, b):
        out = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            f = words[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # deterministic argmax: count desc, then lexicographically
        # smallest pair — mirrors the operator's orderBy exactly
        (a, b), n = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        if n < min_pair_freq:
            break
        merges.append((a, b, n))
        vocab = {w: merge_seq(s, a, b) for w, s in vocab.items()}
    return merges


def _py_segment(text, merges):
    toks = []
    for w in (text or "").strip().lower().split():
        if not w:
            continue
        syms = list(w) + [END_OF_WORD]
        for a, b, _ in merges:
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        toks.extend(syms)
    return toks


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest wide",
    "low new wide lowest newest",
    "the lower the newer the wider",
]


def test_bpe_train_matches_python_replica(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )
    got = bpe_train(df, n_merges=12)
    want = _py_bpe_train(TEXTS, n_merges=12)
    assert got == want
    assert len(got) >= 8  # the corpus supports a real merge sequence


def test_bpe_segment_matches_python_replica(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )
    merges = bpe_train(df, n_merges=10)
    seg = {
        r["doc_id"]: r["tokens"]
        for r in bpe_segment(df, merges).select("doc_id", "tokens").collect()
    }
    for i, t in enumerate(TEXTS):
        assert seg[i] == _py_segment(t, merges), (i, t)


def test_bpe_overlapping_run_merges_greedily(spark):
    """'aaa' under merge (a,a) must become ['aa','a'] (left-to-right),
    not ['a','aa'] and not ['aaa']."""
    df = spark.createDataFrame([(0, "aaa aaa aaa")], "doc_id bigint, text string")
    merges = bpe_train(df, n_merges=1)
    assert merges and (merges[0][0], merges[0][1]) == ("a", "a")
    out = bpe_segment(df, merges).select("tokens").collect()[0]["tokens"]
    assert out == ["aa", "a", END_OF_WORD] * 3
