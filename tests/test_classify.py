"""Unit pins for the distributed Naive-Bayes classifier
(extensions/classify.py): separable toy corpus, prior-only fallback for
empty/unseen docs, fixed-point determinism, and tiebreak order. The
sf-scale confusion-matrix parity lives in test_oracle_parity
(nb_classify_lang)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from market_flow_spark.extensions import classify


def _fit_predict(spark, train_rows, test_rows):
    train = spark.createDataFrame(train_rows, ["doc_id", "lang", "text"])
    test = spark.createDataFrame(test_rows, ["doc_id", "lang", "text"])
    grid, labels = classify.nb_train(train, "lang")
    pred = classify.nb_predict(test, grid, labels)
    return {r["doc_id"]: r["predicted"] for r in pred.collect()}, (
        grid,
        labels,
    )


def test_separable_corpus(spark):
    train = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog ran to the park"),
        (3, "fr", "le chat et le chien"),
        (4, "fr", "le parc et la rue"),
    ]
    test = [
        (10, "en", "the cat ran"),
        (11, "fr", "le chat et la rue"),
    ]
    got, _ = _fit_predict(spark, train, test)
    assert got == {10: "en", 11: "fr"}


def test_empty_doc_gets_prior_argmax(spark):
    # priors: en 2/3, fr 1/3 -> an empty document must predict 'en'
    train = [
        (1, "en", "alpha beta"),
        (2, "en", "beta gamma"),
        (3, "fr", "delta epsilon"),
    ]
    test = [(10, "en", ""), (11, "en", "zzz unseen everywhere")]
    got, _ = _fit_predict(spark, train, test)
    assert got[10] == "en"
    # all-unseen doc: score = 3*default_fp + prior_fp. The smaller class
    # has the larger unseen likelihood (fr: ln(1/(2+5)) vs en:
    # ln(1/(4+5)) per token), and 3 tokens of that gap (~0.75 nats)
    # outweighs the prior gap (ln(2/3)-ln(1/3) ~ 0.69) -> 'fr'.
    assert got[11] == "fr"


def test_grid_values_match_closed_form(spark):
    train = [(1, "en", "a a b"), (2, "fr", "b b")]
    _, (grid, labels) = _fit_predict(spark, train, [(9, "en", "a")])
    g = {
        (r["label"], r["w"]): r["loglik_fp"] for r in grid.collect()
    }
    # vocab = {a, b}, V=2; en total=3, fr total=2; alpha=1
    def fp(x: float) -> int:
        return math.floor(x * 1_000_000 + 0.5)

    assert g[("en", "a")] == fp(math.log((2 + 1) / (3 + 2)))
    assert g[("en", "b")] == fp(math.log((1 + 1) / (3 + 2)))
    assert g[("fr", "a")] == fp(math.log((0 + 1) / (2 + 2)))
    assert g[("fr", "b")] == fp(math.log((2 + 1) / (2 + 2)))
    lab = {r["label"]: r.asDict() for r in labels.collect()}
    assert lab["en"]["default_fp"] == fp(math.log(1 / (3 + 2)))
    assert lab["en"]["prior_fp"] == fp(math.log(1 / 2))


def test_tiebreak_is_label_ascending(spark):
    # perfectly symmetric classes -> identical integer scores -> the
    # deterministic winner is the lexicographically first label
    train = [(1, "aa", "x"), (2, "bb", "y")]
    test = [(10, "aa", "")]
    got, _ = _fit_predict(spark, train, test)
    assert got[10] == "aa"


def test_confusion_rollup(spark):
    train = [
        (1, "en", "the cat"),
        (2, "fr", "le chat"),
    ]
    test_df = spark.createDataFrame(
        [(10, "en", "the the"), (11, "fr", "le le")],
        ["doc_id", "lang", "text"],
    )
    grid, labels = classify.nb_train(
        spark.createDataFrame(train, ["doc_id", "lang", "text"]), "lang"
    )
    pred = classify.nb_predict(test_df, grid, labels)
    conf = {
        (r["actual"], r["predicted"]): r["n_docs"]
        for r in classify.nb_confusion(test_df, pred, "lang").collect()
    }
    assert conf == {("en", "en"): 1, ("fr", "fr"): 1}


def test_hashed_mode_bounded_grid_and_sane_predictions(spark):
    train_rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog ran to the park"),
        (3, "fr", "le chat et le chien"),
        (4, "fr", "le parc et la rue"),
    ]
    test_rows = [(10, "en", "the cat ran"), (11, "fr", "le chat et la rue")]
    train = spark.createDataFrame(train_rows, ["doc_id", "lang", "text"])
    test = spark.createDataFrame(test_rows, ["doc_id", "lang", "text"])
    grid, labels = classify.nb_train(train, "lang", hash_buckets=64)
    # grid is bucket-bounded: at most 64 features x 2 labels
    assert grid.count() <= 64 * 2
    # feature ids are bucket strings, not tokens
    ws = {r["w"] for r in grid.select("w").distinct().collect()}
    assert all(w.isdigit() for w in ws)
    pred = classify.nb_predict(test, grid, labels, hash_buckets=64)
    got = {r["doc_id"]: r["predicted"] for r in pred.collect()}
    # 64 buckets >> 20-word vocab: collisions are unlikely to flip the
    # separable corpus, and determinism holds regardless
    assert got == {10: "en", 11: "fr"}
    # deterministic across re-runs (murmur3 is seed-stable)
    pred2 = classify.nb_predict(test, grid, labels, hash_buckets=64)
    assert {(r["doc_id"], r["score_fp"]) for r in pred.collect()} == {
        (r["doc_id"], r["score_fp"]) for r in pred2.collect()
    }
