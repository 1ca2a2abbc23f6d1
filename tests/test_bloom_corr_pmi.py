"""Round-4 additions: Bloom-filter join pruning, exact-moment correlation
panel, PMI collocations. (Their registered queries are also full-oracle-
checked in test_oracle_parity; these tests pin the operator-level
properties the oracle can't see — zero false negatives, actual pruning,
degenerate-group handling.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from market_flow_spark.extensions import dedup, sketches, text
from market_flow_spark.operators.analytics import corr_regression_panel


def test_bloom_has_no_false_negatives(spark):
    """Every key that was inserted must survive the prune — the property
    that makes bloomed-join ≡ exact-join."""
    n_bits, n_hashes = 1 << 12, 4
    members = spark.range(0, 500).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    words = sketches.bloom_words(
        sketches.bloom_build(members, "k", n_bits, n_hashes), n_bits
    )
    kept = sketches.bloom_prune(members, "k", words, n_bits, n_hashes)
    assert kept.count() == 500


def test_bloom_prunes_most_non_members(spark):
    """Disjoint probe keys should almost all be filtered map-side (fpp at
    500 keys in 2^15 bits with k=4 is well under 1%)."""
    n_bits, n_hashes = 1 << 15, 4
    members = spark.range(0, 500).select(
        F.concat(F.lit("in_"), F.col("id")).alias("k")
    )
    probes = spark.range(0, 2000).select(
        F.concat(F.lit("out_"), F.col("id")).alias("k")
    )
    words = sketches.bloom_words(
        sketches.bloom_build(members, "k", n_bits, n_hashes), n_bits
    )
    survivors = sketches.bloom_prune(probes, "k", words, n_bits, n_hashes).count()
    assert survivors <= 40  # 2% of 2000 — generous vs the ~0.2% expectation


def test_bloom_prune_skips_null_keys(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], "k string"
    )
    words = sketches.bloom_words(sketches.bloom_build(df, "k", 1 << 10, 2), 1 << 10)
    kept = sketches.bloom_prune(df, "k", words, 1 << 10, 2)
    assert sorted(r["k"] for r in kept.collect()) == ["a", "b"]


def test_bloomed_contamination_equals_exact(spark, tables):
    docs = tables["documents"]
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    probe = docs.filter(F.col("doc_id") % 10 == 0)
    exact = dedup.exact_contamination(corpus, probe, prefix_len=80)
    bloomed = dedup.exact_contamination_bloomed(corpus, probe, prefix_len=80)
    a = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, bloomed.collect()))
    assert a == b


def test_corr_panel_exact_fit(spark):
    """y = 3x + 2 exactly -> corr 1, slope 3, intercept 2; a zero-variance
    group yields NULLs instead of a division error."""
    rows = [("a", float(x), 3.0 * x + 2.0) for x in range(1, 11)]
    rows += [("b", 5.0, float(v)) for v in (1, 2, 3)]  # x constant
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in corr_regression_panel(df, "g", "x", "y").collect()}
    assert out["a"]["corr_xy"] == 1.0
    assert out["a"]["slope"] == 3.0
    assert out["a"]["intercept"] == 2.0
    assert out["b"]["corr_xy"] is None
    assert out["b"]["slope"] is None


def test_pmi_favors_exclusive_pairs(spark):
    """A pair that always co-occurs ('san francisco') outranks a pair of
    independently common words; min_count drops rare pairs."""
    docs = [
        (i, "san francisco is big and big city life is busy") for i in range(5)
    ]
    docs += [(100 + i, "big city and busy life") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = text.pmi_collocations(df, min_count=5, k=10)
    rows = out.collect()
    pairs = [(r["w1"], r["w2"]) for r in rows]
    assert ("san", "francisco") in pairs
    top = rows[0]
    assert (top["w1"], top["w2"]) == ("san", "francisco")
    # every surviving pair respects min_count
    assert all(r["c_pair"] >= 5 for r in rows)
