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


def test_kfold_partitions_and_is_stable(spark, tables):
    from market_flow_spark.extensions.sampling import assign_kfold

    orders = tables["orders"]
    folded = assign_kfold(orders, "o_orderkey", k=5)
    counts = {r["fold"]: r["n"] for r in folded.groupBy("fold").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {0, 1, 2, 3, 4}
    total = orders.count()
    assert sum(counts.values()) == total
    # roughly balanced (within 3x of each other on the small SF)
    assert max(counts.values()) < 3 * min(counts.values())
    # append-stability: folding a subset gives the same fold per key
    sub = assign_kfold(orders.limit(50), "o_orderkey", k=5)
    joined = sub.select("o_orderkey", "fold").join(
        folded.select("o_orderkey", F.col("fold").alias("fold_full")),
        "o_orderkey",
    )
    assert joined.filter(F.col("fold") != F.col("fold_full")).count() == 0


def test_weighted_sample_prefers_heavy_rows(spark):
    """With weights 1000 vs 1, the heavy rows should dominate the sample."""
    from market_flow_spark.extensions.sampling import weighted_sample_per_group

    rows = [("g", i, 1000.0 if i < 50 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, id bigint, w double")
    out = weighted_sample_per_group(df, "grp", "id", "w", n=30)
    got = [r["id"] for r in out.collect()]
    assert len(got) == 30
    heavy = sum(1 for i in got if i < 50)
    assert heavy >= 25  # heavy rows are 50/500 of the pool but ~all of the mass


def test_mmr_selects_relevant_but_diverse(spark):
    """Three near-identical top-relevance vectors: plain top-3 takes all
    three; MMR takes one of them plus the two diverse directions."""
    from market_flow_spark.extensions.similarity import mmr_select

    rows = [
        (0, [0.9, 0.3, 0.0]),    # relevant
        (1, [0.9, 0.301, 0.0]),  # near-duplicate of 0 (mutual cos ~1)
        (2, [0.9, -0.3, 0.0]),   # equally relevant, diverse from 0
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    picked = mmr_select(df, [1.0, 0.0, 0.0], k=2, lambda_=0.5)
    assert picked[0] == 0  # most relevant (ties broken by vec_id)
    # plain top-2 would take the near-dup 1; MMR must take the diverse 2
    assert picked == [0, 2]


def test_fuzzy_lev1_complete_vs_brute_force(spark):
    """Deletion-neighborhood blocking must find EVERY distance<=1 pair a
    brute-force cross join finds (substitution, insertion, deletion, and
    equal-string cases all present)."""
    from itertools import combinations

    from market_flow_spark.extensions.dedup import fuzzy_pairs_lev1

    names = [
        (1, "smith"), (2, "smyth"),   # substitution
        (3, "smiths"),                # insertion vs 1
        (4, "mith"),                  # deletion vs 1
        (5, "smith"),                 # duplicate of 1
        (6, "jones"),                 # unrelated
        (7, "jonas"),                 # substitution vs 6
        (8, "xavier"),                # isolated
    ]

    def lev(a, b):
        import numpy as np

        d = np.zeros((len(a) + 1, len(b) + 1), dtype=int)
        d[:, 0] = range(len(a) + 1)
        d[0, :] = range(len(b) + 1)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i, j] = min(
                    d[i - 1, j] + 1,
                    d[i, j - 1] + 1,
                    d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                )
        return int(d[len(a), len(b)])

    want = sorted(
        (i1, i2)
        for (i1, n1), (i2, n2) in combinations(names, 2)
        if lev(n1, n2) <= 1
    )
    df = spark.createDataFrame(names, "id bigint, name string")
    got = sorted(
        (r["id1"], r["id2"]) for r in fuzzy_pairs_lev1(df, "id", "name").collect()
    )
    assert got == want and len(want) >= 5


def test_bigram_logprob_penalizes_scrambled_text(spark):
    """Same vocabulary, scrambled order: the bigram model must score the
    natural phrasing higher (the property the unigram rung cannot see)."""
    from market_flow_spark.extensions.text import bigram_logprob

    natural = "the quick brown fox jumps over the lazy dog"
    scrambled = "dog the over quick lazy jumps fox brown the"
    docs = [(i, natural) for i in range(20)]
    docs += [(100, natural), (101, scrambled), (102, "single")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert out[100]["avg_logprob"] > out[101]["avg_logprob"]
    assert out[102]["n_bigrams"] == 0 and out[102]["avg_logprob"] is None


def test_trigram_langid_separates_real_languages(spark):
    """On actual language text the Cavnar-Trenkle classifier must be
    near-perfect (the synthetic corpus only weakly encodes its labels —
    there the diagonal still dominates, checked in the oracle run)."""
    from market_flow_spark.extensions.text import char_trigram_langid

    en = [
        "the cat sat on the mat and looked at the door",
        "there is a house in the village near the river",
        "we went to the market to buy bread and cheese",
        "this is the best way to learn something new every day",
    ]
    fr = [
        "le chat est assis sur le tapis et regarde la porte",
        "il y a une maison dans le village pres de la riviere",
        "nous sommes alles au marche pour acheter du pain et du fromage",
        "c'est la meilleure facon d'apprendre quelque chose de nouveau",
    ]
    de = [
        "die katze sitzt auf der matte und schaut auf die tuer",
        "es gibt ein haus im dorf in der naehe des flusses",
        "wir gingen auf den markt um brot und kaese zu kaufen",
        "das ist der beste weg jeden tag etwas neues zu lernen",
    ]
    rows = [(i, "en", t) for i, t in enumerate(en)]
    rows += [(100 + i, "fr", t) for i, t in enumerate(fr)]
    rows += [(200 + i, "de", t) for i, t in enumerate(de)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = char_trigram_langid(df, profile_size=60)
    got = {r["doc_id"]: (r["lang"], r["predicted_lang"]) for r in out.collect()}
    correct = sum(1 for lang, pred in got.values() if lang == pred)
    assert correct >= 11  # >= 11/12 on clearly-separated real text
