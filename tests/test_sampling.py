"""Deterministic sampling / splitting / quota semantics (content-addressed
operators in extensions/sampling.py). The cross-engine value parity is
covered by the oracle harness; these pin the *properties* the operators
promise: run/layout independence, append stability, quota bounds, and
rate accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_flow_spark.extensions import sampling


def test_sample_rate_accuracy_and_determinism(tables):
    docs = tables["documents"]
    total = docs.count()
    kept = sampling.sample_by_rate(docs, "doc_id", 0.5, salt="t")
    n1 = kept.count()
    # binomial(total, 0.5): allow a generous ±4σ band
    import math

    sigma = math.sqrt(total * 0.25)
    assert abs(n1 - total * 0.5) <= 4 * sigma + 1
    # identical under a different partition layout
    n2 = sampling.sample_by_rate(docs.repartition(13), "doc_id", 0.5, salt="t").count()
    assert n1 == n2
    ids1 = {r.doc_id for r in kept.select("doc_id").collect()}
    ids2 = {
        r.doc_id
        for r in sampling.sample_by_rate(docs, "doc_id", 0.5, salt="t")
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2


def test_sample_rate_edges(tables):
    docs = tables["documents"]
    assert sampling.sample_by_rate(docs, "doc_id", 0.0).count() == 0
    assert sampling.sample_by_rate(docs, "doc_id", 1.0).count() == docs.count()


def test_sample_monotone_in_rate(tables):
    """A row admitted at rate r stays admitted at any higher rate — the
    property that makes re-sampling a corpus at a new budget incremental."""
    docs = tables["documents"]
    small = {
        r.doc_id
        for r in sampling.sample_by_rate(docs, "doc_id", 0.2).select("doc_id").collect()
    }
    big = {
        r.doc_id
        for r in sampling.sample_by_rate(docs, "doc_id", 0.6).select("doc_id").collect()
    }
    assert small <= big


def test_split_append_stability(tables):
    """New rows never flip old rows' split: the split of the first half of
    the corpus is identical whether or not the second half is present."""
    docs = tables["documents"]
    cut = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    first_half = docs.filter(F.col("doc_id") <= cut)
    full = sampling.assign_split(docs, "doc_id").filter(F.col("doc_id") <= cut)
    part = sampling.assign_split(first_half, "doc_id")
    a = {(r.doc_id, r.split) for r in full.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in part.select("doc_id", "split").collect()}
    assert a == b
    splits = {r.split for r in part.collect()}
    assert splits <= {"train", "test"}


def test_quota_cap_skew_safe_identical_to_naive(spark):
    """50%-skew synthetic (one group holds half the rows): the two-level
    skew-safe reduction must return row-for-row the same picks (including
    ranks) as the naive single-window path."""
    rows = [("hot", i) for i in range(5000)] + [
        (f"g{i % 50}", 10000 + i) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "grp string, id bigint")
    naive = sampling.cap_per_group(
        df, "grp", 13, "id", skew_safe=False
    ).collect()
    safe = sampling.cap_per_group(
        df, "grp", 13, "id", skew_safe=True, subsplits=8
    ).collect()
    key = lambda r: (r.grp, r.id, r.pick_rank)  # noqa: E731
    assert sorted(map(key, naive)) == sorted(map(key, safe))
    assert len(safe) > 0


def test_quota_cap_bounds_and_exhaustiveness(tables):
    docs = tables["documents"]
    capped = sampling.cap_per_group(docs, "source", 7, "doc_id")
    sizes = {
        r.source: r.n
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    orig = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in sizes.items():
        assert n == min(7, orig[src]), (src, n, orig[src])
    # groups smaller than the quota survive intact
    assert set(sizes) == set(orig)
    # selection is layout-independent
    again = {
        r.doc_id
        for r in sampling.cap_per_group(docs.repartition(17), "source", 7, "doc_id")
        .select("doc_id")
        .collect()
    }
    assert again == {r.doc_id for r in capped.select("doc_id").collect()}
