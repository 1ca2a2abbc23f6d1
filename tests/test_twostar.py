"""Alternating large-star/small-star connected components (Kiveris et
al. 2014): same (doc_id, cluster_id = min reachable) contract as the
min-label propagation default, O(log^2 n) rounds regardless of pair-graph
diameter — the shape for chained duplication graphs."""

from __future__ import annotations

import random

import pytest

from market_flow_spark.extensions.dedup import (
    dedup_clusters,
    dedup_clusters_twostar,
    dedup_keep_list,
)


def _labels(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def test_twostar_long_chain_converges_where_label_prop_cannot(spark):
    """The motivating regime: a 64-hop chain (diameter 63). Min-label
    needs one round PER HOP so a 20-round budget fails loudly; two-star
    contracts the chain geometrically and labels every node 0 within the
    default budget."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc1 long, doc2 long"
    )
    got = _labels(dedup_clusters_twostar(chain))
    assert got == {i: 0 for i in range(64)}
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(chain, max_iter=20)


def test_twostar_matches_label_prop_on_random_graphs(spark):
    """Both algorithms compute the same function: sweep random sparse
    pair graphs (mixed cliques, chains, isolated edges) and compare
    against each other and a python union-find model."""
    for seed in (3, 20260816):
        rng = random.Random(seed)
        n = 60
        edges = set()
        for _ in range(50):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((a, b))
        pairs = spark.createDataFrame(
            sorted(edges), "doc1 long, doc2 long"
        )
        # python union-find ground truth
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        want = {x: find(x) for x in touched}
        got_ts = _labels(dedup_clusters_twostar(pairs))
        got_lp = _labels(dedup_clusters(pairs, max_iter=40))
        assert got_ts == want, f"seed {seed}: two-star diverges from model"
        assert got_lp == want, f"seed {seed}: label-prop diverges from model"


def test_keep_list_algo_switch(spark):
    """dedup_keep_list(algo='two_star') returns the identical keep/drop
    frame as the default on the same pairs, and rejects unknown algos."""
    docs = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc1 long, doc2 long"
    )
    a = sorted(map(tuple, dedup_keep_list(docs, pairs).collect()))
    b = sorted(
        map(tuple, dedup_keep_list(docs, pairs, algo="two_star").collect())
    )
    assert a == b
    assert {t[0] for t in a} == set(range(8))
    with pytest.raises(ValueError, match="algo"):
        dedup_keep_list(docs, pairs, algo="bogus")


def test_twostar_empty_pairs(spark):
    empty = spark.createDataFrame([], "doc1 long, doc2 long")
    assert dedup_clusters_twostar(empty).count() == 0
