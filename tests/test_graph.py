"""PageRank operator properties (the registered query is additionally
full-oracle-checked in test_oracle_parity against the unrolled-CTE twin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_flow_spark.operators.graph import PR_SCALE, pagerank


def _reference_pagerank(edges, n_iter, damping=0.85):
    """Plain-python fixed-point replica (the operator's spec)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    rf = {n: PR_SCALE for n in nodes}
    base = int((1.0 - damping) * PR_SCALE)
    import math

    for _ in range(n_iter):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += rf[u] // outdeg[u]
        rf = {n: base + int(math.floor(damping * s[n])) for n in nodes}
    return rf


def test_pagerank_matches_python_replica(spark):
    edges = [
        (1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (4, 2), (5, 4), (3, 5),
    ]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["node"]: r["rank_fixed"]
        for r in pagerank(df, n_iter=6).collect()
    }
    want = _reference_pagerank(edges, n_iter=6)
    assert got == want


def test_pagerank_sink_outranks_source(spark):
    """A node every other node points to must outrank a node nothing
    points to."""
    edges = [(1, 9), (2, 9), (3, 9), (9, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    ranks = {r["node"]: r["rank"] for r in pagerank(df, n_iter=10).collect()}
    assert ranks[9] > ranks[2]
    assert ranks[9] > ranks[3]


def test_pagerank_uniform_on_symmetric_cycle(spark):
    """On a directed cycle every node has the same rank (symmetry), and
    with no dangling nodes total fixed-point mass stays ~conserved."""
    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = pagerank(df, n_iter=12).collect()
    rfs = {r["rank_fixed"] for r in rows}
    assert len(rfs) == 1  # all equal
    assert abs(next(iter(rfs)) - PR_SCALE) <= n  # mass conserved up to floor dust
