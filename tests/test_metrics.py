"""Quantitative plan budgets: the shuffle/spill/broadcast claims the plan
tests pin by SHAPE are pinned here by MEASURED bytes off the executed
plan's SQLMetrics (market_flow_spark.metrics)."""

from __future__ import annotations

from market_flow_spark.metrics import collect_and_measure, executed_plan_metrics
from market_flow_spark.queries_all import QUERIES


def _measure(spark, sf_dir, name):
    return collect_and_measure(QUERIES[name](spark, sf_dir))


def test_flagship_star_join_is_all_broadcast(spark, sf_dir):
    """All 7 dims ride broadcasts; at most the spread/bigjoin exchanges
    shuffle; zero spill; broadcast payload stays megabytes (the 100 TB
    invariant — dims are bounded, the fact never broadcasts)."""
    n, m = _measure(spark, sf_dir, "flagship_wide")
    assert n > 0
    assert m["broadcast_exchanges"] >= 6
    assert m["exchanges"] <= 2
    assert m["spill_bytes"] == 0
    assert m["broadcast_data_bytes"] < 64 * 1024 * 1024


def test_dedup_exact_is_two_exchanges_no_spill(spark, sf_dir):
    """Exact dedup = the spread repartition plus ONE hash exchange on the
    fingerprint; per-row shuffle cost is bounded (fingerprint + band grain,
    not document text)."""
    n, m = _measure(spark, sf_dir, "dedup_exact")
    assert m["exchanges"] == 2
    assert m["spill_bytes"] == 0
    # both exchanges carry one record per doc: 2 * n total
    assert m["shuffle_records_written"] == 2 * n
    # fingerprint-grain rows, not text: well under 1 KiB per shuffled row
    assert m["shuffle_bytes_written"] < 1024 * m["shuffle_records_written"]


def test_minhash_lsh_reuses_the_band_exchange(spark, sf_dir):
    """The self-join's other side must be a ReusedExchange (the corpus is
    shingled/signed/banded once), measured off the real executed plan."""
    _, m = _measure(spark, sf_dir, "dedup_minhash_lsh")
    assert m["reused_exchanges"] >= 1
    assert m["spill_bytes"] == 0


def test_metrics_zero_before_execution(spark, sf_dir):
    """Reading metrics without an action on the same QueryExecution gives
    zeros — documents the contract collect_and_measure exists for."""
    df = QUERIES["dedup_exact"](spark, sf_dir)
    m = executed_plan_metrics(df)
    assert m["shuffle_bytes_written"] == 0
