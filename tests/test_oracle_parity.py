"""The core correctness gate, run locally: every registered query whose
oracle exists must match DuckDB on row count + schema + values
(order-insensitive) — the same comparison the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from market_flow_spark.queries_all import ORACLES, QUERIES
from tests.oracle_utils import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ORACLES[name])


def test_every_query_returns_rows(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        # anti-join style queries may legitimately return few rows, but the
        # plan must execute; count() forces it.
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 15


def test_contract_alignment():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o.keys()) <= set(q.keys())
    assert len(q) >= 20


def test_relation_cache_memoizes_per_session(spark, sf_dir):
    """load_table returns the SAME resolved relation object for repeat
    calls in one session (skipping per-call parquet footer/DataSource
    resolution — measured as ~half of whole-registry construct cost),
    distinct objects per sf_dir, and a fresh object after an explicit
    cache clear."""
    from market_flow_spark import tables

    a = tables.load_table(spark, sf_dir, "lineitem")
    b = tables.load_table(spark, sf_dir, "lineitem")
    assert a is b
    # any sf dir other than the fixture's (the suite runs under both
    # sf0.001 and SPARK_GRAFT_TEST_SF_DIR=sf0.01)
    other_dir = (
        "/root/testdata/sf0.01"
        if sf_dir.rstrip("/") != "/root/testdata/sf0.01"
        else "/root/testdata/sf0.001"
    )
    other = tables.load_table(spark, other_dir, "lineitem")
    assert other is not a
    tables.clear_table_cache()
    c = tables.load_table(spark, sf_dir, "lineitem")
    assert c is not a
    assert c.count() == a.count()


def test_winnow_capped_parity_at_crossover_scale(spark, sf_dir):
    """Round-8 verdict ask #6: the capped winnow variant's VALUE is the
    inflated-corpus regime (boilerplate fp dfs grow with corpus size, so
    the cap prunes more and diverges further from exact) — parity-check
    that regime itself, not just the base size. The corpus is the
    documents table unioned 3x with id offsets that preserve the %10
    probe/train split; at this size the max training-side fp df is ~900
    (vs the 50 cap), so the capped output provably diverges from exact,
    and the Spark result must still match the DuckDB twin row-for-row."""
    import duckdb

    from market_flow_spark.extensions import dedup
    from market_flow_spark.queries_ext import _winnow_oracle
    from market_flow_spark.tables import load_tables
    from pyspark.sql import functions as F
    from tests.oracle_utils import assert_matches_oracle

    base = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    # Offset must be a multiple of 10 (copies keep their %10 probe/train
    # class) AND exceed max(doc_id): a fixed 1000 collided with sf0.1's
    # 5000 ids, giving duplicate doc_ids whose (doc, fp) multiplicity
    # Spark (per-row distinct) and the DuckDB twin (global DISTINCT)
    # legitimately count differently — a malformed-fixture artifact, not
    # an engine divergence (found by the first sf0.1 run of this test;
    # both engines' registered winnow queries stay parity-green there).
    max_id = int(base.agg(F.max("doc_id")).first()[0])
    offset = ((max_id // 10) + 1) * 10
    inflated = base
    for i in (1, 2):
        inflated = inflated.union(
            base.select(
                (F.col("doc_id") + offset * i).alias("doc_id"), "text"
            )
        )
    capped = dedup.winnow_containment(
        inflated.filter(F.col("doc_id") % 10 != 0),
        inflated.filter(F.col("doc_id") % 10 == 0),
        threshold=0.5,
        max_fp_df=50,
    )
    exact = dedup.winnow_containment(
        inflated.filter(F.col("doc_id") % 10 != 0),
        inflated.filter(F.col("doc_id") % 10 == 0),
        threshold=0.5,
    )
    # the cap must be ACTIVE at this scale: capped and exact disagree
    capped_rows = {
        (r["test_doc_id"], r["train_doc_id"], r["n_shared"], r["containment"])
        for r in capped.collect()
    }
    exact_rows = {
        (r["test_doc_id"], r["train_doc_id"], r["n_shared"], r["containment"])
        for r in exact.collect()
    }
    assert capped_rows != exact_rows
    con = duckdb.connect()
    try:
        src = f"{sf_dir}/documents.parquet"
        union = " UNION ALL ".join(
            f"SELECT doc_id + {offset * i} AS doc_id, text FROM '{src}'"
            for i in range(3)
        )
        con.execute(f"CREATE VIEW documents AS {union}")
        assert_matches_oracle(
            capped, con, _winnow_oracle(threshold=0.5, max_fp_df=50)
        )
    finally:
        con.close()
