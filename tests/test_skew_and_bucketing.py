"""Salted joins must be result-identical to plain joins; bucketed joins
must eliminate the shuffle (no Exchange in the physical plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_flow_spark.operators.skew import (
    bucketed_join,
    salted_join,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark, tables):
    li = tables["lineitem"].select("l_orderkey", "l_partkey", "l_extendedprice")
    pa = tables["part"].select("p_partkey", "p_name")
    plain = (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("s"))
    )
    salted = (
        salted_join(
            li.withColumnRenamed("l_partkey", "p_partkey"),
            pa,
            on="p_partkey",
            salt_buckets=4,
            salt_source="l_orderkey",
        )
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("s"))
    )
    a = {r.p_name: (r.n, round(r.s, 2)) for r in plain.collect()}
    b = {r.p_name: (r.n, round(r.s, 2)) for r in salted.collect()}
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (99, "zz")], "k int, v string"
    )
    small = spark.createDataFrame([(1, "one"), (2, "two")], "k int, name string")
    out = salted_join(big, small, on="k", how="left", salt_buckets=3).collect()
    assert len(out) == 4
    assert {r.v: r.name for r in out}["zz"] is None


def test_bucketed_join_has_no_shuffle(spark, tables):
    write_bucketed(
        tables["lineitem"].select("l_orderkey", "l_extendedprice"),
        "b_lineitem",
        "l_orderkey",
        num_buckets=8,
    )
    write_bucketed(
        tables["orders"].select("o_orderkey", "o_orderdate").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        ),
        "b_orders",
        "l_orderkey",
        num_buckets=8,
    )
    # force the sort-merge path: at test scale the planner would broadcast
    # the small side (also shuffle-free, but that hides what we're testing —
    # at 100 TB neither side broadcasts and bucketing is what saves the
    # shuffle)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_lineitem", "b_orders", on="l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
        assert joined.count() == tables["lineitem"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_lineitem")
        spark.sql("DROP TABLE b_orders")
