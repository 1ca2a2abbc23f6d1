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


def test_key_skew_profile_detects_hot_key(spark):
    from market_flow_spark.operators.skew import key_skew_profile

    hot = spark.createDataFrame(
        [(1 if i % 2 == 0 else i, i) for i in range(2000)], "k long, v long"
    )
    prof = key_skew_profile(hot, "k")
    assert prof["n_sampled"] == 2000
    assert prof["top_keys"][0][0] == 1
    assert abs(prof["top_share"] - 0.5) < 0.05
    flat = spark.range(2000).select(F.col("id").alias("k"), F.col("id").alias("v"))
    assert key_skew_profile(flat, "k")["top_share"] < 0.01


def test_auto_salted_join_equivalent_and_conditional(spark):
    """auto_salted_join returns the plain-join rows exactly; it salts a
    hot-keyed big side (small side exploded N ways) and leaves a balanced
    one unsalted (no crossJoin of salts in the plan)."""
    from market_flow_spark.operators.skew import auto_salted_join

    big_hot = spark.createDataFrame(
        [(1 if i % 2 == 0 else i % 50, i) for i in range(4000)],
        "k long, payload long",
    )
    small = spark.createDataFrame([(i, f"d{i}") for i in range(50)], "k long, d string")
    plain = big_hot.join(small, "k").orderBy("payload").collect()
    salted = auto_salted_join(big_hot, small, "k", salt_source="payload")
    assert salted.orderBy("payload").collect() == plain
    assert "__salt" in salted._jdf.queryExecution().analyzed().toString()
    # balanced side: decision is NOT to salt -> no salt column anywhere
    big_flat = spark.createDataFrame(
        [(i % 50, i) for i in range(4000)], "k long, payload long"
    )
    unsalted = auto_salted_join(big_flat, small, "k")
    assert "__salt" not in unsalted._jdf.queryExecution().analyzed().toString()
    assert unsalted.count() == 4000
