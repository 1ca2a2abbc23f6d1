"""Late round-6 operators: exact rolling median (robust window statistic)
and per-group token-distribution KL divergence (corpus drift monitor).

Both also carry registered queries (`rolling_median_price`,
`corpus_kl_by_lang`) whose DuckDB oracles run in the test_oracle_parity
sweep; these tests pin the operator semantics themselves against
independent replicas and closed-form facts.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from market_flow_spark.extensions.text import token_kl_divergence
from market_flow_spark.operators.analytics import rolling_median


def test_rolling_median_matches_pandas_replica(spark):
    """Odd and even frame counts, duplicate values, a group shorter than
    the window, and a spike the median must ignore — checked row-for-row
    against pandas.rolling(min_periods=1).median()."""
    rows = []
    series = {
        "a": [5.0, 1.0, 1.0, 9.0, 2.0, 1000.0, 3.0, 4.0],  # spike at t=5
        "b": [2.0, 2.0],  # shorter than the window
    }
    for g, vals in series.items():
        for i, v in enumerate(vals):
            rows.append((g, i, v))
    df = spark.createDataFrame(rows, "g string, t int, x double")

    got = {
        (r["g"], r["t"]): r["median4"]
        for r in rolling_median(df, "g", ["t"], "x", periods=4).collect()
    }
    for g, vals in series.items():
        exp = pd.Series(vals).rolling(4, min_periods=1).median()
        for i in range(len(vals)):
            assert got[(g, i)] == exp.iloc[i], (g, i)
    # the spike moves the trailing-4 median at t=6 to median(9,2,1000,3)=6,
    # not anywhere near 1000 — the robustness claim, pinned concretely
    assert got[("a", 6)] == 6.0


def test_rolling_median_even_frame_is_midpoint(spark):
    """quantile_cont(0.5) semantics: an even-count frame returns the
    average of the two central values (DuckDB `median` window behavior),
    not either neighbor."""
    df = spark.createDataFrame(
        [("g", 0, 1.0), ("g", 1, 2.0), ("g", 2, 4.0), ("g", 3, 8.0)],
        "g string, t int, x double",
    )
    got = {
        r["t"]: r["median4"]
        for r in rolling_median(df, "g", ["t"], "x", periods=4).collect()
    }
    assert got[0] == 1.0  # 1 value
    assert got[1] == 1.5  # midpoint of (1,2)
    assert got[2] == 2.0  # middle of (1,2,4)
    assert got[3] == 3.0  # midpoint of (2,4)


def test_rolling_median_seeded_grid_vs_pandas(spark):
    """Seeded grid property check in ONE Spark job (the repo's pattern
    for window ops): 20 groups x 30 rows of deterministic pseudo-random
    values with heavy duplicates, every row's trailing-7 median compared
    against pandas.rolling(min_periods=1).median()."""
    import hashlib

    def val(g, i):
        h = hashlib.md5(f"{g}:{i}".encode()).hexdigest()
        return float(int(h[:4], 16) % 13)  # 13 levels -> many exact ties

    rows = [(f"g{g}", i, val(g, i)) for g in range(20) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    got = {
        (r["g"], r["t"]): r["median7"]
        for r in rolling_median(df, "g", ["t"], "x", periods=7).collect()
    }
    for g in range(20):
        series = pd.Series([val(g, i) for i in range(30)])
        exp = series.rolling(7, min_periods=1).median()
        for i in range(30):
            assert got[(f"g{g}", i)] == exp.iloc[i], (g, i)


def test_kl_zero_for_identical_distributions(spark):
    """Groups with the same token distribution diverge from the corpus by
    exactly 0 (p == q for every token, ln(1) == 0 — and the fixed-point
    quantization of 0.0 is exactly 0, so the sum is exactly 0.0)."""
    docs = spark.createDataFrame(
        [(1, "en", "x y z"), (2, "de", "x y z"), (3, "fr", "x y z")],
        "doc_id bigint, lang string, text string",
    )
    out = token_kl_divergence(docs, group="lang").collect()
    assert len(out) == 3
    for r in out:
        assert r["kl_nats"] == 0.0
        assert r["n_tokens"] == 3
        assert r["vocab"] == 3


def test_kl_hand_computed_two_groups(spark):
    """Two groups with different distributions: value checked against the
    closed form computed in plain Python with the same quantization."""
    # group a: tokens {x: 3, y: 1}; group b: {x: 1, y: 3}
    docs = spark.createDataFrame(
        [(1, "a", "x x x y"), (2, "b", "x y y y")],
        "doc_id bigint, lang string, text string",
    )
    out = {r["lang"]: r for r in token_kl_divergence(docs, group="lang").collect()}

    scale = 1_000_000_000
    q = {"x": 4 / 8, "y": 4 / 8}

    def kl(counts, total):
        s = 0
        for tok, c in counts.items():
            p = c / total
            s += math.floor(p * math.log(p / q[tok]) * scale + 0.5)
        return math.floor(s / scale * 1_000_000 + 0.5) / 1_000_000

    assert out["a"]["kl_nats"] == kl({"x": 3, "y": 1}, 4)
    assert out["b"]["kl_nats"] == kl({"x": 1, "y": 3}, 4)
    assert out["a"]["n_tokens"] == 4 and out["a"]["vocab"] == 2


def test_kl_nonnegative_on_real_corpus(spark, tables):
    """Gibbs' inequality: KL >= 0 for every language slice of the real
    documents table (up to the 1e-9 quantization floor), and token mass
    adds up to the corpus total."""
    docs = tables["documents"]
    out = token_kl_divergence(docs, group="lang").collect()
    assert len(out) >= 2
    assert all(r["kl_nats"] >= -1e-6 for r in out)
    total_tokens = sum(r["n_tokens"] for r in out)
    # independent corpus token count (same tokenization)
    expect = docs.select(
        F.size(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total_tokens == expect


def test_budget_select_matches_naive_window(spark):
    """Two-phase global prefix sum == the naive single-partition
    SUM-OVER window, row for row, including the inclusive-boundary
    semantics (a row landing exactly ON the budget is selected)."""
    from pyspark.sql import Window

    from market_flow_spark.operators.ranking import global_budget_select

    # weights 1..40 in scrambled insert order; order by w desc, id asc
    rows = [(i, ((i * 17) % 40) + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "id bigint, w int")
    budget = 150
    got = {
        r["id"]: (r["cum_w"], r["selected"])
        for r in global_budget_select(
            df, [F.col("w").desc(), "id"], "w", budget, cum_col="cum_w"
        ).collect()
    }
    naive = Window.orderBy(F.col("w").desc(), "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["id"]: (r["cum_w"], r["cum_w"] <= budget)
        for r in df.withColumn("cum_w", F.sum("w").over(naive)).collect()
    }
    assert got == want
    assert any(sel for _, sel in got.values())
    assert not all(sel for _, sel in got.values())


def test_budget_select_exact_boundary_inclusive(spark):
    """cum == budget keeps the row; the next row is cut."""
    from market_flow_spark.operators.ranking import global_budget_select

    df = spark.createDataFrame(
        [(1, 50), (2, 50), (3, 50)], "id bigint, w int"
    )
    out = {
        r["id"]: r["selected"]
        for r in global_budget_select(df, ["id"], "w", budget=100).collect()
    }
    assert out == {1: True, 2: True, 3: False}


def test_budget_select_zero_weights_and_zero_budget(spark):
    """Zero-weight rows never consume budget (selected wherever the
    running total sits within it — including at budget 0), and a zero
    budget cuts every positive-weight row."""
    from market_flow_spark.operators.ranking import global_budget_select

    df = spark.createDataFrame(
        [(1, 0), (2, 3), (3, 0), (4, 2)], "id bigint, w int"
    )
    out = {
        r["id"]: (r["cum_weight"], r["selected"])
        for r in global_budget_select(df, ["id"], "w", budget=3).collect()
    }
    assert out == {1: (0, True), 2: (3, True), 3: (3, True), 4: (5, False)}

    zero = {
        r["id"]: r["selected"]
        for r in global_budget_select(df, ["id"], "w", budget=0).collect()
    }
    assert zero == {1: True, 2: False, 3: False, 4: False}


def test_budget_select_plans_two_phase(spark):
    """The data pass is range-partitioned with offsets broadcast back —
    never a single-partition global window over the corpus."""
    from market_flow_spark.operators.ranking import global_budget_select

    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 7).alias("w"))
    plan = (
        global_budget_select(df, ["id"], "w", budget=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan
    assert "BroadcastHashJoin" in plan


def test_kl_plan_reuses_the_corpus_aggregate(spark, tables):
    """The corpus is exploded and aggregated to (group, token) grain ONCE:
    since round 12 the compact (group, token) count table is materialized
    at construction (localCheckpoint, the DSIR pattern), so the scoring
    plan's four consumers (token totals, group totals, corpus total, the
    scoring join) all read the checkpoint — the executed plan must contain
    NO parquet re-scan of the corpus (pre-r12 the shape relied on AQE
    stage reuse, which only covered 2 of the 4 consumers; the other two
    re-ran the explode) and spill nothing. (The registered-query sweep in
    test_plans already bans row-Python UDFs and cartesians for
    corpus_kl_by_lang.)"""
    from market_flow_spark.metrics import collect_and_measure

    df = token_kl_divergence(tables["documents"], group="lang")
    n, m = collect_and_measure(df)
    assert n >= 2
    ep = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in ep, ep[:500]
    assert m["spill_bytes"] == 0
    assert m["broadcast_exchanges"] >= 2  # group totals + corpus total
