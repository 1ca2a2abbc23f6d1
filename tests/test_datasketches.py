"""Native DataSketches layer: theta rollup/overlap vs exact DuckDB
oracles, HLL sketch-cube merge consistency, KLL quantile accuracy.

The scale claim under test: sketches are built ONCE at the finest grain
(one groupBy aggregate over the data) and every coarser grain is
answered by MERGING the persisted sketch rows — so the merge paths must
agree exactly (HLL, deterministic register-max) or within published
error (KLL) with direct computation over the raw rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from market_flow_spark.extensions import datasketches as ds
from market_flow_spark.queries_all import ORACLES, QUERIES


def _rows(df, cols):
    # None-safe sort (the rollup total row carries a NULL group key)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_theta_rollup_matches_exact_oracle(spark, sf_dir, duck):
    cols = ["o_orderpriority", "est_distinct", "is_total"]
    got = _rows(QUERIES["theta_rollup_custkeys"](spark, sf_dir), cols)
    exp = sorted(
        (tuple(t) for t in duck.execute(ORACLES["theta_rollup_custkeys"]).fetchall()),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    assert got == exp
    # the rollup genuinely discriminates: at least two groups + a total
    assert len(got) >= 3


def test_theta_overlap_matches_exact_set_algebra(spark, sf_dir, duck):
    cols = ["est_a", "est_b", "est_union", "est_intersection", "est_difference"]
    got = _rows(QUERIES["theta_overlap_years"](spark, sf_dir), cols)
    exp = sorted(
        tuple(t) for t in duck.execute(ORACLES["theta_overlap_years"]).fetchall()
    )
    assert got == exp
    (a, b, uni, inter, diff) = got[0]
    # inclusion-exclusion holds and the sides genuinely differ
    assert uni == a + b - inter
    assert diff == a - inter


def test_theta_estimation_mode_stays_within_error(spark):
    """Above 2^lgk the sketch leaves exact mode; the estimate must stay
    inside the published ±1.6% (lgk=12) band with margin."""
    n = 200_000
    df = spark.range(n)
    est = df.agg(
        F.theta_sketch_estimate(F.theta_sketch_agg("id", 12)).alias("est")
    ).first()["est"]
    assert abs(est - n) / n < 0.05


def test_hll_cube_merge_equals_direct_sketch(spark, tables):
    """The sketch-cube invariant: union-merging the fine-grain
    (priority, year) HLL sketches up to priority grain produces the SAME
    estimates as sketching the priority grain directly — register-max
    merge is lossless, so this is exact equality, no tolerance."""
    orders = tables["orders"].withColumn("yr", F.year("o_orderdate"))
    cube = ds.hll_sketch_cube(orders, ["o_orderpriority", "yr"], "o_custkey")
    from_cube = _rows(
        ds.hll_rollup_from_cube(cube, ["o_orderpriority"]),
        ["o_orderpriority", "est_distinct"],
    )
    direct = _rows(
        orders.groupBy("o_orderpriority").agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias(
                "est_distinct"
            )
        ),
        ["o_orderpriority", "est_distinct"],
    )
    assert from_cube == direct

    # grand total from the cube, and accuracy vs exact
    total = ds.hll_rollup_from_cube(cube, []).first()["est_distinct"]
    exact = orders.select("o_custkey").distinct().count()
    assert abs(total - exact) / exact < 0.05


def test_kll_group_and_merged_quantiles(spark, tables):
    li = tables["lineitem"]
    per = ds.kll_group_quantiles(
        li, "l_returnflag", "l_quantity", [0.5, 0.9], k=4096
    )
    rows = {r["l_returnflag"]: r for r in per.collect()}
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for flag, r in rows.items():
        assert r["n"] == exact[flag]["n"]
        # quantity is 1..50; KLL rank error ~0.4% of n at k=4096 → the
        # returned value quantile must land within a few units
        assert abs(r["p50"] - exact[flag]["p50"]) <= 2
        assert abs(r["p90"] - exact[flag]["p90"]) <= 2

    merged = ds.kll_merged_quantiles(
        li, "l_returnflag", "l_quantity", [0.5, 0.9], k=4096
    ).first()
    assert merged["n"] == li.count()
    g50 = li.agg(F.expr("percentile(l_quantity, 0.5)")).first()[0]
    g90 = li.agg(F.expr("percentile(l_quantity, 0.9)")).first()[0]
    assert abs(merged["p50"] - g50) <= 2
    assert abs(merged["p90"] - g90) <= 2


def test_theta_rollup_plan_is_single_scan(spark, sf_dir):
    """The total row merges per-group sketches — the ROW count scanned
    must come from one Exchange at group grain feeding both branches, and
    no Python UDFs anywhere (all sketch ops are JVM DataSketches)."""
    df = QUERIES["theta_rollup_custkeys"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "theta_sketch_agg" in plan or "ThetaSketchAgg" in plan.replace(" ", "")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_theta_union_respects_caller_lgk(spark):
    """r11 sf0.1 deep-sweep find: F.theta_union has its OWN lgk and,
    left at the 4096-entry default, silently truncates the union of two
    exact wider sketches back into estimation mode. Two disjoint-ish
    6k-distinct sides (union 9k > 4096) at lgk=15 must read EXACT on
    every estimate, union included."""
    a = spark.range(0, 6000).selectExpr("id AS v")
    b = spark.range(3000, 9000).selectExpr("id AS v")
    row = ds.theta_overlap(a, b, "v", lgk=15).first()
    assert row["est_a"] == 6000.0
    assert row["est_b"] == 6000.0
    assert row["est_union"] == 9000.0
    assert row["est_intersection"] == 3000.0
    assert row["est_difference"] == 3000.0
