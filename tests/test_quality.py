"""The dbt-style data-quality suite over the built star schema, plus checks
that the checks themselves detect violations."""

from __future__ import annotations

from market_flow_spark.quality import (
    check_accepted_values,
    check_not_null,
    check_relationship,
    check_unique,
    run_star_schema_checks,
)


def test_star_schema_integrity(spark, tables):
    results = run_star_schema_checks(tables)
    failing = [r for r in results if not r.passed]
    assert not failing, f"integrity violations: {failing}"
    assert len(results) == 9


def test_pipeline_quality_gate_fails_on_violation(spark, sf_dir, tmp_path, monkeypatch):
    """run_pipeline must RAISE (not warn) when a check reports violations."""
    import pytest

    from market_flow_spark.plans import pipeline as pl
    from market_flow_spark.quality import CheckResult

    def broken_suite(tables):
        return [CheckResult("unique", "fact_transactions", "transaction_id", 3)]

    monkeypatch.setattr(pl, "run_star_schema_checks", broken_suite)
    with pytest.raises(pl.QualityCheckError) as exc:
        pl.run_pipeline(spark, sf_dir, str(tmp_path / "wh"))
    assert "unique(fact_transactions.transaction_id)=3" in str(exc.value)


def test_checks_detect_violations(spark):
    bad = spark.createDataFrame(
        [(1, "a"), (1, "b"), (None, "c")], "k int, v string"
    )
    parent = spark.createDataFrame([(1,)], "k int")
    assert check_not_null(bad, "k").violations == 1
    assert check_unique(bad, "k").violations == 2  # both rows of the dup key
    assert check_accepted_values(bad, "v", ["a", "b"]).violations == 1
    # orphan: the NULL key and nothing else (1 is present in parent)
    rel = check_relationship(bad, "k", parent, "k")
    assert rel.violations == 1
    assert not rel.passed and check_not_null(bad, "v").passed


def test_pipeline_run_is_json_serializable_path_mapping(spark, sf_dir, tmp_path):
    """The Makefile pipes run_pipeline's return through json.dumps — the
    PipelineRun must serialize as a plain {table: path} object with the
    quality results out-of-band."""
    import json

    from market_flow_spark.plans.pipeline import run_pipeline

    run = run_pipeline(spark, sf_dir, str(tmp_path / "wh_json"))
    blob = json.loads(json.dumps(run))
    assert blob == dict(run)
    assert all(isinstance(v, str) for v in blob.values())
    assert "quality" not in blob and run.quality


def test_fused_checks_match_individual(spark, tables):
    from market_flow_spark import quality as Q

    orders = tables["orders"]
    fused = Q.run_checks_fused(
        orders,
        not_null=["o_orderkey", "o_custkey"],
        accepted_values={"o_orderstatus": ["O", "F", "P"]},
        positive=["o_totalprice"],
        table="orders",
    )
    by_key = {(r.check, r.column): r.violations for r in fused}
    assert by_key[("not_null", "o_orderkey")] == Q.check_not_null(
        orders, "o_orderkey"
    ).violations
    assert by_key[("accepted_values", "o_orderstatus")] == Q.check_accepted_values(
        orders, "o_orderstatus", ["O", "F", "P"]
    ).violations
    assert ("positive", "o_totalprice") in by_key


def test_profile_columns_approx_within_tolerance(spark, tables):
    """The HLL++ scale path tracks the exact profile within its error
    bound; nulls and min/max are exact in both modes."""
    from market_flow_spark.operators.analytics import profile_columns

    orders = tables["orders"]
    cols = ["o_orderkey", "o_orderstatus"]
    exact = {r["column"]: r for r in profile_columns(orders, cols, exact=True).collect()}
    approx = {r["column"]: r for r in profile_columns(orders, cols, exact=False).collect()}
    for c in cols:
        assert approx[c]["n_nulls"] == exact[c]["n_nulls"]
        assert approx[c]["min_value"] == exact[c]["min_value"]
        assert approx[c]["max_value"] == exact[c]["max_value"]
        assert abs(approx[c]["n_distinct"] - exact[c]["n_distinct"]) <= max(
            5, 0.1 * exact[c]["n_distinct"]
        )
