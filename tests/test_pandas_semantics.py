"""The imputation/window operators claim exact pandas semantics in their
docstrings (rolling(min_periods=1), ffill/bfill). Verify those claims
against pandas itself on randomized series."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from market_flow_spark.operators.analytics import rolling_mean
from market_flow_spark.operators.imputation import ffill_bfill


def _series_df(spark, seed: int, n: int = 60, null_every: int | None = None):
    rng = np.random.default_rng(seed)
    vals = np.round(rng.uniform(1, 100, n), 2)
    pdf = pd.DataFrame(
        {"g": ["a"] * n, "k": range(n), "v": vals.astype("float64")}
    )
    if null_every:
        pdf.loc[pdf.index % null_every == 0, "v"] = np.nan
    return pdf, spark.createDataFrame(pdf)


def test_rolling_mean_matches_pandas(spark):
    for seed in (1, 7):
        pdf, df = _series_df(spark, seed)
        got = (
            rolling_mean(df, "g", "k", "v", periods=30)
            .orderBy("k")
            .toPandas()["ma30"]
            .to_numpy()
        )
        # window SHAPE must match pandas rolling(min_periods=1) exactly;
        # compare against the UNROUNDED pandas means — the engines'
        # floor-based rounding can legitimately differ from pandas' round()
        # on exact half-cent values (engine↔engine parity is what the
        # oracle tests pin; pandas is a third rounding regime)
        raw = pdf["v"].rolling(30, min_periods=1).mean().to_numpy()
        assert np.allclose(got, raw, atol=0.0051), seed


def test_ffill_bfill_matches_pandas(spark):
    for seed in (3, 11):
        pdf, df = _series_df(spark, seed, null_every=4)
        got = (
            ffill_bfill(df, "g", "k", "v").orderBy("k").toPandas()["v"].to_numpy()
        )
        exp = pdf["v"].ffill().bfill().to_numpy()
        assert np.array_equal(got, exp), seed


def test_ffill_bfill_all_null_group(spark):
    """A group with no observations at all stays NULL (pandas behavior)."""
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, None)], "g string, k int, v double"
    )
    out = ffill_bfill(df, "g", "k", "v").collect()
    assert all(r.v is None for r in out)


def test_approx_distinct_within_tolerance(spark, tables):
    """The 100 TB path for A9: approx_count_distinct must land within its
    documented rsd of the exact count on real data."""
    li = tables["lineitem"]
    exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06  # 3x rsd safety margin


def test_percentile_name_edge_cases():
    from market_flow_spark.operators.analytics import percentile_name

    assert percentile_name(0.5) == "p50"
    assert percentile_name(0.9) == "p90"
    assert percentile_name(0.99) == "p99"
    assert percentile_name(1.0) == "p100"
    assert percentile_name(0.0) == "p0"
    assert percentile_name(0.999) == "p99_9"
    assert percentile_name(0.00001) == "p0_001"
