"""Funnel/cohort behavior: strict-order first-touch semantics and exact
month-offset cohorting, on hand-built event streams."""

from __future__ import annotations

from datetime import datetime

from market_flow_spark.operators import funnel as fun

SCHEMA = "user_id BIGINT, ts TIMESTAMP, event_type STRING"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, m, d, h), t) for (u, m, d, h, t) in rows], SCHEMA
    )


def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1: full ordered funnel
        (1, 1, 1, 0, "view"), (1, 1, 2, 0, "click"), (1, 1, 3, 0, "purchase"),
        # user 2: clicked BEFORE viewing — click must not count
        (2, 1, 2, 0, "click"), (2, 1, 3, 0, "view"),
        # user 3: view+click but purchase before click — purchase must not count
        (3, 1, 1, 0, "view"), (3, 1, 3, 0, "click"), (3, 1, 2, 0, "purchase"),
        # user 4: only purchase
        (4, 1, 1, 0, "purchase"),
    ]
    out = {
        r.step: r
        for r in fun.funnel_conversion(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert out["view"].n_users == 3        # users 1,2,3
    assert out["click"].n_users == 2       # users 1,3 (user 2 clicked early)
    assert out["purchase"].n_users == 1    # user 1 only
    assert out["view"].conversion_from_first == 1.0
    assert out["purchase"].conversion_from_prev == 0.5


def test_funnel_same_timestamp_is_not_after(spark):
    rows = [(1, 1, 1, 0, "view"), (1, 1, 1, 0, "click")]
    out = {
        r.step: r.n_users
        for r in fun.funnel_conversion(_ev(spark, rows), ["view", "click"]).collect()
    }
    assert out == {"view": 1, "click": 0}


def test_cohort_retention_offsets(spark):
    rows = [
        # user 1: first in Jan, active Jan+Feb+Apr
        (1, 1, 5, 0, "view"), (1, 2, 5, 0, "view"), (1, 4, 5, 0, "view"),
        # user 2: first in Jan, active Jan only
        (2, 1, 9, 0, "click"),
        # user 3: first in Feb, active Feb+Mar
        (3, 2, 1, 0, "view"), (3, 3, 1, 0, "view"),
    ]
    out = {
        (r.cohort_month, r.month_offset): (r.n_active, r.n_cohort, r.retention_rate)
        for r in fun.cohort_retention(_ev(spark, rows)).collect()
    }
    assert out[("2024-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01", 1)] == (1, 2, 0.5)   # only user 1 in Feb
    assert out[("2024-01", 3)] == (1, 2, 0.5)   # user 1 in Apr
    assert ("2024-01", 2) not in out            # nobody active in Mar
    assert out[("2024-02", 0)] == (1, 1, 1.0)
    assert out[("2024-02", 1)] == (1, 1, 1.0)


def test_rolling_zscore_flags_injected_spike(spark):
    """A flat series with one injected spike: only the spike is anomalous,
    and rows with < min_periods trailing points carry NULL stats."""
    from market_flow_spark.operators.analytics import rolling_zscore_anomalies

    vals = [100.0 + (i % 3) for i in range(12)] + [500.0] + [101.0, 102.0]
    rows = [("b", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g STRING, t INT, x DOUBLE")
    out = {r.t: r for r in rolling_zscore_anomalies(
        df, "g", ["t"], "x", lookback=12, min_periods=6, threshold=3.0
    ).collect()}
    # warm-up rows: no stats, never anomalous
    for t in range(6):
        assert out[t].z is None and out[t].is_anomaly is False
    # the spike at t=12 is flagged; its neighbors are not
    assert out[12].is_anomaly and out[12].z > 3.0
    assert not out[11].is_anomaly
    # t=13 compares against a window CONTAINING the spike -> inflated std
    # swallows the return to normal: not anomalous
    assert not out[13].is_anomaly


def test_transition_matrix_rows_sum_to_one(spark, tables):
    from market_flow_spark.operators.funnel import event_transition_matrix

    tm = event_transition_matrix(tables["events"])
    rows = tm.collect()
    assert rows, "no transitions found"
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["prob"]
    for ft, total in by_from.items():
        assert abs(total - 1.0) < 1e-3, (ft, total)


def test_transition_matrix_counts_small_sequence(spark):
    from pyspark.sql import functions as F

    from market_flow_spark.operators.funnel import event_transition_matrix

    rows = [
        (1, 10, "2020-01-01 00:00:00", "view"),
        (2, 10, "2020-01-01 00:01:00", "click"),
        (3, 10, "2020-01-01 00:02:00", "view"),
        (4, 10, "2020-01-01 00:03:00", "click"),
        (5, 10, "2020-01-01 00:04:00", "purchase"),
        (6, 20, "2020-01-01 00:00:00", "view"),
        (7, 20, "2020-01-01 00:01:00", "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in event_transition_matrix(df).collect()
    }
    assert got[("view", "click")][0] == 2
    assert got[("view", "view")][0] == 1
    assert got[("click", "view")][0] == 1
    assert got[("click", "purchase")][0] == 1
    assert abs(got[("view", "click")][1] - 0.666667) < 1e-6
    assert abs(got[("click", "purchase")][1] - 0.5) < 1e-9
