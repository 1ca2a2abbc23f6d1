"""Edge-case tests for operators/temporal.py (as-of join, binned range
join) on hand-built frames where the expected answer is enumerable by hand.
The oracle-parity suite checks them against DuckDB on real data; these pin
the boundary semantics (ties, NULL payloads, bin edges) explicitly.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from market_flow_spark.operators.temporal import asof_join, range_join_binned


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


def _asof_rows(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "id int, k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", values=["v"]
    )
    return {r["id"]: r["v_asof"] for r in out.collect()}


def test_asof_picks_latest_at_or_before(spark):
    got = _asof_rows(
        spark,
        [(1, "a", _ts(10)), (2, "a", _ts(30))],
        [("a", _ts(5), 1.0), ("a", _ts(9), 2.0), ("a", _ts(20), 3.0)],
    )
    assert got == {1: 2.0, 2: 3.0}


def test_asof_equal_timestamp_is_inclusive(spark):
    got = _asof_rows(
        spark,
        [(1, "a", _ts(10))],
        [("a", _ts(10), 7.0)],
    )
    assert got == {1: 7.0}


def test_asof_no_prior_row_yields_null_and_keeps_left_row(spark):
    got = _asof_rows(
        spark,
        [(1, "a", _ts(1)), (2, "zzz", _ts(59))],
        [("a", _ts(30), 1.0)],
    )
    assert got == {1: None, 2: None}


def test_asof_null_payload_in_latest_row_is_carried_not_skipped(spark):
    # The latest right row has v=NULL; exact as-of semantics must surface
    # that NULL, not fall back to the older non-null value (the payload
    # struct is non-null even when its fields are NULL).
    got = _asof_rows(
        spark,
        [(1, "a", _ts(40))],
        [("a", _ts(10), 5.0), ("a", _ts(20), None)],
    )
    assert got == {1: None}


def test_asof_keys_do_not_leak_across_groups(spark):
    got = _asof_rows(
        spark,
        [(1, "a", _ts(30)), (2, "b", _ts(30))],
        [("a", _ts(10), 1.0), ("b", _ts(20), 2.0)],
    )
    assert got == {1: 1.0, 2: 2.0}


def test_asof_left_row_count_preserved_with_duplicate_left_ts(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "a", _ts(10)), (3, "a", _ts(10))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts(10), 9.0)], "k string, ts timestamp, v double"
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", values=["v"]
    )
    rows = out.collect()
    assert len(rows) == 3 and {r["v_asof"] for r in rows} == {9.0}


def _range_pairs(spark, left_rows, right_rows, tol_us):
    left = spark.createDataFrame(left_rows, "id int, k string, us long")
    right = spark.createDataFrame(right_rows, "k string, rus long, v double")
    out = range_join_binned(
        left,
        right,
        on=["k"],
        left_ts_us=F.col("us"),
        right_ts_us=F.col("rus"),
        tolerance_us=tol_us,
    )
    return sorted((r["id"], r["v"]) for r in out.collect())


def test_range_join_boundary_inclusive_and_exclusive(spark):
    # tol=100: |Δ| == 100 is in, |Δ| == 101 is out.
    got = _range_pairs(
        spark,
        [(1, "a", 1000)],
        [("a", 900, 1.0), ("a", 1100, 2.0), ("a", 899, 3.0), ("a", 1101, 4.0)],
        tol_us=100,
    )
    assert got == [(1, 1.0), (1, 2.0)]


def test_range_join_matches_across_bin_boundary(spark):
    # left in bin 10 (us=1050), right in bin 9 (us=999): only reachable
    # because the right side replicates into adjacent bins.
    got = _range_pairs(
        spark, [(1, "a", 1050)], [("a", 999, 1.0)], tol_us=100
    )
    assert got == [(1, 1.0)]


def test_range_join_same_bin_but_out_of_tolerance_is_filtered(spark):
    # both in bin 0 under tol=1000 but |Δ| > 100 under tol=100? No — use
    # one call: tol=1000 puts 10 and 990 in bin 0, |Δ|=980 <= 1000 → kept;
    # tol=100 bins differ by 9 → replicate ±1 can't reach → dropped.
    assert _range_pairs(
        spark, [(1, "a", 10)], [("a", 990, 1.0)], tol_us=1000
    ) == [(1, 1.0)]
    assert _range_pairs(
        spark, [(1, "a", 10)], [("a", 990, 1.0)], tol_us=100
    ) == []


def test_range_join_inner_semantics_key_mismatch_drops_row(spark):
    got = _range_pairs(
        spark, [(1, "a", 1000)], [("b", 1000, 1.0)], tol_us=100
    )
    assert got == []


def test_range_join_each_qualifying_pair_exactly_once(spark):
    # right row sits in the same bin as left AND within tolerance — the
    # 3-way replication must not produce duplicate joined pairs.
    got = _range_pairs(
        spark, [(1, "a", 1000)], [("a", 1001, 1.0)], tol_us=100
    )
    assert got == [(1, 1.0)]


def test_range_join_negative_epoch_floor_binning(spark):
    # Pre-1970 timestamps: with truncating division, -50 and 50 under
    # tol=1000 both landed in "bin 0" by accident of trunc-toward-zero,
    # but e.g. -1050 (true bin -2) vs -10 (true bin -1) must still pair:
    # floor semantics keep adjacent-bin replication correct for negatives.
    got = _range_pairs(
        spark, [(1, "a", -1010)], [("a", -10, 1.0)], tol_us=1000
    )
    assert got == [(1, 1.0)]
    # symmetric case across the zero boundary
    got = _range_pairs(spark, [(2, "a", -100)], [("a", 850, 2.0)], tol_us=1000)
    assert got == [(2, 2.0)]
    # and out-of-tolerance negatives stay dropped
    assert _range_pairs(spark, [(3, "a", -5000)], [("a", -10, 3.0)], tol_us=1000) == []


def test_range_join_negative_epoch_property(spark):
    # Shift-invariance property: binning must find exactly the pairs the
    # brute-force |l - r| <= tol predicate finds, for a grid straddling 0.
    import itertools

    tol = 700
    lvals = [-3000, -1500, -701, -700, -1, 0, 1, 699, 700, 701, 2100]
    rvals = [-2900, -1400, -700, -350, 0, 350, 700, 1400, 2899]
    left = [(i, "k", v) for i, v in enumerate(lvals)]
    right = [("k", v, float(v)) for v in rvals]
    expect = sorted(
        (i, float(r))
        for (i, _, l), r in itertools.product([(i, "k", v) for i, v in enumerate(lvals)], rvals)
        if abs(l - r) <= tol
    )
    assert _range_pairs(spark, left, right, tol_us=tol) == expect


def test_ewma_matches_recursive_model(spark):
    """Closed-form prefix-sum EWMA == the defining recursion
    y_n = a*x_n + (1-a)*y_{n-1}, y_1 = x_1 (pandas ewm(adjust=False))."""
    from market_flow_spark.operators.temporal import ewma

    alpha = 0.3
    series = {
        "g1": [10.0, 12.0, 11.0, 15.0, 14.5, 9.0],
        "g2": [100.0, 100.0, 50.0, 75.0],
    }
    rows = [
        (g, i, x) for g, xs in series.items() for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, ["g", "i", "x"])
    got = {
        (r["g"], r["i"]): r["ewma"]
        for r in ewma(df, ["g"], ["i"], "x", alpha).collect()
    }
    for g, xs in series.items():
        y = xs[0]
        assert abs(got[(g, 0)] - y) < 1e-9
        for i, x in enumerate(xs[1:], start=1):
            y = alpha * x + (1 - alpha) * y
            assert abs(got[(g, i)] - y) < 1e-9, (g, i)


# --- interval_lookup: point-in-interval band join -------------------------


def _il_naive(facts, intervals, keyed):
    """All-pairs reference: (fact_id, interval_id) where lo <= p <= hi
    (and keys equal when keyed)."""
    return {
        (f[0], i[0])
        for f in facts
        for i in intervals
        if i[2] <= f[2] <= i[3] and (not keyed or f[1] == i[1])
    }


_IL_FACTS = [
    # (fact_id, key, point) — includes negatives, exact bounds, far-out
    (1, "a", -5.0),
    (2, "a", 0.0),
    (3, "a", 10.0),
    (4, "b", 10.0),
    (5, "b", 99.5),
    (6, "b", 1000.0),
    (7, "a", 2.5),
]
_IL_INTERVALS = [
    # (interval_id, key, lo, hi) — overlapping, variable width, one huge
    (100, "a", -10.0, 0.0),
    (101, "a", 0.0, 10.0),
    (102, "a", 2.0, 3.0),
    (103, "b", 5.0, 15.0),
    (104, "b", -100.0, 500.0),  # >> median width: exercises the cap path
    (105, "a", 50.0, 60.0),
]


def _il_run(spark, keyed, **kw):
    from market_flow_spark.operators.temporal import interval_lookup

    facts = spark.createDataFrame(_IL_FACTS, "fact_id int, fk string, p double")
    ints = spark.createDataFrame(
        _IL_INTERVALS, "interval_id int, ik string, lo double, hi double"
    )
    if keyed:
        ints = ints.withColumnRenamed("ik", "fk")
    out = interval_lookup(
        facts, ints, "p", "lo", "hi", on=["fk"] if keyed else [], **kw
    )
    return {(r["fact_id"], r["interval_id"]) for r in out.collect()}


def test_interval_lookup_unkeyed_matches_naive(spark):
    expect = _il_naive(_IL_FACTS, _IL_INTERVALS, keyed=False)
    assert _il_run(spark, keyed=False) == expect
    assert _il_run(spark, keyed=False, strategy="broadcast") == expect


def test_interval_lookup_keyed_matches_naive(spark):
    expect = _il_naive(_IL_FACTS, _IL_INTERVALS, keyed=True)
    assert _il_run(spark, keyed=True) == expect
    assert _il_run(spark, keyed=True, strategy="broadcast") == expect


def test_interval_lookup_explicit_width_and_cap(spark):
    expect = _il_naive(_IL_FACTS, _IL_INTERVALS, keyed=False)
    # tiny explicit width: many buckets per interval, same answer
    assert _il_run(spark, keyed=False, bucket_width=0.5) == expect
    # brutal cap: the 600-wide interval forces a coarse width, same answer
    assert _il_run(spark, keyed=False, max_buckets_per_interval=2) == expect


def test_interval_lookup_bounds_inclusive_and_empty(spark):
    from market_flow_spark.operators.temporal import interval_lookup

    facts = spark.createDataFrame(
        [(1, 5.0), (2, 4.999), (3, 7.001)], "fact_id int, p double"
    )
    ints = spark.createDataFrame(
        [(9, 5.0, 7.0)], "interval_id int, lo double, hi double"
    )
    got = {
        (r["fact_id"], r["interval_id"])
        for r in interval_lookup(facts, ints, "p", "lo", "hi").collect()
    }
    assert got == {(1, 9)}  # both bounds inclusive, outside points drop
    none = interval_lookup(
        facts.filter("p > 100"), ints, "p", "lo", "hi"
    )
    assert none.count() == 0


def test_interval_lookup_random_grid_matches_model(spark):
    """Grid-vs-model in one job (per-example Spark jobs would be slow):
    200 facts x 48 intervals from a seeded generator — widths spanning 4
    orders of magnitude, zero-width points, negatives, duplicates —
    must match the all-pairs python model under auto width, tiny width,
    and a brutal replication cap."""
    import random

    from market_flow_spark.operators.temporal import interval_lookup

    rng = random.Random(0xC0FFEE)
    facts = [
        (i, round(rng.uniform(-1000.0, 1000.0), 3)) for i in range(200)
    ]
    ints = []
    for j in range(48):
        lo = round(rng.uniform(-1200.0, 1200.0), 3)
        width = rng.choice([0.0, 0.05, 0.5, 5.0, 50.0, 500.0])
        ints.append((1000 + j, lo, round(lo + width, 3)))
    expect = {
        (f[0], i[0]) for f in facts for i in ints if i[1] <= f[1] <= i[2]
    }
    fdf = spark.createDataFrame(facts, "fact_id int, p double")
    idf = spark.createDataFrame(ints, "interval_id int, lo double, hi double")

    def got(**kw):
        out = interval_lookup(fdf, idf, "p", "lo", "hi", **kw)
        return {(r["fact_id"], r["interval_id"]) for r in out.collect()}

    assert got() == expect
    assert got(bucket_width=0.25) == expect
    assert got(max_buckets_per_interval=3) == expect
    assert got(strategy="broadcast") == expect


def test_ewma_unbounded_matches_recursion_across_segments(spark):
    """The two-level closed form == the defining recursion on a series
    LONGER than the segment size (alpha=0.5 -> B=664): 2000 rows cross 4
    segments, so the carry handoff executes three times per group."""
    import random

    from market_flow_spark.operators.temporal import ewma_unbounded

    rng = random.Random(7)
    series = {
        "g1": [rng.uniform(1.0, 100.0) for _ in range(2000)],
        "g2": [rng.uniform(1.0, 100.0) for _ in range(700)],
        "g3": [5.0],  # single row: y = x
    }
    alpha = 0.5
    rows = [(g, i, x) for g, xs in series.items() for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, i int, x double")
    got = {
        (r["g"], r["i"]): r["ewma"]
        for r in ewma_unbounded(df, ["g"], ["i"], "x", alpha).collect()
    }
    assert len(got) == sum(len(xs) for xs in series.values())
    for g, xs in series.items():
        y = xs[0]
        assert abs(got[(g, 0)] - y) < 1e-9
        for i, x in enumerate(xs[1:], start=1):
            y = alpha * x + (1 - alpha) * y
            assert abs(got[(g, i)] - y) / max(abs(y), 1e-12) < 1e-9, (g, i)


def test_ewma_unbounded_agrees_with_bounded_and_guards(spark):
    """On a short series both EWMA implementations are valid and must
    agree; out-of-window segment overrides and bad alpha raise."""
    import pytest as _pytest

    from market_flow_spark.operators.temporal import ewma, ewma_unbounded

    rows = [("a", i, float(10 + (i * 7) % 13)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, i int, x double")
    a = {
        (r["g"], r["i"]): r["ewma"]
        for r in ewma(df, ["g"], ["i"], "x", 0.3).collect()
    }
    b = {
        (r["g"], r["i"]): r["ewma"]
        for r in ewma_unbounded(df, ["g"], ["i"], "x", 0.3).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, k

    with _pytest.raises(ValueError):
        ewma_unbounded(df, ["g"], ["i"], "x", 0.3, segment_rows=10)
    with _pytest.raises(ValueError):
        ewma_unbounded(df, ["g"], ["i"], "x", 1.5)
