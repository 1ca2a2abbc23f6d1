"""bench_compare.compare: the two-gate (noise-bar x abs-floor) flagger.

The noise bar is each query's own measured pass spread (max/min over warm
passes) times a 1.15 margin — the round-5 verdict's fix for attributing
bench movement to code rather than environment variance.
"""

from __future__ import annotations

from bench_compare import compare


def _detail(queries, spreads=None, total=None):
    return {
        "warm_queries": queries,
        "warm_spread_max_over_min": spreads or {},
        "warm_total": total if total is not None else sum(queries.values()),
    }


def test_flags_regression_above_noise_bar_and_floor():
    old = _detail({"q": 1.0}, {"q": 1.1})
    new = _detail({"q": 2.0}, {"q": 1.1})
    r = compare(old, new)
    assert [e["query"] for e in r["regressions"]] == ["q"]
    assert r["improvements"] == []
    # bar = max(1.1, 1.1) * 1.15 = 1.265 < 2.0 ratio
    assert r["regressions"][0]["noise_bar"] == 1.26 or r["regressions"][0]["noise_bar"] == 1.27


def test_within_spread_moves_are_not_flagged():
    # 1.8x move but the query's own pass spread is 2.0x — noise, not code.
    old = _detail({"q": 1.0}, {"q": 2.0})
    new = _detail({"q": 1.8}, {"q": 1.3})
    r = compare(old, new)
    assert r["regressions"] == [] and r["improvements"] == []


def test_abs_floor_suppresses_subsecond_jitter():
    # 3x ratio but only 40 ms absolute — below the 0.3 s materiality floor.
    old = _detail({"q": 0.02}, {"q": 1.0})
    new = _detail({"q": 0.06}, {"q": 1.0})
    r = compare(old, new)
    assert r["regressions"] == []
    # with the floor lowered it IS flagged
    r2 = compare(old, new, abs_floor=0.01)
    assert [e["query"] for e in r2["regressions"]] == ["q"]


def test_improvement_flagged_symmetrically():
    old = _detail({"q": 3.0}, {"q": 1.05})
    new = _detail({"q": 1.0}, {"q": 1.05})
    r = compare(old, new)
    assert [e["query"] for e in r["improvements"]] == ["q"]
    assert r["regressions"] == []


def test_added_removed_and_missing_spread_defaults():
    old = _detail({"a": 1.0, "gone": 0.5})
    new = _detail({"a": 1.0, "fresh": 0.2})
    r = compare(old, new)
    assert r["added"] == ["fresh"] and r["removed"] == ["gone"]
    assert r["n_shared"] == 1
