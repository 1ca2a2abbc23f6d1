"""bench_merge: min-basis union of two bench_detail runs."""

from __future__ import annotations

from bench_merge import merge


def _run(passes, cold=None, n=2):
    return {
        "warm_passes": passes,
        "warm_queries": {k: min(v) for k, v in passes.items()},
        "warm_min": {k: min(v) for k, v in passes.items()},
        "warm_total": round(sum(min(v) for v in passes.values()), 3),
        "warm_total_min": round(sum(min(v) for v in passes.values()), 3),
        "cold_queries": cold or {},
        "cold_total": round(sum((cold or {}).values()), 3),
        "n_warm_passes": n,
    }


def test_merge_takes_min_and_union_spread():
    a = _run({"q1": [2.0, 1.8], "q2": [1.0, 1.1]}, cold={"q1": 5.0})
    b = _run({"q1": [1.2, 1.4], "q2": [3.0, 3.2]})
    m = merge(a, b)
    assert m["warm_min"] == {"q1": 1.2, "q2": 1.0}
    assert m["warm_passes"]["q1"] == [2.0, 1.8, 1.2, 1.4]
    # union spread exposes cross-run drift (q2 ran 3x slower in run B)
    assert m["warm_spread_max_over_min"]["q2"] == 3.2
    assert m["n_warm_passes"] == 4
    # cold comes from run A verbatim — never averaged across box states
    assert m["cold_queries"] == {"q1": 5.0}
    assert m["runs"]["a"]["warm_total"] == a["warm_total"]


def test_merge_tracks_single_run_queries():
    a = _run({"q1": [2.0]})
    b = _run({"q1": [1.5], "new_q": [0.9]})
    m = merge(a, b)
    assert m["runs"]["only_in_one"] == ["new_q"]
    assert m["warm_min"]["new_q"] == 0.9
