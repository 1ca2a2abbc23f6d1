"""Merge two bench_detail runs into one min-basis record.

    python bench_merge.py RUN_A.json RUN_B.json OUT.json

The repo's evidence standard is min-of-2-with-recorded-spread for every
headline number. The bench itself takes N warm passes per query within a
run, but a single run shares one box state (page cache, JIT, cgroup
pressure); two FULL runs are the control for that. This tool concatenates
the per-query ``warm_passes`` across the two runs and recomputes:

- ``warm_queries``  — median over the union of passes,
- ``warm_min``      — min over the union (the like-for-like basis),
- ``warm_spread_max_over_min`` — the union spread, so cross-run drift is
  visible per query instead of hiding in the better run,
- totals over the recomputed columns,

and keeps ``cold_queries``/``construct_queries`` from run A alone (cold is
only cold once per box state; averaging a true cold with a page-cache-warm
"cold" would fabricate a number nobody measured). Queries present in only
one run (e.g. added between runs) carry that run's passes, and are listed
in ``runs.only_in_one`` so single-run rows are never mistaken for merged
ones. Non-query sections (fixtures, streaming, plan metrics) are taken
from run A verbatim and the per-run headline summaries are preserved under
``runs`` for attribution.
"""

from __future__ import annotations

import json
import sys


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return round(s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2, 3)


def merge(a: dict, b: dict) -> dict:
    pa, pb = a["warm_passes"], b["warm_passes"]
    names = sorted(set(pa) | set(pb))
    passes = {n: list(pa.get(n, [])) + list(pb.get(n, [])) for n in names}
    warm = {n: _median(ps) for n, ps in passes.items()}
    warm_min = {n: min(ps) for n, ps in passes.items()}
    spread = {
        n: round(max(ps) / max(min(ps), 1e-9), 2) for n, ps in passes.items()
    }
    out = dict(a)  # run A's non-query sections carry over verbatim
    out.update(
        {
            "warm_passes": passes,
            "warm_queries": warm,
            "warm_min": warm_min,
            "warm_spread_max_over_min": spread,
            "warm_total": round(sum(warm.values()), 3),
            "warm_total_min": round(sum(warm_min.values()), 3),
            "n_warm_passes": a.get("n_warm_passes", 0)
            + b.get("n_warm_passes", 0),
            "runs": {
                "basis": "per-query warm_passes concatenated across 2 runs",
                "only_in_one": sorted(set(pa) ^ set(pb)),
                "a": {
                    "warm_total": a.get("warm_total"),
                    "warm_total_min": a.get("warm_total_min"),
                    "cold_total": a.get("cold_total"),
                    "n_warm_passes": a.get("n_warm_passes"),
                },
                "b": {
                    "warm_total": b.get("warm_total"),
                    "warm_total_min": b.get("warm_total_min"),
                    "cold_total": b.get("cold_total"),
                    "n_warm_passes": b.get("n_warm_passes"),
                },
            },
        }
    )
    return out


def main() -> None:
    a_path, b_path, out_path = sys.argv[1:4]
    with open(a_path) as fa, open(b_path) as fb:
        a, b = json.load(fa), json.load(fb)
    merged = merge(a, b)
    with open(out_path, "w") as fo:
        json.dump(merged, fo, indent=1)
    print(
        json.dumps(
            {
                "merged": out_path,
                "queries": len(merged["warm_queries"]),
                "warm_total": merged["warm_total"],
                "warm_total_min": merged["warm_total_min"],
                "only_in_one": merged["runs"]["only_in_one"],
            }
        )
    )


if __name__ == "__main__":
    main()
