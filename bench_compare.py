#!/usr/bin/env python
"""Attribution-grade comparison of two bench_detail.json files.

    python bench_compare.py OLD.json NEW.json [abs_floor_sec] [--basis min]

``--basis min`` compares each file's ``warm_min`` column when present
(falling back to ``warm_queries``). Use it for any comparison that spans
the round-6 basis change: r1-r5 ``warm_queries`` was min-of-2 passes,
r6+ is median-of-5 with the min kept in ``warm_min`` — so min-to-min is
the only like-for-like cross-era column.

A per-query move only counts as REAL if it clears BOTH gates:

- magnitude: the median ratio (slower or faster) exceeds the noise bar,
  which is the larger of the two runs' own measured max/min pass spreads
  times a 1.15 safety margin — i.e. the run's internal variance is used
  as its own control, per the round-5 verdict's "stop flying blind";
- materiality: the absolute delta exceeds ``abs_floor_sec`` (default
  0.3 s), so sub-second jitter on cheap queries never pages anyone.

Prints flagged regressions/improvements plus total movement, and exits
non-zero when any regression is flagged — usable as a CI tripwire:

    python bench_compare.py bench_detail_prev.json bench_detail.json
"""

from __future__ import annotations

import json
import sys

MARGIN = 1.15


def compare(old: dict, new: dict, abs_floor: float = 0.3, basis: str = "median") -> dict:
    if basis == "min":
        ow = old.get("warm_min") or old["warm_queries"]
        nw = new.get("warm_min") or new["warm_queries"]
    else:
        ow, nw = old["warm_queries"], new["warm_queries"]
    osp = old.get("warm_spread_max_over_min", {})
    nsp = new.get("warm_spread_max_over_min", {})
    shared = sorted(set(ow) & set(nw))
    regressions, improvements = [], []
    for name in shared:
        o, n = ow[name], nw[name]
        if o <= 0 or n <= 0:
            continue
        bar = max(osp.get(name, 1.0), nsp.get(name, 1.0)) * MARGIN
        ratio = n / o
        entry = {
            "query": name,
            "old": o,
            "new": n,
            "ratio": round(ratio, 2),
            "noise_bar": round(bar, 2),
        }
        if abs(n - o) < abs_floor:
            continue
        if ratio > bar:
            regressions.append(entry)
        elif 1.0 / ratio > bar:
            improvements.append(entry)
    regressions.sort(key=lambda e: -e["ratio"])
    improvements.sort(key=lambda e: e["ratio"])
    return {
        "old_total": old.get("warm_total"),
        "new_total": new.get("warm_total"),
        "n_shared": len(shared),
        "added": sorted(set(nw) - set(ow)),
        "removed": sorted(set(ow) - set(nw)),
        "regressions": regressions,
        "improvements": improvements,
    }


def main() -> int:
    argv = list(sys.argv[1:])
    basis = "median"
    if "--basis" in argv:
        i = argv.index("--basis")
        if i + 1 >= len(argv) or argv[i + 1] not in ("median", "min"):
            print(__doc__)
            print("--basis must be 'median' or 'min'")
            return 2
        basis = argv[i + 1]
        del argv[i : i + 2]
    if len(argv) < 2:
        print(__doc__)
        return 2
    with open(argv[0]) as f:
        old = json.load(f)
    with open(argv[1]) as f:
        new = json.load(f)
    abs_floor = float(argv[2]) if len(argv) > 2 else 0.3
    r = compare(old, new, abs_floor, basis)
    print(
        f"warm_total {r['old_total']} -> {r['new_total']}  "
        f"({r['n_shared']} shared queries; "
        f"+{len(r['added'])} added, -{len(r['removed'])} removed)"
    )
    for kind in ("regressions", "improvements"):
        rows = r[kind]
        print(f"{kind}: {len(rows)}")
        for e in rows:
            print(
                f"  {e['query']:32s} {e['old']:7.2f} -> {e['new']:7.2f}  "
                f"x{e['ratio']:<5} (noise bar x{e['noise_bar']})"
            )
    return 1 if r["regressions"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
