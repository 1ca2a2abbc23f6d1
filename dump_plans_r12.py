#!/usr/bin/env python
"""Dump .explain('formatted') for named queries into plans/r12/.

Usage: python dump_plans_r12.py <suffix> <out_dir> <query> [query ...]

Run from the repo whose plans you want (the round-12 optimization runs it
once in a baseline worktree with suffix 'before' and once at HEAD with
suffix 'after'); out_dir is always the main repo's plans/r12."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from market_flow_spark.queries_all import QUERIES  # noqa: E402
from market_flow_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix, out_dir = sys.argv[1], Path(sys.argv[2])
    names = sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name=f"plans-r12-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
