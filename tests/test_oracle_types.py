"""Registry-wide oracle OUTPUT-TYPE sweep.

The driver's correctness hash is typed: a DuckDB HUGEINT (128-bit SUM
result) reaches pandas as float64 while the Spark side emits bigint, so the
hash diverges even when every value is identical (round-6 verdict: four
in-window reds, zero value diffs). DuckDB binds relation types without
executing, so this sweep over all registered oracles is near-free and runs
on every suite invocation — no oracle may ever again publish a wide-int
column.
"""

from __future__ import annotations

from market_flow_spark.queries_all import ORACLES

# Types whose pandas round-trip differs from what the Spark side emits:
# wide ints reach fetchdf as float64 (vs Spark bigint) and DECIMAL reaches
# it as float64-or-object depending on precision (vs Spark double) — both
# break the driver's typed hash even with identical values. No oracle may
# publish them; cast to BIGINT / DOUBLE at the source.
_FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


def test_no_oracle_emits_wide_ints(duck):
    offenders = {}
    for name, sql in sorted(ORACLES.items()):
        rel = duck.sql(sql)
        wide = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(f in str(t).upper() for f in _FORBIDDEN)
        ]
        if wide:
            offenders[name] = wide
    assert not offenders, (
        f"oracles emitting HUGEINT columns (wrap the SUM in CAST(... AS "
        f"BIGINT), cf. round-6 verdict): {offenders}"
    )
