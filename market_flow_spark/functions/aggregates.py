"""Order-deterministic aggregate expressions.

Two sources of cross-engine drift make naive ``round(avg(x), 2)`` unusable
for value-hash comparison (and for reproducible results on a real cluster):

1. Float sums depend on partial-aggregation order → the mean itself differs
   in the last ulp between runs/engines. Fixed by summing as DECIMAL (exact,
   associative) and dividing once.
2. ``round`` half-way semantics differ: Spark rounds the double's shortest
   decimal repr (so 18087.795 → .80) while DuckDB rounds the binary value
   (18087.794999... → .79). Fixed by rounding with a pure IEEE formula —
   ``floor(x * 10^n + 0.5) / 10^n`` — which both engines evaluate
   bit-identically on the same input double.

SQL twins are provided for the DuckDB oracle; keep them in sync.
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F

_DECIMAL = "decimal(27,6)"


def det_round(col: Column, ndigits: int = 2) -> Column:
    """floor(x*10^n + 0.5)/10^n — deterministic across engines for the same
    input double (unlike round(), whose tie handling is engine-specific)."""
    scale = float(10**ndigits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def det_round_sql(expr: str, ndigits: int = 2) -> str:
    scale = float(10**ndigits)
    return f"FLOOR(({expr}) * {scale} + 0.5) / {scale}"


def det_avg(col: Column | str, ndigits: int = 2) -> Column:
    """Deterministic rounded mean (nulls ignored, like AVG)."""
    c = F.col(col) if isinstance(col, str) else col
    mean = F.sum(c.cast(_DECIMAL)).cast("double") / F.count(c)
    return det_round(mean, ndigits)


def det_avg_over(col: Column | str, w: WindowSpec, ndigits: int = 2) -> Column:
    """Deterministic rounded mean over a window frame."""
    c = F.col(col) if isinstance(col, str) else col
    mean = F.sum(c.cast(_DECIMAL)).over(w).cast("double") / F.count(c).over(w)
    return det_round(mean, ndigits)


def det_avg_sql(expr: str, ndigits: int = 2) -> str:
    """The DuckDB-side twin of det_avg, as SQL text."""
    mean = (
        f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE) / COUNT({expr})"
    )
    return det_round_sql(mean, ndigits)


def det_avg_over_sql(expr: str, over: str, ndigits: int = 2) -> str:
    """Windowed twin; ``over`` is the full OVER(...) clause text."""
    mean = (
        f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) {over} AS DOUBLE) / "
        f"COUNT({expr}) {over}"
    )
    return det_round_sql(mean, ndigits)
