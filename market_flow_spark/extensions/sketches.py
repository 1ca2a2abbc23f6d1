"""Distinct-count sketching (north-star extension).

The reference has no approximate aggregates (SURVEY.md §2.4 "absent:
approx distinct"); at 100 TB they become mandatory. Spark's builtin
``approx_count_distinct`` (HLL++) is the production default, but its register
layout is engine-specific, so it can never be oracle-checked against DuckDB.
This module adds a **KMV (k-minimum-values) sketch** built from pure
relational algebra + md5 — bit-identical on any engine, so the driver's
DuckDB oracle can verify it exactly:

- h(v) = (first 8 md5 hex chars as uint32 + 1) / 2^32  — uniform in (0, 1]
- keep the k smallest *distinct* hash values
- estimate = (k-1) / h_(k)   (exact count when fewer than k seen)

Scale path: the distinct-hash aggregate does map-side partial dedup, and the
k-smallest selection plans as TakeOrdered (per-partition heaps + driver
merge of k·P values, no global sort). Merging per-partition KMV sets is how
the sketch distributes on a 1000-executor job — same union-then-take-k
algebra Catalyst already produces here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 256


def kmv_hash(col: Column) -> Column:
    """Uniform (0, 1] hash from the md5 hex prefix — identical arithmetic in
    Spark (`conv(.., 16, 10)`) and DuckDB (`CAST('0x..' AS UBIGINT)`)."""
    raw = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
    return (raw.cast("double") + F.lit(1.0)) / F.lit(float(2**32))


def kmv_distinct(df: DataFrame, column: str, k: int = DEFAULT_K) -> DataFrame:
    """One-row DataFrame: (est_distinct bigint) — KMV estimate of
    COUNT(DISTINCT column)."""
    smallest = (
        df.filter(F.col(column).isNotNull())
        .select(kmv_hash(F.col(column)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    est = (
        F.when(F.count("h") < k, F.count("h"))
        .otherwise(F.floor((F.lit(float(k - 1)) / F.max("h")) + F.lit(0.5)))
        .cast("bigint")
    )
    return smallest.agg(est.alias("est_distinct"))


def kmv_oracle_sql(table: str, column: str, k: int = DEFAULT_K) -> str:
    """DuckDB SQL computing the identical estimate."""
    return f"""
WITH h AS (
  SELECT DISTINCT
    (CAST(('0x' || substr(md5(CAST({column} AS VARCHAR)), 1, 8)) AS UBIGINT)
     + 1.0) / 4294967296.0 AS h
  FROM {table} WHERE {column} IS NOT NULL
),
kth AS (SELECT h FROM h ORDER BY h LIMIT {k})
SELECT CAST(CASE WHEN COUNT(h) < {k} THEN COUNT(h)
            ELSE FLOOR(({k} - 1.0) / MAX(h) + 0.5) END AS BIGINT)
       AS est_distinct
FROM kth
"""
