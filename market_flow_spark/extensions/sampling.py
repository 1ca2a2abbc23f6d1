"""Deterministic sampling / splitting / quota operators for training-data
pipelines (north-star extensions; no counterpart in the reference, whose
only row selection is predicate filtering — server/data_loader.py:13-16).

All randomness is content-addressed: a row's fate is a pure function of its
key (md5 over a salted key string), so samples are reproducible across
runs, engines, partition layouts, and cluster sizes — the property a
100 TB dataset build needs to be resumable and auditable. A fixed-width
lowercase-hex prefix compared lexicographically equals comparing its
integer value, and Spark and DuckDB produce identical md5 hex, so every
operator here is exactly oracle-checkable.

Scale shape:
- `sample_by_rate` / `assign_split` are pure per-row projections/filters —
  scan-local, no shuffle, survive any repartitioning.
- `cap_per_group` shuffles once by group. A pathologically skewed group
  (one domain = half the corpus) serializes into one task's window; for
  that shape, pre-filter with an over-admitting hash threshold (admit
  ~2× quota's expected share) before the exact window so the heavy group
  shrinks before it shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX_SPACE = 16**8  # the 8-hex-digit prefix is uniform over [0, 2^32)


def hash_bucket(key: Column, salt: str) -> Column:
    """First 8 hex digits of md5('<salt>:<key>') — a deterministic uniform
    draw in [0, 2^32), represented as text so engines compare identically."""
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8
    )


def hash_bucket_sql(key_expr: str, salt: str) -> str:
    """The DuckDB-identical SQL text of :func:`hash_bucket`."""
    return f"substring(md5('{salt}:' || CAST({key_expr} AS VARCHAR)), 1, 8)"


def rate_threshold(rate: float) -> str:
    """Hex threshold admitting ~`rate` of keys via `bucket < threshold`.
    'z' sorts after every hex digit, so rate >= 1 admits all rows."""
    if rate >= 1.0:
        return "zzzzzzzz"
    return format(max(int(rate * HEX_SPACE), 0), "08x")


def sample_by_rate(
    df: DataFrame,
    key_col: str,
    rate: float | dict[str, float],
    stratum_col: str | None = None,
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic, content-addressed fraction of rows.

    `rate` may be a single float, or a per-stratum dict (keyed by
    `stratum_col` values) with `default_rate` for unlisted strata — the
    class-rebalancing shape (downsample over-represented languages /
    domains) every corpus build needs.
    """
    bucket = hash_bucket(F.col(key_col), salt)
    if isinstance(rate, dict):
        if stratum_col is None:
            raise ValueError("stratum_col is required with per-stratum rates")
        thr: Column = F.lit(rate_threshold(default_rate))
        for value, r in sorted(rate.items()):
            thr = F.when(
                F.col(stratum_col) == value, F.lit(rate_threshold(r))
            ).otherwise(thr)
        return df.filter(bucket < thr)
    return df.filter(bucket < F.lit(rate_threshold(rate)))


def assign_split(
    df: DataFrame,
    key_col: str,
    train_frac: float = 0.8,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Tag each row 'train' or 'test' as a pure function of its key: stable
    under re-runs and appends (new rows never flip old rows' split —
    unlike randomSplit, whose assignment depends on partition layout)."""
    bucket = hash_bucket(F.col(key_col), salt)
    return df.withColumn(
        out_col,
        F.when(bucket < F.lit(rate_threshold(train_frac)), F.lit("train")).otherwise(
            F.lit("test")
        ),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    quota: int,
    key_col: str,
    salt: str = "quota",
    rank_col: str = "pick_rank",
) -> DataFrame:
    """Keep at most `quota` rows per group, selected by hash order — a
    deterministic uniform draw without replacement (domain quotas, per-site
    caps). The hash orders candidates; the key breaks the (vanishingly
    rare) hash ties so the cut line is total-ordered."""
    order = [hash_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= quota)
    )
