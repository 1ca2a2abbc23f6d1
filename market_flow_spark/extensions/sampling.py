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
- `cap_per_group` is skew-safe by default: a two-level window first takes
  each (group, hash-subsplit)'s local top-quota — spreading a
  pathologically skewed group (one domain = half the corpus) across
  `subsplits` tasks — then runs the exact window over the ≤
  subsplits×quota survivors per group. The global top-quota by hash order
  is contained in the union of per-subsplit top-quotas, so the result is
  IDENTICAL to the naive single-window path, while the by-group shuffle
  shrinks from corpus-sized to quota-bounded.
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
    skew_safe: bool = True,
    subsplits: int = 32,
) -> DataFrame:
    """Keep at most `quota` rows per group, selected by hash order — a
    deterministic uniform draw without replacement (domain quotas, per-site
    caps). The hash orders candidates; the key breaks the (vanishingly
    rare) hash ties so the cut line is total-ordered.

    ``skew_safe`` (default) runs the exact two-level reduction: rows first
    shuffle by (group, key-hash mod subsplits) and each subsplit keeps its
    local top-quota, so a hot group occupies `subsplits` tasks instead of
    serializing into one window; the final by-group window then sees at
    most subsplits×quota rows per group. Because the global top-quota under
    a total order is contained in the union of the per-subsplit top-quotas,
    the output is identical to the naive path row for row."""
    order = [hash_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    if skew_safe:
        sub = F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(subsplits))
        w1 = Window.partitionBy(F.col(group_col), sub).orderBy(*order)
        df = (
            df.withColumn("_sub_rank", F.row_number().over(w1))
            .filter(F.col("_sub_rank") <= quota)
            .drop("_sub_rank")
        )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= quota)
    )
