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


def temperature_mixture_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-weighted domain mixture sampling — the multilingual /
    multi-domain rebalancing rule (sampling share of domain d ∝ n_d^alpha,
    the exponent every large-model data recipe tunes: alpha=1 keeps natural
    proportions, alpha→0 flattens toward uniform across domains).

    Per-domain keep rate: with Z = Σ_d n_d^alpha and N = Σ_d n_d,
      rate_d = min(1, target_frac · N · n_d^alpha / (Z · n_d))
    so the expected output size is ≤ target_frac·N and domain shares follow
    the tempered distribution (exactly, until small domains saturate at
    rate 1 — the standard behavior).

    The draw is content-addressed (md5 of salt:key mapped to a uniform in
    [0,1)), so membership is a pure row function given the domain-count
    table: reproducible across runs, engines, and partitionings. Plan
    shape: one tiny domain-count aggregate broadcast back onto the scan —
    no corpus-sized shuffle. The per-row uniform and rate ride on the
    output (`mix_u` exact-integer, `mix_rate` deterministically rounded)
    so samples are auditable.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n_d"))
    totals = counts.agg(
        F.sum("__n_d").alias("__n_total"),
        F.sum(F.pow(F.col("__n_d").cast("double"), F.lit(alpha))).alias("__z"),
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(target_frac)
        * F.col("__n_total")
        * F.pow(F.col("__n_d").cast("double"), F.lit(alpha))
        / (F.col("__z") * F.col("__n_d")),
    )
    # floor-round the rate before comparing so the cut line is the same
    # double on every engine (pow/accumulation may differ in final ulps)
    rate_r = F.floor(rate * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    u_int = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.join(F.broadcast(counts), stratum_col)
        .crossJoin(F.broadcast(totals))
        .withColumn("mix_u", u_int)
        .withColumn("mix_rate", rate_r)
        .filter(F.col("mix_u") < F.col("mix_rate") * F.lit(float(HEX_SPACE)))
        .drop("__n_d", "__n_total", "__z")
    )


def temperature_mixture_oracle_sql(
    table: str,
    stratum_col: str,
    key_col: str,
    select_cols: list[str],
    alpha: float = 0.5,
    target_frac: float = 0.5,
    salt: str = "mix",
) -> str:
    """DuckDB twin of :func:`temperature_mixture_sample`: identical md5
    uniform (hex prefix parsed via the 0x cast), identical tempered-rate
    formula with the same pre-compare floor-rounding."""
    cols = ", ".join(select_cols)
    return f"""
WITH counts AS (
  SELECT {stratum_col}, COUNT(*) AS n_d FROM {table} GROUP BY {stratum_col}
), totals AS (
  SELECT SUM(n_d) AS n_total, SUM(pow(CAST(n_d AS DOUBLE), {alpha})) AS z
  FROM counts
), rated AS (
  SELECT t.*,
         CAST(CAST('0x' || substring(md5('{salt}:' || CAST(t.{key_col} AS VARCHAR)), 1, 8) AS BIGINT) AS BIGINT) AS mix_u,
         FLOOR(LEAST(1.0,
           {target_frac} * totals.n_total
             * pow(CAST(counts.n_d AS DOUBLE), {alpha})
             / (totals.z * counts.n_d)) * 1000000.0 + 0.5) / 1000000.0 AS mix_rate
  FROM {table} t
  JOIN counts USING ({stratum_col})
  CROSS JOIN totals
)
SELECT {cols}, mix_u, mix_rate
FROM rated
WHERE mix_u < mix_rate * {float(16**8)}
"""


def assign_kfold(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    salt: str = "kfold",
    out_col: str = "fold",
) -> DataFrame:
    """Tag each row with a fold id in [0, k) as a pure function of its key
    — content-addressed cross-validation folds with the same append-
    stability guarantee as :func:`assign_split` (new rows never move old
    rows between folds; every (train, holdout) rotation is reproducible
    from the data alone). One map-only projection."""
    bucket = F.conv(hash_bucket(F.col(key_col), salt), 16, 10).cast("bigint")
    return df.withColumn(
        out_col, F.pmod(bucket, F.lit(int(k))).cast("int")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the ``n`` rows
    per group with the largest exponential keys u^(1/w) — Efraimidis-
    Spirakis A-Res, with the uniform u drawn content-addressed from the
    row key (md5), so the sample is a pure function of the data. Rows
    with NULL or non-positive weight are excluded (zero mass).

    Ranks order by ln(u)/w DESCENDING (monotone in u^(1/w), numerically
    safer), ties broken by the key for a total order. One window shuffle
    on the group key; for a group holding half the corpus compose with
    the two-level subsplit trick of ``cap_per_group`` — at the usual
    "n per domain" scale the plain window is the right plan."""
    u = (
        F.conv(hash_bucket(F.col(key_col), salt), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(HEX_SPACE))  # uniform in (0, 1]
    es_key = F.log(u) / F.col(weight_col).cast("double")
    filtered = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__es", es_key)
    w = Window.partitionBy(group_col).orderBy(
        F.col("__es").desc(), F.col(key_col).asc()
    )
    return (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(n))
        .drop("__es", "__rn")
    )


def weighted_sample_oracle_sql(
    table: str,
    group_col: str,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsample",
) -> str:
    """DuckDB twin of :func:`weighted_sample_per_group` (same md5 uniform,
    same ln(u)/w ranking)."""
    u = (
        f"((CAST(('0x' || substr(md5('{salt}:' || CAST({key_col} AS VARCHAR)),"
        f" 1, 8)) AS UBIGINT) + 1.0) / {float(16**8)})"
    )
    return f"""
WITH s AS (
  SELECT *, ln({u}) / CAST({weight_col} AS DOUBLE) AS es
  FROM {table}
  WHERE {weight_col} IS NOT NULL AND {weight_col} > 0
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {group_col} ORDER BY es DESC, {key_col} ASC) AS rn
  FROM s
)
SELECT * EXCLUDE (es, rn) FROM r WHERE rn <= {n}
"""
