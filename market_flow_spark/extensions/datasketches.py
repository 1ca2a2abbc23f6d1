"""Native Datasketches layer (north-star extension).

The reference has no approximate aggregates at all (SURVEY.md §2.4
"absent: approx distinct"); `sketches.py` adds the oracle-exact KMV
estimator. This module adds the PRODUCTION sketch layer on top: Spark
4's built-in Apache DataSketches functions (theta / HLL / KLL), whose
binary sketches are **mergeable** — the property that makes them the
100 TB answer. Build sketches ONCE at the finest grain, persist the
tiny sketch table, and answer every coarser-grain question by merging
sketches — no re-scan of the raw 100 TB, ever.

Why three sketch families (same split DataSketches itself documents):

- **theta**: distinct counts AND full set algebra (union / intersection
  / difference — HLL cannot intersect). Below its nominal-entry count
  (2^lgk) a theta sketch is in *exact mode* (it retains every hash, and
  `theta_sketch_estimate` returns the exact distinct count) — which is
  what lets the driver hash-check the rollup/overlap queries against
  exact DuckDB COUNT(DISTINCT) oracles at sf0.01 while the SAME plan
  degrades gracefully to ±1.6% estimates at 100 TB.
- **HLL**: smallest sketches for pure distinct counting; merge (per-
  register max) is deterministic and lossless, so "merge of fine-grain
  sketches" ≡ "direct sketch of coarse grain" EXACTLY — pinned by
  `tests/test_datasketches.py` as a self-consistency oracle that needs
  no external engine.
- **KLL**: mergeable quantiles (median / p99 without a global sort).

All sketch construction is a single groupBy aggregate (map-side partial
sketches per partition, merged in the reduce — the same two-phase shape
Spark gives any aggregate), so each operator is one shuffle of
sketch-sized rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^12 = 4096 nominal entries: exact below that, ±1.6% above. Raise lgk
# when the driver-checked grain's cardinality approaches it.
DEFAULT_LGK = 12


# ---------------------------------------------------------------------------
# Theta: distinct-count rollup + set algebra
# ---------------------------------------------------------------------------


def theta_sketch_table(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = DEFAULT_LGK
) -> DataFrame:
    """The persistable fine-grain sketch table: one theta sketch of
    ``value_col``'s distinct values per ``group_cols`` cell. At 100 TB
    this is the only pass over the raw data; everything below merges
    these rows."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col, lgk).alias("sk")
    )


def theta_distinct_rollup(
    df: DataFrame, group_col: str, value_col: str, lgk: int = DEFAULT_LGK
) -> DataFrame:
    """Per-group distinct counts PLUS the grand total, where the total row
    is computed by UNION-MERGING the per-group sketches — never by
    re-scanning the input (the sketch-cube pattern: the second grain is
    answered from the first grain's sketch table).

    Columns: (group_col, est_distinct, is_total). Estimates are exact
    while per-sketch cardinality stays under 2^lgk, so the registered
    query is hash-checked against DuckDB's exact GROUPING SETS oracle."""
    sketches = theta_sketch_table(df, [group_col], value_col, lgk)
    per_group = sketches.select(
        F.col(group_col),
        F.theta_sketch_estimate("sk").alias("est_distinct"),
        F.lit(0).alias("is_total"),
    )
    total = sketches.agg(
        F.theta_sketch_estimate(F.theta_union_agg("sk", lgk)).alias("est_distinct")
    ).select(
        F.lit(None).cast(per_group.schema[group_col].dataType).alias(group_col),
        "est_distinct",
        F.lit(1).alias("is_total"),
    )
    return per_group.unionByName(total)


def theta_rollup_oracle_sql(table: str, group_col: str, value_col: str) -> str:
    """Exact DuckDB twin: GROUPING SETS ((g), ()) distinct counts. Valid
    while every sketch stays in exact mode (cardinality < 2^lgk)."""
    return f"""
SELECT {group_col},
       CAST(COUNT(DISTINCT {value_col}) AS BIGINT) AS est_distinct,
       CAST(GROUPING({group_col}) AS INT) AS is_total
FROM {table}
GROUP BY GROUPING SETS (({group_col}), ())
"""


def theta_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Set-operation estimates between two corpora from one sketch per
    side: est_a, est_b, est_union, est_intersection, est_difference
    (A \\ B). The governance question KMV answers with Jaccard algebra,
    done natively — and theta also gives DIFFERENCE, which KMV's
    combinator cannot. Each side collapses to one sketch row before
    anything crosses sides (a 1×1 join at any scale)."""
    sa = df_a.agg(F.theta_sketch_agg(column, lgk).alias("sk_a"))
    sb = df_b.agg(F.theta_sketch_agg(column, lgk).alias("sk_b"))
    return sa.crossJoin(sb).select(
        F.theta_sketch_estimate("sk_a").alias("est_a"),
        F.theta_sketch_estimate("sk_b").alias("est_b"),
        # theta_union takes its own lgk: left at the 4096-entry default
        # it silently TRUNCATES the union of two exact wider sketches
        # back into estimation mode (caught by the r11 sf0.1 deep sweep)
        F.theta_sketch_estimate(
            F.theta_union("sk_a", "sk_b", lgk)
        ).alias("est_union"),
        F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b")).alias(
            "est_intersection"
        ),
        F.theta_sketch_estimate(F.theta_difference("sk_a", "sk_b")).alias(
            "est_difference"
        ),
    )


def theta_overlap_oracle_sql(
    table: str, column: str, pred_a: str, pred_b: str
) -> str:
    """Exact DuckDB set algebra over the same two filtered sides."""
    return f"""
WITH a AS (SELECT DISTINCT {column} AS v FROM {table} WHERE {pred_a}),
     b AS (SELECT DISTINCT {column} AS v FROM {table} WHERE {pred_b})
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS est_a,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS est_b,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM (SELECT v FROM a UNION SELECT v FROM b)) AS est_union,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM (SELECT v FROM a INTERSECT SELECT v FROM b)) AS est_intersection,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM (SELECT v FROM a EXCEPT SELECT v FROM b)) AS est_difference
"""


# ---------------------------------------------------------------------------
# HLL: the sketch cube (build fine, answer coarse by merge)
# ---------------------------------------------------------------------------


def hll_sketch_cube(
    df: DataFrame,
    fine_cols: list[str],
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Fine-grain HLL sketch table — the persisted artifact. One row per
    fine cell, each holding a ~2^lg_config_k-register sketch of the
    cell's distinct ``value_col`` values."""
    return df.groupBy(*fine_cols).agg(
        F.hll_sketch_agg(value_col, lg_config_k).alias("sk")
    )


def hll_rollup_from_cube(cube: DataFrame, coarse_cols: list[str]) -> DataFrame:
    """Answer a coarser grain from the fine-grain cube by union-merging
    sketches — the no-rescan path. HLL merge is per-register max, which
    is deterministic and lossless, so this equals a direct sketch of the
    coarse grain EXACTLY (pinned in tests), and costs a shuffle of
    sketch rows (thousands), not data rows (billions)."""
    grouped = (
        cube.groupBy(*coarse_cols)
        if coarse_cols
        else cube.groupBy(F.lit(1).alias("__all"))
    )
    out = grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct")
    )
    return out if coarse_cols else out.drop("__all")


# ---------------------------------------------------------------------------
# KLL: mergeable quantiles
# ---------------------------------------------------------------------------


def kll_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
    k: int = 4096,
) -> DataFrame:
    """Per-group quantiles via KLL sketches: one aggregate builds a
    mergeable sketch per group (map-side partials, no global sort),
    one projection reads off every requested quantile. Output columns:
    (group_col, n, p<q*100> ...). Rank error is ~1.7/k single-level;
    tests pin the estimates against exact percentiles with tolerance."""
    sk = df.groupBy(group_col).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), k).alias("sk")
    )
    cols = [F.col(group_col), F.kll_sketch_get_n_double("sk").alias("n")]
    for q in quantiles:
        cols.append(
            F.kll_sketch_get_quantile_double("sk", F.lit(float(q))).alias(
                f"p{round(q * 100):02d}"
            )
        )
    return sk.select(*cols)


def kll_merged_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
    k: int = 4096,
) -> DataFrame:
    """Global quantiles obtained by MERGING the per-group sketches —
    proving the two-level path (persist per-group, merge on demand)
    rather than re-aggregating raw rows."""
    # KLL has no union AGGREGATE (only the binary scalar merge), so the
    # per-group sketches — one small binary row per group — fold through
    # F.reduce over a collected array: element 1 seeds, the tail merges in.
    arr = F.collect_list("sk")
    sk = (
        df.groupBy(group_col)
        .agg(F.kll_sketch_agg_double(F.col(value_col).cast("double"), k).alias("sk"))
        .agg(arr.alias("arr"))
        .select(
            F.reduce(
                F.slice(
                    F.col("arr"),
                    F.lit(2),
                    F.greatest(F.size("arr") - 1, F.lit(0)),
                ),
                F.element_at("arr", 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ).alias("sk")
        )
    )
    cols = [F.kll_sketch_get_n_double("sk").alias("n")]
    for q in quantiles:
        cols.append(
            F.kll_sketch_get_quantile_double("sk", F.lit(float(q))).alias(
                f"p{round(q * 100):02d}"
            )
        )
    return sk.select(*cols)
