"""Imputation operators (SURVEY.md §2.4 A11-A13, §2.8 F8).

The reference's three imputation jobs re-expressed Spark-first:

- A11 column-mean fill (Spark ML Imputer in the reference,
  dags/spark/impute_missing_currencies.py:75-89) → aggregate once, broadcast
  the tiny means row, coalesce. No ML stage needed, no pivot.
- A12 time-series ffill/bfill (pandas pivot→ffill→bfill→melt,
  dags/spark/dag_impute_missing_currencies.py:29-46) → two ignorenulls
  window passes per series; the pivot disappears entirely. Scales to any
  number of series (partitionBy) and any length (range-shuffled within key).
- A13 per-group mean substitution (impute_missing_coords.py:31-65) →
  group-mean aggregate broadcast-joined back + coalesce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from market_flow_spark.functions.aggregates import det_avg


def mean_impute(df: DataFrame, cols: list[str], ndigits: int = 2) -> DataFrame:
    """A11: fill NULLs with the column mean (rounded for determinism).

    One global aggregate (a handful of doubles) cross-joined back — the
    broadcast is a single row, so this is shuffle-free on the fact side.
    """
    means = df.agg(*[det_avg(c, ndigits).alias(f"__mean_{c}") for c in cols])
    out = df.crossJoin(F.broadcast(means))
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__mean_{c}")))
    return out.drop(*[f"__mean_{c}" for c in cols])


def ffill_bfill(
    df: DataFrame, partition: str, order: str, value: str
) -> DataFrame:
    """A12: forward-fill then backward-fill a series column per group.

    last(ignorenulls) over an unbounded-preceding frame = pandas ffill;
    first(ignorenulls) over an unbounded-following frame = bfill. The
    reference needed a pivot to columnar form to do this in pandas; windows
    express it directly on the long format.
    """
    w_ff = (
        Window.partitionBy(partition)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bf = (
        Window.partitionBy(partition)
        .orderBy(order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = F.coalesce(
        F.col(value),
        F.last(value, ignorenulls=True).over(w_ff),
        F.first(value, ignorenulls=True).over(w_bf),
    )
    return df.withColumn(value, filled)


def group_mean_impute(
    df: DataFrame, group: str, cols: list[str], ndigits: int = 2
) -> DataFrame:
    """A13: substitute per-group means into NULL rows (country-mean
    coordinates). Group means are dimension-sized → broadcast join back."""
    means = df.groupBy(group).agg(
        *[det_avg(c, ndigits).alias(f"__gmean_{c}") for c in cols]
    )
    out = df.join(F.broadcast(means), on=group, how="left")
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__gmean_{c}")))
    return out.drop(*[f"__gmean_{c}" for c in cols])


def fill_zero(df: DataFrame, cols: list[str]) -> DataFrame:
    """F8: fillna(0) on numeric enrichment columns
    (fetch_coordinates_and_weather.py:307)."""
    return df.na.fill(0, subset=cols)
