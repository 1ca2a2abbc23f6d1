"""Incremental / upsert patterns (SURVEY.md §2.3 J9-J10, §2.1 S9-S10).

The reference's "fetch only what's missing" and keyed-upsert idioms,
re-expressed as anti-joins and overwrite writes. These are *semantic*
operators (Catalyst can't infer them), kept explicit per SURVEY §4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_keys(universe: DataFrame, existing: DataFrame, on: list[str]) -> DataFrame:
    """J9/J10: keys present in the universe but absent from the existing
    table (NOT EXISTS / LEFT JOIN...IS NULL → one left_anti join).

    Reference: dags/raw/fetch_currencies.py:44-65,
    fetch_coordinates_and_weather.py:113-121,358-383.
    """
    return universe.join(existing, on=on, how="left_anti")


def upsert(existing: DataFrame, incoming: DataFrame, on: list[str]) -> DataFrame:
    """S10: keyed upsert as a pure transform — incoming rows win, existing
    rows without a matching key survive (insert-where-not-exists + update,
    fetch_coordinates_and_weather.py:201-237).

    existing-anti-incoming ∪ incoming. At scale: both sides shuffle once on
    the key; with Delta/Iceberg this becomes MERGE INTO, but the plan shape
    is the same.
    """
    keep = existing.join(incoming, on=on, how="left_anti")
    return keep.unionByName(incoming)


def backup_then_replace(
    spark_table: str, new_df: DataFrame, backup_suffix: str = "_backup"
) -> None:
    """S9: CREATE TABLE t_backup AS SELECT * FROM t → overwrite t
    (impute_missing_currencies.py:31-52). Side-effecting catalog op."""
    spark = new_df.sparkSession
    if spark.catalog.tableExists(spark_table):
        spark.table(spark_table).write.mode("overwrite").saveAsTable(
            spark_table + backup_suffix
        )
    new_df.write.mode("overwrite").saveAsTable(spark_table)


def merge_aggregate(
    agg: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental aggregate maintenance: fold a delta batch's partial
    aggregates into an existing (keys, sums, count) aggregate table
    WITHOUT re-scanning history — the update step of a sum/count
    materialized view (means derive as sum/count downstream).

    new = full-outer on keys, coalesced sums added. One shuffle on the
    keys over |agg| + |delta| rows; at 100 TB the aggregate table is
    orders of magnitude smaller than the fact history this replaces
    re-aggregating. Only works for algebraic aggregates (sum, count, min,
    max — here sums + count); holistic ones (exact distinct, median) need
    the sketch tier (see extensions.sketches) or a re-scan."""
    d = delta.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).alias(count_col),
    )
    a = agg.alias("a")
    dd = d.alias("d")
    merged = a.join(dd, on=keys, how="full_outer")
    out_cols = [
        (
            F.coalesce(F.col(f"a.{c}"), F.lit(0))
            + F.coalesce(F.col(f"d.{c}"), F.lit(0))
        ).alias(c)
        for c in [*sum_cols, count_col]
    ]
    return merged.select(*keys, *out_cols)
