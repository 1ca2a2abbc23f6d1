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
