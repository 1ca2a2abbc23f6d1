"""Sinks (SURVEY.md §2.1 S8-S9).

The reference hands results to its app layer via single-file CSV exports
(dag_prophet_output.py:49-58) and protects imputation rewrites with a
backup-then-replace (impute_missing_currencies.py:31-52). Parquet is the
default interchange here; CSV export is kept for edge compatibility.

Scale note: ``coalesce(1)`` exists only because the reference's contract is
"one CSV file" — it serializes the final write through one task. The
parquet sinks keep full parallelism and are what anything downstream
should read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """S8: CSV export with header; single_file reproduces the reference's
    one-file handoff (driver-side bottleneck — test/edge scale only)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def export_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Parquet layer sink; partition columns enable partition pruning for
    downstream readers (e.g. (year, month) on fact exports)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
