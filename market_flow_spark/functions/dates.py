"""Date scalar functions (SURVEY.md §2.8 F6, F10, F12).

Reference anchors:
- constructed_date (first of month from year+month):
  dags/prophet/dag_prophet_output.py:26
- start/end-of-month math: utils/date_utils.py:4-15
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def constructed_date(year: Column, month: Column) -> Column:
    """First-of-month DATE from integer year+month — `make_date` replaces the
    reference's string concat+LPAD+CAST idiom (F6)."""
    return F.make_date(year, month, F.lit(1))


def year_month_cols(ts: Column) -> tuple[Column, Column]:
    """(year, month) int columns from a date/timestamp column."""
    return F.year(ts), F.month(ts)


def start_of_month(d: Column) -> Column:
    return F.trunc(d, "month")


def end_of_month(d: Column) -> Column:
    return F.last_day(d)
