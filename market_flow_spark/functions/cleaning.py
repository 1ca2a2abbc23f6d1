"""String-cleaning / typing scalar functions (SURVEY.md §2.8 F1-F5, F9).

All are thin Column expressions over pyspark.sql.functions builtins, so they
stay inside whole-stage codegen — no Python UDFs in the cleaning path.

Reference anchors:
- country-name remap + punctuation strip: dbt/models/staging/stg_countries.sql:4-13,22-31
- currency remap: dbt/models/staging/stg_currencies.sql:4-8
- guarded cast (empty string → NULL): dbt/models/staging/stg_cleaned_units.sql:23-25
- normalized join keys LOWER(TRIM(..)): dbt/models/staging/stg_localities.sql:31-33
- ASCII strip: utils/csv_utils.py:23-24
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Country-name remaps the reference hardcodes (stg_countries.sql:4-13).
COUNTRY_REMAP: dict[str, str] = {
    "Iran (Islamic Republic of)": "Iran",
    "State of Palestine": "Palestine",
    "Bolivia (Plurinational State of)": "Bolivia",
    "Venezuela (Bolivarian Republic of)": "Venezuela",
}

# Currency-name remaps (stg_currencies.sql:4-8).
CURRENCY_REMAP: dict[str, str] = {
    "Somaliland Shilling": "SOS",
}


def _remap(col: Column, mapping: dict[str, str]) -> Column:
    out = None
    for src, dst in mapping.items():
        cond = col == F.lit(src)
        out = F.when(cond, F.lit(dst)) if out is None else out.when(cond, F.lit(dst))
    return out.otherwise(col) if out is not None else col


def normalize_country_name(col: Column) -> Column:
    """Remap ladder + strip non-alphanumeric-or-space chars + collapse
    whitespace + trim (stg_countries.sql:4-13,22-31)."""
    c = _remap(col, COUNTRY_REMAP)
    c = F.regexp_replace(c, r"[^a-zA-Z0-9 ]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalize_currency_code(col: Column) -> Column:
    return _remap(col, CURRENCY_REMAP)


def normalize_key(col: Column) -> Column:
    """LOWER(TRIM(x)) join-key normalization (stg_localities.sql:31-33, J7)."""
    return F.lower(F.trim(col))


def ascii_strip(col: Column) -> Column:
    """Drop non-ASCII bytes from a string column (utils/csv_utils.py:23-24,
    F9) — `str.encode('ascii', 'ignore')` re-expressed as a codegen regex."""
    return F.regexp_replace(col, r"[^\x00-\x7F]", "")


def guarded_cast(col: Column, dtype: str) -> Column:
    """Cast with the reference's empty-string guard
    (stg_cleaned_units.sql:23-25): '' → NULL instead of a cast error.
    Spark's cast already yields NULL on malformed input (vs DuckDB raising),
    so the guard doubles as documentation of that dialect gap
    (SURVEY.md §7.4 item 4)."""
    trimmed = F.trim(col)
    return F.when(trimmed != "", trimmed.cast(dtype)).otherwise(F.lit(None).cast(dtype))
