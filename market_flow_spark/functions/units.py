"""Unit-name parsing and unit→kg conversion (SURVEY.md §2.8 F1-F4).

Reproduces dbt/models/staging/stg_cleaned_units.sql:5-51 semantics:
  '90 KG'  → unit_value='90',  unit_type='kg', value_in_kg=90.0
  '500 G'  → value_in_kg=0.5          (/1000)
  '10 lbs' → value_in_kg=4.53592      (*0.453592)
  '1 MT'   → value_in_kg=1000.0       (*1000)
  '750 ML' → value_in_kg=0.00075      (/1e6, reference treats ml≈g of water)
  '2 L'    → value_in_kg=0.002        (/1000)
  bare 'KG'/'MT'/'Pound' → fallback factor with implied value 1
  'Unit'/'Dozen'/'Head'  → NULL (unconvertible; price_per_kg falls back,
                                 stg_transactions.sql:52-56)

Conversion factors ported verbatim per SURVEY.md F4. Pure Column
expressions — regexp_extract/regexp_replace/when stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LB_TO_KG = 0.453592

# bare unit name (already lower/trimmed) → kg per 1 unit
UNIT_TO_KG_BARE: dict[str, float] = {
    "kg": 1.0,
    "mt": 1000.0,
    "pound": LB_TO_KG,
    "lb": LB_TO_KG,
    "lbs": LB_TO_KG,
    "g": 0.001,
    "l": 0.001,
    "ml": 0.000001,
}


def unit_value_expr(unit_name: Column) -> Column:
    """Leading numeric of the unit name, F1: regexp_extract '^([0-9.]+)'
    (stg_cleaned_units.sql:9). Empty string when absent (bare unit names)."""
    return F.regexp_extract(F.trim(unit_name), r"^([0-9\.]+)", 1)


def unit_type_expr(unit_name: Column) -> Column:
    """Unit name with the leading number stripped, lowercased/trimmed, F2-F3
    (stg_cleaned_units.sql:10,27)."""
    return F.lower(F.trim(F.regexp_replace(F.trim(unit_name), r"^[0-9\.]+", "")))


def value_in_kg(unit_value: Column, unit_type: Column) -> Column:
    """Unit→kg CASE table, F4 (stg_cleaned_units.sql:23-44).

    When unit_value is empty (bare name) the implied quantity is 1; unknown
    unit types yield NULL.
    """
    qty = F.when(unit_value != "", unit_value.cast("double")).otherwise(F.lit(1.0))
    expr = None
    for name, factor in UNIT_TO_KG_BARE.items():
        cond = unit_type == F.lit(name)
        branch = qty * F.lit(factor)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return expr.otherwise(F.lit(None).cast("double"))


def parse_unit_name(unit_name: Column) -> tuple[Column, Column, Column]:
    """(unit_value, unit_type, value_in_kg) triple from a raw unit string."""
    uv = unit_value_expr(unit_name)
    ut = unit_type_expr(unit_name)
    return uv, ut, value_in_kg(uv, ut)


def price_per_kg(price: Column, kg: Column) -> Column:
    """price / value_in_kg with the reference's NULL guard: when the unit is
    unconvertible the per-kg price falls back to the raw price
    (stg_transactions.sql:52-56, F7)."""
    return F.when(kg.isNotNull() & (kg != 0), price / kg).otherwise(price)
