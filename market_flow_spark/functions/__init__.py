from market_flow_spark.functions.cleaning import (
    ascii_strip,
    guarded_cast,
    normalize_country_name,
    normalize_currency_code,
    normalize_key,
)
from market_flow_spark.functions.dates import (
    constructed_date,
    end_of_month,
    start_of_month,
    year_month_cols,
)
from market_flow_spark.functions.units import (
    UNIT_TO_KG_BARE,
    parse_unit_name,
    price_per_kg,
    value_in_kg,
)

__all__ = [
    "ascii_strip",
    "guarded_cast",
    "normalize_country_name",
    "normalize_currency_code",
    "normalize_key",
    "constructed_date",
    "end_of_month",
    "start_of_month",
    "year_month_cols",
    "UNIT_TO_KG_BARE",
    "parse_unit_name",
    "price_per_kg",
    "value_in_kg",
]
