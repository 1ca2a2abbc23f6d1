"""Dimension builders (SURVEY.md §2.4 A1-A3, §2.5 W1-W2, §2.3 J6, §2.7 U1).

The reference extracts dims from denormalized rows with SELECT DISTINCT and
stamps surrogate keys via ROW_NUMBER() OVER () (unordered — nondeterministic,
SURVEY §7.4 item 1). Here every surrogate key is either

- ``row_number`` over an **explicit total order** (small dims only — the
  window collapses to one partition, which is fine for a dim of a few
  thousand rows but would never be used on a fact table), or
- a **key-derived id** (e.g. year*100+month) with no shuffle at all — the
  100 TB-safe scheme used for anything fact-sized.

Reference anchors:
- distinct dedup dims: dbt/models/staging/stg_commodities.sql:4-7 et al. (A1)
- UNION + GROUP BY MAX country merge: dbt/models/staging/stg_countries.sql:1-46 (U1, A2, W1)
- cross-join date scaffold: dbt/models/analytics/dim_date.sql:11 (J6)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from market_flow_spark.functions.cleaning import normalize_country_name


def dim_from_distinct(
    df: DataFrame, cols: list[str], sk_name: str, order_cols: list[str] | None = None
) -> DataFrame:
    """A1 + W1: SELECT DISTINCT cols → deterministic row_number surrogate key.

    Deliberately a single-partition window: valid only for dimension-sized
    inputs (the caller's contract). Order columns default to all selected
    columns so the key is a pure function of the data.
    """
    order_cols = order_cols or cols
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.select(*cols).distinct().withColumn(sk_name, F.row_number().over(w))


def dim_product(part: DataFrame) -> DataFrame:
    """Commodity dim from ``part`` (role map FIXTURES.md §8)."""
    return dim_from_distinct(
        part,
        ["p_partkey", "p_name", "p_brand", "p_type"],
        "product_sk",
        order_cols=["p_name", "p_partkey"],
    )


def dim_date_scaffold(orders: DataFrame) -> DataFrame:
    """J6 + key-derived W2 + F12: distinct years × months 1..12 cross-join
    scaffold (dim_date.sql:11 builds dates as dim_year × dim_month), carrying
    the start/end-of-month bounds the reference computes in
    utils/date_utils.py:4-15 for its monthly API ranges.

    date_sk = year*100+month — deterministic, shuffle-free, and monotone in
    time, unlike the reference's ROW_NUMBER() OVER ().
    """
    from market_flow_spark.functions.dates import end_of_month

    spark = orders.sparkSession
    years = orders.select(F.year("o_orderdate").alias("year")).distinct()
    months = spark.range(1, 13).select(F.col("id").cast("int").alias("month"))
    first = F.make_date("year", "month", F.lit(1))
    return (
        years.crossJoin(months)
        .withColumn("date_sk", F.col("year") * 100 + F.col("month"))
        .withColumn("first_of_month", first)
        .withColumn("month_end", end_of_month(F.col("first_of_month")))
        .withColumn(
            "days_in_month",
            (F.datediff(F.col("month_end"), F.col("first_of_month")) + 1).cast(
                "int"
            ),
        )
    )


def dim_country_merged(
    customer: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """U1 + A2 + W1: country master list merged from two sources.

    Mirrors stg_countries.sql — UNION (distinct) of HDI- and WFP-sourced
    country names with per-source flags, merged with GROUP BY MAX, name-
    normalized, then ROW_NUMBER surrogate key ordered by name. Customer
    nations play the WFP source; supplier nations play the HDI source.
    """
    cust_side = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            normalize_country_name(F.col("n_name")).alias("country"),
            F.lit(1).alias("has_customer"),
            F.lit(0).alias("has_supplier"),
        )
        .distinct()
    )
    supp_side = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            normalize_country_name(F.col("n_name")).alias("country"),
            F.lit(0).alias("has_customer"),
            F.lit(1).alias("has_supplier"),
        )
        .distinct()
    )
    merged = (
        cust_side.unionByName(supp_side)
        .groupBy("country")
        .agg(
            F.max("has_customer").alias("has_customer"),
            F.max("has_supplier").alias("has_supplier"),
        )
    )
    w = Window.orderBy("country")
    return merged.withColumn("country_sk", F.row_number().over(w))
