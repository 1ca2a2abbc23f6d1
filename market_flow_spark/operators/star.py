"""Star-schema assembly and the flagship wide export (SURVEY.md §2.3 J1-J5,
§2.8 F6-F7).

The flagship models the reference's ``ml_data`` 8-way star join
(dags/prophet/dag_prophet_output.py:17-46): fact rows joined to every
dimension plus a monthly enrichment series, with derived price measures and a
constructed first-of-month date.

Scale design (100 TB):
- lineitem ⋈ orders is the only big-big join → shuffle hash / sort-merge on
  the order key; AQE handles skew. Everything else is a dimension →
  explicit ``broadcast()`` hints so no plan regression can shuffle them.
- The monthly event aggregate is tiny (≤ years×12 rows) → broadcast left
  join (J3). Filtering it to non-null value reproduces the reference's
  LEFT-join-degraded-to-INNER quirk (J4, fact_transaction.sql:51-53).
- No global orderBy in the flagship: output order is not semantic, and a
  100 TB global sort is a pure waste (the reference ORDER BYs every model —
  presentation-only, SURVEY §2.6 O1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from market_flow_spark.functions.aggregates import det_avg
from market_flow_spark.functions.dates import constructed_date


def monthly_event_stats(events: DataFrame) -> DataFrame:
    """Weather-analog enrichment: events aggregated to month grain (A6,
    api/weather_api.py:93-101 computes monthly means the same way).

    det_avg (exact decimal sum / count) keeps the mean bit-identical under
    any partial-aggregation order — matches the DuckDB oracle exactly.
    """
    return events.groupBy(F.month("ts").alias("month")).agg(
        det_avg("value").alias("avg_event_value"),
        F.count(F.lit(1)).alias("event_count"),
    )


def transactions_base(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Fact base: lineitem ⋈ orders with date parts (the one big-big join)."""
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .withColumn("year", F.year("o_orderdate"))
        .withColumn("month", F.month("o_orderdate"))
    )


def flagship_wide(tables: dict[str, DataFrame]) -> DataFrame:
    """The ml_data-analog wide denormalized DataFrame (J2 flagship).

    Column roles per FIXTURES.md §8: customer=market/locality,
    nation/region=geography, part=commodity, supplier=currency-ish,
    monthly events=weather.
    """
    li, od = tables["lineitem"], tables["orders"]
    cu, na, re_ = tables["customer"], tables["nation"], tables["region"]
    pa, su, ev = tables["part"], tables["supplier"], tables["events"]

    ev_m = monthly_event_stats(ev)
    base = transactions_base(li, od)
    wide = (
        base.join(F.broadcast(cu), base.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re_), na.n_regionkey == re_.r_regionkey)
        .join(F.broadcast(pa), base.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), base.l_suppkey == su.s_suppkey)
        .join(F.broadcast(ev_m), on="month", how="left")  # J3: optional enrich
    )
    return wide.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_extendedprice").alias("price"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("price_per_unit"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "price_discounted"
        ),
        F.col("year"),
        F.col("month"),
        constructed_date(F.col("year"), F.col("month")).alias("constructed_date"),
        F.col("c_mktsegment").alias("market_segment"),
        F.col("c_name").alias("customer_name"),
        F.col("n_name").alias("country"),
        F.col("r_name").alias("region"),
        F.col("p_name").alias("product_name"),
        F.col("p_brand").alias("brand"),
        F.col("s_name").alias("supplier_name"),
        F.col("avg_event_value"),
        F.col("event_count"),
    )


def fact_transactions(tables: dict[str, DataFrame]) -> DataFrame:
    """fact_transaction analog (fact_transaction.sql:56-69): FK columns +
    measures, orphan FKs dropped via join-as-filter (J11 → left_semi), and
    the LEFT-join-degraded-to-INNER FX attach (J4) reproduced as an inner
    join + IS NOT NULL — provably identical result, per SURVEY §2.3 J4.

    transaction_id replaces the reference's nondeterministic global
    ROW_NUMBER() OVER () (W2) with orderkey*100 + a row_number WITHIN the
    order (partitioned window — scales with keys, never a single
    partition). The synthetic data has duplicate (orderkey, linenumber)
    pairs, so the within-order rank orders by every measure column; rows
    still tied are bit-identical, which keeps the output multiset
    deterministic.
    """
    li, od, cu, ev = (
        tables["lineitem"],
        tables["orders"],
        tables["customer"],
        tables["events"],
    )
    ev_m = monthly_event_stats(ev).filter(F.col("avg_event_value").isNotNull())
    base = transactions_base(li, od)
    base = base.join(  # J11: integrity filter, keeps no customer columns
        F.broadcast(cu), base.o_custkey == cu.c_custkey, "left_semi"
    )
    fact = base.join(F.broadcast(ev_m), on="month", how="inner")  # J4 semantics
    from pyspark.sql import Window

    line_rank = F.row_number().over(
        Window.partitionBy("l_orderkey").orderBy(
            "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount",
        )
    )
    return fact.select(
        (F.col("l_orderkey") * 100 + line_rank).alias("transaction_id"),
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_suppkey").alias("supplier_id"),
        F.col("o_custkey").alias("customer_id"),
        (F.col("year") * 100 + F.col("month")).alias("date_sk"),
        F.col("l_extendedprice").alias("price"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("price_per_unit"),
        F.col("avg_event_value"),
    )
