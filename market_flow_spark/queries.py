"""Query registry: every implemented operator as a (spark_fn, oracle_sql)
pair over the driver's TPC-H-ish tables (TESTDATA.md, role map FIXTURES.md §8).

Conventions that make the driver's order-insensitive value-hash match:
- every order-sensitive float aggregate (avg/sum/stddev, window means) is
  ROUND(x, 2) on BOTH sides; per-row arithmetic is bit-exact IEEE and left
  unrounded;
- DuckDB type quirks are cast away in the oracle: year()/month() → INT,
  SUM(int) → BIGINT (DuckDB returns HUGEINT), row_number() → INT;
- DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all;
- every top-k/LIMIT query orders by a total order (unique tiebreaker).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_flow_spark.functions.aggregates import det_avg, det_avg_over
from market_flow_spark.functions.cleaning import normalize_key
from market_flow_spark.functions.units import parse_unit_name, price_per_kg
from market_flow_spark.operators import analytics as an
from market_flow_spark.operators import dims, imputation, incremental, star
from market_flow_spark.sources.layout import spread_to_cores
from market_flow_spark.tables import load_tables


def spread_sales(t: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """The round-12 serial-scan fix for heavy lineitem/orders consumers:
    conditionally hash-spread the two fact tables on their JOIN key before
    CPU-heavy aggregation chains, so (a) the single-row-group test parquet
    (one scan task) stops serializing the partial aggregates above it and
    (b) the lineitem⋈orders sort-merge exchange and every
    groupBy(l_orderkey) reuse the spread's partitioning outright.
    spread_to_cores only fires when the scan yields fewer partitions than
    cores — on a real 100 TB corpus this is a no-op (file splits provide
    the parallelism), so no shuffle is ever added at scale. Applied per
    query (NOT in load_table): map-only/cheap-agg paths measured ×1.1-5.5
    slower under a blanket spread — the exchange must buy back more than
    it costs, which only heavy partial-agg/join chains do.

    Only lineitem is spread. Orders is the BROADCAST side of its join in
    every registered consumer (plan-verified: flagship/rollup/
    grouping-sets/anomalies all show the orders scan feeding a
    BroadcastExchange), so a spread there is pure waste — an Exchange
    directly under a BroadcastExchange, shuffling rows that are about to
    be collected anyway (measured: rollup_revenue ×1.8 slower with it).
    Heavy DIRECT consumers of orders (profile_orders) spread it
    explicitly at their own site."""
    return {
        **t,
        "lineitem": spread_to_cores(t["lineitem"], "l_orderkey"),
    }

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: ml_data-analog 8-way star join (SURVEY §2.3 J2, §2.8 F6-F7)
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
WITH ev_m AS (
  SELECT CAST(month(ts) AS INT) AS month,
         FLOOR((CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
              / COUNT(value)) * 100.0 + 0.5) / 100.0 AS avg_event_value,
         COUNT(*) AS event_count
  FROM events GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber,
       l.l_extendedprice AS price,
       l.l_extendedprice / l.l_quantity AS price_per_unit,
       l.l_extendedprice * (1.0 - l.l_discount) AS price_discounted,
       CAST(year(o.o_orderdate) AS INT) AS year,
       CAST(month(o.o_orderdate) AS INT) AS month,
       make_date(CAST(year(o.o_orderdate) AS INT),
                 CAST(month(o.o_orderdate) AS INT), 1) AS constructed_date,
       c.c_mktsegment AS market_segment,
       c.c_name AS customer_name,
       n.n_name AS country,
       r.r_name AS region,
       p.p_name AS product_name,
       p.p_brand AS brand,
       s.s_name AS supplier_name,
       e.avg_event_value,
       e.event_count
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
LEFT JOIN ev_m e ON CAST(month(o.o_orderdate) AS INT) = e.month
"""


@register("flagship_wide", FLAGSHIP_ORACLE)
def q_flagship_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    return star.flagship_wide(spread_sales(load_tables(spark, sf_dir)))


@register(
    "fact_transactions",
    """
WITH ev_m AS (
  SELECT CAST(month(ts) AS INT) AS month,
         FLOOR((CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
              / COUNT(value)) * 100.0 + 0.5) / 100.0 AS avg_event_value
  FROM events GROUP BY 1
),
base AS (
  SELECT l.*, o.o_custkey,
         CAST(year(o.o_orderdate) AS INT) AS year,
         CAST(month(o.o_orderdate) AS INT) AS month
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
filt AS (
  SELECT b.* FROM base b
  WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = b.o_custkey)
)
SELECT b.l_orderkey * 100 + row_number() OVER (
         PARTITION BY b.l_orderkey
         ORDER BY b.l_linenumber, b.l_partkey, b.l_suppkey, b.l_quantity,
                  b.l_extendedprice, b.l_discount) AS transaction_id,
       b.l_orderkey AS order_id,
       b.l_partkey AS product_id,
       b.l_suppkey AS supplier_id,
       b.o_custkey AS customer_id,
       b.year * 100 + b.month AS date_sk,
       b.l_extendedprice AS price,
       b.l_extendedprice / b.l_quantity AS price_per_unit,
       e.avg_event_value
FROM filt b
JOIN ev_m e ON b.month = e.month AND e.avg_event_value IS NOT NULL
""",
)
def q_fact_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return star.fact_transactions(load_tables(spark, sf_dir))


@register(
    "monthly_event_stats",
    """
SELECT CAST(month(ts) AS INT) AS month,
       FLOOR((CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
              / COUNT(value)) * 100.0 + 0.5) / 100.0 AS avg_event_value,
       COUNT(*) AS event_count
FROM events GROUP BY 1
""",
)
def q_monthly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return star.monthly_event_stats(load_tables(spark, sf_dir)["events"])


@register(
    "json_props_stats",
    """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
         AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
         AS max_k
FROM events
WHERE props IS NOT NULL
GROUP BY 1
""",
)
def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON `props` payload JVM-side
    (`get_json_object`, no UDF) and aggregate the extracted field. The
    reference has no JSON anywhere (SURVEY §2.8 'absent'); a training-data
    pipeline meets JSON sidecars constantly, so the engine covers it."""
    ev = load_tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.filter(F.col("props").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.max(k).cast("int").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# Staging layer: typed projection, cleaning, unit conversion (P1-P2, F1-F5)
# ---------------------------------------------------------------------------


@register(
    "stg_transactions_typed",
    """
SELECT l_orderkey AS order_id,
       l_linenumber AS line_number,
       l_partkey AS product_id,
       l_suppkey AS supplier_id,
       CAST(l_quantity AS DOUBLE) AS quantity,
       l_extendedprice AS price,
       l_extendedprice / l_quantity AS price_per_unit,
       l_returnflag AS return_flag
FROM lineitem
WHERE l_quantity IS NOT NULL AND l_extendedprice > 0
""",
)
def q_stg_transactions_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 projection+rename, P2 not-null filters, F5/F7 typing+arithmetic
    (stg_transactions.sql:5-24,52-56)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(
        F.col("l_quantity").isNotNull() & (F.col("l_extendedprice") > 0)
    ).select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_suppkey").alias("supplier_id"),
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("price_per_unit"),
        F.col("l_returnflag").alias("return_flag"),
    )


_UNIT_CASE_SQL = """
  CASE WHEN p_partkey % 7 = 0 THEN 'KG'
       WHEN p_partkey % 7 = 1 THEN CAST(p_size AS VARCHAR) || ' KG'
       WHEN p_partkey % 7 = 2 THEN CAST(p_size AS VARCHAR) || ' G'
       WHEN p_partkey % 7 = 3 THEN 'MT'
       WHEN p_partkey % 7 = 4 THEN CAST(p_size AS VARCHAR) || ' lbs'
       WHEN p_partkey % 7 = 5 THEN CAST(p_size AS VARCHAR) || ' ML'
       ELSE 'Unit' END
"""


@register(
    "unit_conversion",
    f"""
WITH u AS (
  SELECT p_partkey, p_retailprice, {_UNIT_CASE_SQL} AS unit_name FROM part
),
p AS (
  SELECT p_partkey, p_retailprice, unit_name,
         COALESCE(regexp_extract(trim(unit_name), '^([0-9\\.]+)', 1), '') AS unit_value,
         lower(trim(regexp_replace(trim(unit_name), '^[0-9\\.]+', '', 'g'))) AS unit_type
  FROM u
),
k AS (
  SELECT *,
    CASE unit_type
      WHEN 'kg' THEN qty * 1.0
      WHEN 'mt' THEN qty * 1000.0
      WHEN 'pound' THEN qty * 0.453592
      WHEN 'lb' THEN qty * 0.453592
      WHEN 'lbs' THEN qty * 0.453592
      WHEN 'g' THEN qty * 0.001
      WHEN 'l' THEN qty * 0.001
      WHEN 'ml' THEN qty * 0.000001
      ELSE NULL END AS value_in_kg
  FROM (SELECT *, CASE WHEN unit_value <> '' THEN CAST(unit_value AS DOUBLE)
                       ELSE 1.0 END AS qty FROM p)
)
SELECT p_partkey, unit_name, unit_value, unit_type, value_in_kg,
       CASE WHEN value_in_kg IS NOT NULL AND value_in_kg <> 0
            THEN p_retailprice / value_in_kg
            ELSE p_retailprice END AS price_per_kg
FROM k
""",
)
def q_unit_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F4: regex unit parse + unit→kg CASE table + per-kg price guard
    (stg_cleaned_units.sql:5-51, stg_transactions.sql:52-56), exercised over
    unit strings synthesized deterministically from `part`."""
    pa = load_tables(spark, sf_dir)["part"]
    pk = F.col("p_partkey")
    size_s = F.col("p_size").cast("string")
    unit_name = (
        F.when(pk % 7 == 0, F.lit("KG"))
        .when(pk % 7 == 1, F.concat(size_s, F.lit(" KG")))
        .when(pk % 7 == 2, F.concat(size_s, F.lit(" G")))
        .when(pk % 7 == 3, F.lit("MT"))
        .when(pk % 7 == 4, F.concat(size_s, F.lit(" lbs")))
        .when(pk % 7 == 5, F.concat(size_s, F.lit(" ML")))
        .otherwise(F.lit("Unit"))
    )
    df = pa.select("p_partkey", "p_retailprice", unit_name.alias("unit_name"))
    uv, ut, kg = parse_unit_name(F.col("unit_name"))
    return df.select(
        "p_partkey",
        "unit_name",
        uv.alias("unit_value"),
        ut.alias("unit_type"),
        kg.alias("value_in_kg"),
        price_per_kg(F.col("p_retailprice"), kg).alias("price_per_kg"),
    )


@register(
    "events_typed",
    """
SELECT event_id, event_type,
       CAST(regexp_extract(props, '"k":\\s*(-?[0-9]+)', 1) AS INT) AS prop_k,
       value
FROM events
""",
)
def q_events_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: string→typed extraction from a semi-structured column (the
    all-varchar raw layer's deferred typing, stg_transactions.sql:19-21)."""
    ev = load_tables(spark, sf_dir)["events"]
    return ev.select(
        "event_id",
        "event_type",
        F.regexp_extract("props", r'"k":\s*(-?[0-9]+)', 1).cast("int").alias("prop_k"),
        "value",
    )


# ---------------------------------------------------------------------------
# Dimensions (A1-A3, W1-W2, J6, U1)
# ---------------------------------------------------------------------------


@register(
    "dim_product",
    """
SELECT p_partkey, p_name, p_brand, p_type,
       CAST(row_number() OVER (ORDER BY p_name, p_partkey) AS INT) AS product_sk
FROM (SELECT DISTINCT p_partkey, p_name, p_brand, p_type FROM part)
""",
)
def q_dim_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dims.dim_product(load_tables(spark, sf_dir)["part"])


@register(
    "dim_date",
    """
WITH y AS (SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS year FROM orders),
     m AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),
                                 (7),(8),(9),(10),(11),(12)) AS t(month))
SELECT y.year, m.month,
       y.year * 100 + m.month AS date_sk,
       make_date(y.year, m.month, 1) AS first_of_month,
       CAST(last_day(make_date(y.year, m.month, 1)) AS DATE) AS month_end,
       CAST(date_diff('day', make_date(y.year, m.month, 1),
                      CAST(last_day(make_date(y.year, m.month, 1)) AS DATE))
            + 1 AS INT) AS days_in_month
FROM y CROSS JOIN m
""",
)
def q_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 cross-join scaffold + F12 month-bounds math in one dim (the
    reference computes the same start/end-of-month pairs in
    utils/date_utils.py:4-15)."""
    return dims.dim_date_scaffold(load_tables(spark, sf_dir)["orders"])


@register(
    "dim_country_merged",
    """
WITH cust AS (
  SELECT DISTINCT
    trim(regexp_replace(regexp_replace(n_name, '[^a-zA-Z0-9 ]', '', 'g'),
                        '\\s+', ' ', 'g')) AS country,
    1 AS has_customer, 0 AS has_supplier
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
supp AS (
  SELECT DISTINCT
    trim(regexp_replace(regexp_replace(n_name, '[^a-zA-Z0-9 ]', '', 'g'),
                        '\\s+', ' ', 'g')) AS country,
    0 AS has_customer, 1 AS has_supplier
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
u AS (SELECT * FROM cust UNION SELECT * FROM supp),
g AS (
  SELECT country, MAX(has_customer) AS has_customer,
         MAX(has_supplier) AS has_supplier
  FROM u GROUP BY country
)
SELECT country, has_customer, has_supplier,
       CAST(row_number() OVER (ORDER BY country) AS INT) AS country_sk
FROM g
""",
)
def q_dim_country_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return dims.dim_country_merged(t["customer"], t["supplier"], t["nation"])


# ---------------------------------------------------------------------------
# Analytics (A5, A7-A10, W3, O2-O5, P4-P6)
# ---------------------------------------------------------------------------

_SALES_JOIN_SQL = """
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
"""


def _sales_join(t: dict[str, DataFrame]) -> DataFrame:
    t = spread_sales(t)
    li, od, cu, na = t["lineitem"], t["orders"], t["customer"], t["nation"]
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
    )


@register(
    "price_summary_stats",
    f"""
SELECT n_name AS country,
       FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS mean_price,
       ROUND(STDDEV(l_extendedprice), 2) AS std_price,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price
{_SALES_JOIN_SQL}
GROUP BY 1
""",
)
def q_price_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sales_join(load_tables(spark, sf_dir)).withColumnRenamed("n_name", "country")
    return an.multi_stat_summary(df, "country", "l_extendedprice")


@register(
    "country_month_avg",
    f"""
SELECT n_name AS country,
       make_date(CAST(year(o_orderdate) AS INT),
                 CAST(month(o_orderdate) AS INT), 1) AS constructed_date,
       FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS avg_price
{_SALES_JOIN_SQL}
GROUP BY 1, 2
""",
)
def q_country_month_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        _sales_join(load_tables(spark, sf_dir))
        .withColumnRenamed("n_name", "country")
        .withColumn(
            "constructed_date",
            F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)),
        )
    )
    out = an.two_level_mean(df, "country", "constructed_date", "l_extendedprice")
    return out


@register(
    "sales_agg_profile",
    f"""
SELECT n_name AS country,
       COUNT(DISTINCT l_partkey) AS n_p_products,
       COUNT(DISTINCT c_mktsegment) AS n_segments,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       COUNT(*) AS total
{_SALES_JOIN_SQL}
GROUP BY 1
""",
)
def q_sales_agg_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 + A9 in one driver-checkable query: exact distinct counts and the
    conditional (CASE-filtered) aggregation share the same sales join and
    country grouping, so merging them removes a whole duplicate
    join+shuffle rather than bolting two queries together."""
    df = _sales_join(load_tables(spark, sf_dir)).withColumnRenamed("n_name", "country")
    return an.group_profile(
        df,
        "country",
        {"n_p_products": "l_partkey", "n_segments": "c_mktsegment"},
        F.col("l_returnflag") == "R",
        "n_returned",
    )


@register(
    "top10_products",
    """
WITH s AS (
  SELECT p_name AS product_name,
         FLOOR((CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                              AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(*)) * 100.0 + 0.5) / 100.0 AS avg_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT product_name, avg_price FROM s
ORDER BY avg_price ASC, product_name ASC
LIMIT 10
""",
)
def q_top10_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: best-products top-k (forecast_utils.py:123-139) — cheapest-first
    ranking with a name tiebreaker so the limit boundary is deterministic."""
    t = spread_sales(load_tables(spark, sf_dir))
    s = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_name").alias("product_name"))
        .agg(
            det_avg(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("avg_price")
        )
    )
    return an.top_k(s, ["avg_price", "product_name"], 10)


@register(
    "rolling_ma30",
    """
WITH m AS (
  SELECT p_brand AS brand,
         CAST(year(o_orderdate) AS INT) AS year,
         CAST(month(o_orderdate) AS INT) AS month,
         FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS avg_price
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3
)
SELECT brand, year, month, avg_price,
       FLOOR((CAST(SUM(CAST(avg_price AS DECIMAL(27,6))) OVER w AS DOUBLE)
             / COUNT(avg_price) OVER w) * 100.0 + 0.5) / 100.0 AS ma30
FROM m
WINDOW w AS (PARTITION BY brand ORDER BY year, month
             ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
""",
)
def q_rolling_ma30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: per-group 30-row trailing mean over a monthly price series
    (single_product_forecasting.py:41-43)."""
    t = spread_sales(load_tables(spark, sf_dir))
    m = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
        )
        .agg(det_avg("l_extendedprice").alias("avg_price"))
    )
    w = (
        Window.partitionBy("brand")
        .orderBy("year", "month")
        .rowsBetween(-29, Window.currentRow)
    )
    return m.withColumn("ma30", det_avg_over("avg_price", w))


@register(
    "page_and_tail",
    """
SELECT 'page' AS branch, l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS TIMESTAMP) AS ts,
       CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS DOUBLE) AS value
FROM (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
  FROM lineitem
  ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
  LIMIT 20 OFFSET 100
)
UNION ALL
SELECT 'tail', NULL, NULL, NULL, NULL, event_id, ts, event_type, value
FROM (
  SELECT event_id, ts, event_type, value
  FROM events
  ORDER BY ts DESC, event_id DESC
  LIMIT 50
)
""",
)
def q_page_and_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 + O5 in one driver-checkable query (null-padded union of the two
    result shapes, tagged by branch).

    O3 dataset-viewer pagination: the ORDER BY covers every selected column
    — (l_orderkey, l_linenumber) alone is NOT unique in the data, and a page
    boundary landing on a tie would be engine-dependent; ordering by all
    output columns makes any remaining ties bit-identical rows, so the page
    content is deterministic. O5 is the pandas tail(n) analog. Both plan as
    TakeOrdered — no global sort."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    page = an.paginate(
        li,
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
        page=5,
        size=20,
    )
    ev = t["events"].select("event_id", "ts", "event_type", "value")
    tail = an.last_n(ev, "ts", 50, tiebreak=["event_id"])
    page_side = page.select(
        F.lit("page").alias("branch"),
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
    )
    tail_side = tail.select(
        F.lit("tail").alias("branch"),
        F.lit(None).cast("bigint").alias("l_orderkey"),
        F.lit(None).cast("int").alias("l_linenumber"),
        F.lit(None).cast("double").alias("l_quantity"),
        F.lit(None).cast("double").alias("l_extendedprice"),
        "event_id",
        "ts",
        "event_type",
        "value",
    )
    return page_side.unionByName(tail_side)


@register(
    "filter_suite",
    """
SELECT 'in' AS branch, c_custkey, c_name, c_mktsegment,
       CAST(NULL AS BIGINT) AS p_partkey, CAST(NULL AS VARCHAR) AS p_name,
       CAST(NULL AS INT) AS p_size,
       CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value
FROM customer WHERE c_mktsegment IN ('MACHINERY', 'BUILDING')
UNION ALL
SELECT 'contains', NULL, NULL, NULL, p_partkey, p_name, NULL, NULL, NULL
FROM part WHERE position('wid' IN lower(p_name)) > 0
UNION ALL
SELECT 'numeric', NULL, NULL, NULL, p_partkey, NULL, p_size, NULL, NULL
FROM part WHERE p_size = 15
UNION ALL
SELECT 'positive', NULL, NULL, NULL, NULL, NULL, NULL, event_id, value
FROM events WHERE value > 0
""",
)
def q_filter_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 + P5 (both branches) + P6 in one driver-checkable query: IN-list
    filter, substring-contains filter, the viewer's numeric-equality
    fallback (dataset_viewer.py:18-29: a needle applied to a numeric column
    parses as a number and switches from substring to equality), and the
    `> 0` guard — each branch tagged and null-padded to a common schema.
    All four filters push down to their parquet scans (asserted in
    test_plans.py)."""
    t = load_tables(spark, sf_dir)
    cu = an.filter_isin(
        t["customer"].select("c_custkey", "c_name", "c_mktsegment"),
        "c_mktsegment",
        ["MACHINERY", "BUILDING"],
    )
    pa_contains = an.filter_contains(
        t["part"].select("p_partkey", "p_name"), "p_name", "wid"
    )
    pa_numeric = an.filter_contains(
        t["part"].select("p_partkey", "p_size"), "p_size", "15"
    )
    ev = an.filter_positive(t["events"].select("event_id", "value"), "value")

    def _pad(df: DataFrame, branch: str, have: dict[str, str]) -> DataFrame:
        cols = [F.lit(branch).alias("branch")]
        for name, typ in [
            ("c_custkey", "bigint"),
            ("c_name", "string"),
            ("c_mktsegment", "string"),
            ("p_partkey", "bigint"),
            ("p_name", "string"),
            ("p_size", "int"),
            ("event_id", "bigint"),
            ("value", "double"),
        ]:
            cols.append(
                F.col(name) if name in have else F.lit(None).cast(typ).alias(name)
            )
        return df.select(*cols)

    return (
        _pad(cu, "in", {"c_custkey", "c_name", "c_mktsegment"})
        .unionByName(_pad(pa_contains, "contains", {"p_partkey", "p_name"}))
        .unionByName(_pad(pa_numeric, "numeric", {"p_partkey", "p_size"}))
        .unionByName(_pad(ev, "positive", {"event_id", "value"}))
    )


# ---------------------------------------------------------------------------
# Imputation (A11-A13) — testdata has no NULLs, so each query injects them
# deterministically first, then imputes.
# ---------------------------------------------------------------------------


@register(
    "mean_impute",
    """
WITH m AS (
  SELECT event_id, event_type,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_masked
  FROM events
),
s AS (SELECT FLOOR((CAST(SUM(CAST(value_masked AS DECIMAL(27,6))) AS DOUBLE)
             / COUNT(value_masked)) * 100.0 + 0.5) / 100.0 AS mv FROM m)
SELECT event_id, event_type, COALESCE(value_masked, mv) AS value_masked
FROM m, s
""",
)
def q_mean_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: column-mean fill (the reference's Spark ML Imputer job,
    impute_missing_currencies.py:75-89)."""
    ev = load_tables(spark, sf_dir)["events"]
    masked = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("value_masked"),
    )
    return imputation.mean_impute(masked, ["value_masked"])


@register(
    "ffill_bfill_impute",
    """
WITH m AS (
  SELECT p_brand AS brand,
         CAST(year(o_orderdate) AS INT) * 100 + CAST(month(o_orderdate) AS INT)
           AS mkey,
         CAST(month(o_orderdate) AS INT) AS month,
         FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS avg_price
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3
),
k AS (
  SELECT brand, mkey,
         CASE WHEN month % 4 = 1 THEN NULL ELSE avg_price END AS avg_price
  FROM m
)
SELECT brand, mkey,
       COALESCE(avg_price,
         last_value(avg_price IGNORE NULLS) OVER (
           PARTITION BY brand ORDER BY mkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         first_value(avg_price IGNORE NULLS) OVER (
           PARTITION BY brand ORDER BY mkey
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS avg_price
FROM k
""",
)
def q_ffill_bfill_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: time-series ffill→bfill per series — the reference's
    pivot+ffill+bfill+melt pandas job as two ignorenulls windows."""
    t = spread_sales(load_tables(spark, sf_dir))
    m = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("mkey"),
            F.month("o_orderdate").alias("month"),
        )
        .agg(det_avg("l_extendedprice").alias("avg_price"))
    )
    masked = m.select(
        "brand",
        "mkey",
        F.when(F.col("month") % 4 == 1, None)
        .otherwise(F.col("avg_price"))
        .alias("avg_price"),
    )
    return imputation.ffill_bfill(masked, "brand", "mkey", "avg_price")


@register(
    "group_mean_impute",
    """
WITH m AS (
  SELECT c_custkey, c_nationkey,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal
  FROM customer
),
g AS (
  SELECT c_nationkey,
         FLOOR((CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(c_acctbal)) * 100.0 + 0.5) / 100.0 AS gm
  FROM m GROUP BY 1
)
SELECT m.c_custkey, m.c_nationkey, COALESCE(m.c_acctbal, g.gm) AS c_acctbal
FROM m LEFT JOIN g USING (c_nationkey)
""",
)
def q_group_mean_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: per-country mean substituted into null rows
    (impute_missing_coords.py:31-65)."""
    cu = load_tables(spark, sf_dir)["customer"]
    masked = cu.select(
        "c_custkey",
        "c_nationkey",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    return imputation.group_mean_impute(masked, "c_nationkey", ["c_acctbal"])


# ---------------------------------------------------------------------------
# Incremental patterns (J7, J9-J10, S10)
# ---------------------------------------------------------------------------


@register(
    "anti_join_missing_months",
    """
WITH ship AS (
  SELECT DISTINCT CAST(year(l_shipdate) AS INT) AS year,
                  CAST(month(l_shipdate) AS INT) AS month
  FROM lineitem
),
ord AS (
  SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS year,
                  CAST(month(o_orderdate) AS INT) AS month
  FROM orders
)
SELECT s.year, s.month FROM ship s
WHERE NOT EXISTS (
  SELECT 1 FROM ord o WHERE o.year = s.year AND o.month = s.month
)
""",
)
def q_anti_join_missing_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9/J10: 'fetch only missing keys' anti-join."""
    t = load_tables(spark, sf_dir)
    ship = (
        t["lineitem"]
        .select(
            F.year("l_shipdate").alias("year"), F.month("l_shipdate").alias("month")
        )
        .distinct()
    )
    ordm = (
        t["orders"]
        .select(
            F.year("o_orderdate").alias("year"), F.month("o_orderdate").alias("month")
        )
        .distinct()
    )
    return incremental.missing_keys(ship, ordm, ["year", "month"])


@register(
    "normalized_join",
    """
WITH messy AS (
  SELECT n_nationkey, '  ' || upper(n_name) || ' ' AS messy_name FROM nation
)
SELECT m.n_nationkey, lower(trim(m.messy_name)) AS join_key, c.n_regionkey
FROM messy m
JOIN nation c ON lower(trim(m.messy_name)) = lower(trim(c.n_name))
""",
)
def q_normalized_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: LOWER(TRIM(a)) = LOWER(TRIM(b)) fuzzy-key join
    (stg_localities.sql:31-33)."""
    na = load_tables(spark, sf_dir)["nation"]
    messy = na.select(
        "n_nationkey",
        F.concat(F.lit("  "), F.upper("n_name"), F.lit(" ")).alias("messy_name"),
    )
    clean = na.select(F.col("n_name"), F.col("n_regionkey"))
    joined = messy.join(
        F.broadcast(clean),
        normalize_key(messy.messy_name) == normalize_key(clean.n_name),
    )
    return joined.select(
        "n_nationkey", normalize_key(F.col("messy_name")).alias("join_key"), "n_regionkey"
    )


@register(
    "float_key_join",
    """
WITH peaks AS (
  SELECT c_nationkey, MAX(c_acctbal) AS peak_bal
  FROM customer GROUP BY 1
)
SELECT c.c_nationkey, c.c_custkey, c.c_acctbal AS peak_bal
FROM customer c
JOIN peaks p ON c.c_nationkey = p.c_nationkey AND c.c_acctbal = p.peak_bal
""",
)
def q_float_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: equi-join on a DOUBLE key (stg_weather.sql:13-15 joins weather to
    localities on (latitude, longitude) floats). Safe for the same reason as
    the reference: the join-side value is a bit-exact copy of a stored value
    (MAX copies one of the inputs), never the result of arithmetic. Modeled
    as argmax-via-self-join: the customer(s) holding each nation's peak
    account balance."""
    cu = load_tables(spark, sf_dir)["customer"]
    peaks = cu.groupBy(F.col("c_nationkey").alias("p_nationkey")).agg(
        F.max("c_acctbal").alias("p_peak_bal")
    )
    return cu.join(
        F.broadcast(peaks),
        (F.col("c_nationkey") == F.col("p_nationkey"))
        & (F.col("c_acctbal") == F.col("p_peak_bal")),
    ).select("c_nationkey", "c_custkey", F.col("c_acctbal").alias("peak_bal"))


@register(
    "upsert_plan",
    """
WITH existing AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0
),
incoming AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal FROM customer
  WHERE c_custkey % 3 = 0
)
SELECT * FROM existing e
WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.c_custkey = e.c_custkey)
UNION ALL
SELECT * FROM incoming
""",
)
def q_upsert_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: keyed upsert as a pure transform (anti-join + union)."""
    cu = load_tables(spark, sf_dir)["customer"].select(
        "c_custkey", "c_name", "c_acctbal"
    )
    existing = cu.filter(F.col("c_custkey") % 2 == 0)
    incoming = cu.filter(F.col("c_custkey") % 3 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100.0
    )
    return incremental.upsert(existing, incoming, ["c_custkey"])
