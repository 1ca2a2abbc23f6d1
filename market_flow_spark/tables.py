"""Canonical table loader for the synthetic TPC-H-ish test schema.

The driver provides parquet tables (TESTDATA.md); role-mapping to the
reference's data model is documented in FIXTURES.md §8:

- ``lineitem`` + ``orders``  → transactions (WFP rows: price/qty/date)
- ``part``                   → commodity dim
- ``customer``/``nation``/``region`` → market/locality/country geography
- ``supplier``               → currency-ish dim
- ``events``                 → monthly enrichment series (weather analog)
- ``documents``/``embeddings`` → large-scale-pipeline extension tables
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# (applicationId, sf_dir, name) -> resolved DataFrame. A DataFrame is an
# immutable lazy plan, so sharing one relation across every query that
# reads the same table is semantics-free — but it skips the per-call
# spark.read.parquet resolution (parquet footer read + schema conversion
# + DataSource setup), which measured as HALF of whole-registry
# construction cost: building all 118 registered queries at sf0.01 on
# local[8] took 135.9 s cold / 115.6 s on a repeat pass without the
# cache, 69.0 s / 41.2 s with it. At one query the cache is noise; at a
# bench/driver pass over the full registry it is the cold-start lever.
# Keyed by applicationId so a stopped-and-restarted session never sees
# another session's (dead) plans.
_RELATION_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def clear_table_cache() -> None:
    """Drop every cached relation (tests that rewrite parquet in place
    under the same path/app should call this)."""
    _RELATION_CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table (memoized per session+path — see above).

    The ``events`` parquet stores ``ts`` as TIMESTAMP(NANOS), which the
    Spark parquet reader rejects; we read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microseconds
    — exactly what DuckDB does when it scans the same file, so oracle
    comparisons agree.
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    _RELATION_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table; scans stay lazy so unused tables cost nothing
    (Catalyst prunes columns/partitions per query)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
