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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table.

    The ``events`` parquet stores ``ts`` as TIMESTAMP(NANOS), which the
    Spark parquet reader rejects; we read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microseconds
    — exactly what DuckDB does when it scans the same file, so oracle
    comparisons agree.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table; scans stay lazy so unused tables cost nothing
    (Catalyst prunes columns/partitions per query)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
