"""Skew- and layout-aware join strategies (SURVEY §4; 100 TB design).

Two techniques AQE cannot always supply:

- **Salting** — when one join key dominates (a hot market, a viral
  document), AQE's skew-join split helps sort-merge joins but not
  aggregations or all engines' plans. Salting rewrites the join so the hot
  key's rows spread over N sub-keys: the big side gets a random-ish salt
  derived from a stable row attribute (deterministic → reproducible), the
  small side is exploded N ways. Result is identical to the plain join.
- **Bucketing** — for a join repeated across many queries (fact ⋈ fact on
  the same key), pre-bucketing both tables by the join key lets Spark
  plan a shuffle-free sort-merge join: the Exchange disappears from the
  plan, which at 100 TB is the difference between re-shuffling terabytes
  per query and reading co-located buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join with the big side salted over `salt_buckets` sub-keys.

    `salt_source`: a stable big-side column used to derive the salt
    (deterministic — reruns produce identical partitioning); defaults to
    the join key's own hash mixed with a secondary hash, which spreads a
    single hot key only if salt_source is a finer-grained column, so pass
    one (e.g. the fact's primary key) when a key is truly hot.
    """
    src = F.col(salt_source) if salt_source else F.col(on)
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(src, F.lit(42)), F.lit(salt_buckets))
    )
    salts = small.sparkSession.range(salt_buckets).select(
        F.col("id").cast("int").alias("__salt_small")
    )
    exploded_small = small.crossJoin(F.broadcast(salts)).withColumnRenamed(
        "__salt_small", "__salt"
    )
    joined = salted_big.join(
        exploded_small, on=[on, "__salt"], how=how
    )
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, num_buckets: int = 16
) -> None:
    """Materialize a table bucketed (and sorted) by the join key. Readers
    joining two tables bucketed the same way skip the shuffle entirely."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed catalog tables — plans without an Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
