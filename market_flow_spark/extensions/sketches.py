"""Distinct-count sketching (north-star extension).

The reference has no approximate aggregates (SURVEY.md §2.4 "absent:
approx distinct"); at 100 TB they become mandatory. Spark's builtin
``approx_count_distinct`` (HLL++) is the production default, but its register
layout is engine-specific, so it can never be oracle-checked against DuckDB.
This module adds a **KMV (k-minimum-values) sketch** built from pure
relational algebra + md5 — bit-identical on any engine, so the driver's
DuckDB oracle can verify it exactly:

- h(v) = (first 8 md5 hex chars as uint32 + 1) / 2^32  — uniform in (0, 1]
- keep the k smallest *distinct* hash values
- estimate = (k-1) / h_(k)   (exact count when fewer than k seen)

Scale path: the distinct-hash aggregate does map-side partial dedup, and the
k-smallest selection plans as TakeOrdered (per-partition heaps + driver
merge of k·P values, no global sort). Merging per-partition KMV sets is how
the sketch distributes on a 1000-executor job — same union-then-take-k
algebra Catalyst already produces here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 256


def kmv_hash(col: Column) -> Column:
    """Uniform (0, 1] hash from the md5 hex prefix — identical arithmetic in
    Spark (`conv(.., 16, 10)`) and DuckDB (`CAST('0x..' AS UBIGINT)`)."""
    raw = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
    return (raw.cast("double") + F.lit(1.0)) / F.lit(float(2**32))


def kmv_distinct(df: DataFrame, column: str, k: int = DEFAULT_K) -> DataFrame:
    """One-row DataFrame: (est_distinct bigint) — KMV estimate of
    COUNT(DISTINCT column)."""
    smallest = (
        df.filter(F.col(column).isNotNull())
        .select(kmv_hash(F.col(column)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    est = (
        F.when(F.count("h") < k, F.count("h"))
        .otherwise(F.floor((F.lit(float(k - 1)) / F.max("h")) + F.lit(0.5)))
        .cast("bigint")
    )
    return smallest.agg(est.alias("est_distinct"))


def kmv_oracle_sql(table: str, column: str, k: int = DEFAULT_K) -> str:
    """DuckDB SQL computing the identical estimate."""
    return f"""
WITH h AS (
  SELECT DISTINCT
    (CAST(('0x' || substr(md5(CAST({column} AS VARCHAR)), 1, 8)) AS UBIGINT)
     + 1.0) / 4294967296.0 AS h
  FROM {table} WHERE {column} IS NOT NULL
),
kth AS (SELECT h FROM h ORDER BY h LIMIT {k})
SELECT CAST(CASE WHEN COUNT(h) < {k} THEN COUNT(h)
            ELSE FLOOR(({k} - 1.0) / MAX(h) + 0.5) END AS BIGINT)
       AS est_distinct
FROM kth
"""


def kmv_sketch(df: DataFrame, column: str, k: int = DEFAULT_K) -> DataFrame:
    """The k smallest distinct hash values of a column — the mergeable
    sketch itself (one TakeOrdered over map-side-deduped hashes)."""
    return (
        df.filter(F.col(column).isNotNull())
        .select(kmv_hash(F.col(column)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_overlap(
    df_a: DataFrame, df_b: DataFrame, column: str, k: int = DEFAULT_K
) -> DataFrame:
    """Set-operation estimates from two KMV sketches — the dataset-
    governance question ("how much does corpus B overlap corpus A?")
    answered WITHOUT joining the raw sets: sketch each side (k smallest
    distinct hashes), merge to the union's k smallest, and read off

    - est_union       = (k-1)/h_(k) over the merged sketch (exact if < k)
    - est_jaccard     = fraction of merged-sketch hashes present in BOTH
                        side sketches (the standard KMV combinator)
    - est_intersection = jaccard · union

    Everything is md5-order deterministic, so the DuckDB oracle reproduces
    the estimates bit-for-bit — an *estimator* with an exact oracle. At
    100 TB each side reduces to k values before anything crosses sides."""
    sa = kmv_sketch(df_a, column, k).select(
        "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    sb = kmv_sketch(df_b, column, k).select(
        "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        sa.unionByName(sb)
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .orderBy("h")
        .limit(k)
    )
    n = F.count("h")
    union_est = (
        F.when(n < k, n)
        .otherwise(F.floor((F.lit(float(k - 1)) / F.max("h")) + F.lit(0.5)))
        .cast("bigint")
    )
    both = F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("int"))
    agg = merged.agg(
        union_est.alias("est_union"),
        (F.floor(both / n * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "est_jaccard"
        ),
    )
    return agg.select(
        "est_union",
        "est_jaccard",
        F.floor(F.col("est_jaccard") * F.col("est_union") + F.lit(0.5))
        .cast("bigint")
        .alias("est_intersection"),
    )


def kmv_overlap_oracle_sql(
    table_a_sql: str, table_b_sql: str, column: str, k: int = DEFAULT_K
) -> str:
    """DuckDB SQL computing the identical overlap estimates; the two table
    arguments are subquery texts (e.g. filtered halves of a view)."""
    def side(src: str, a: int, b: int) -> str:
        return f"""
  SELECT h, {a} AS in_a, {b} AS in_b FROM (
    SELECT DISTINCT
      (CAST(('0x' || substr(md5(CAST({column} AS VARCHAR)), 1, 8)) AS UBIGINT)
       + 1.0) / 4294967296.0 AS h
    FROM ({src}) WHERE {column} IS NOT NULL
    ORDER BY h LIMIT {k})
"""

    return f"""
WITH sa AS ({side(table_a_sql, 1, 0)}),
sb AS ({side(table_b_sql, 0, 1)}),
merged AS (
  SELECT h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb)
  GROUP BY h ORDER BY h LIMIT {k}
),
agg AS (
  SELECT
    CAST(CASE WHEN COUNT(h) < {k} THEN COUNT(h)
         ELSE FLOOR(({k} - 1.0) / MAX(h) + 0.5) END AS BIGINT) AS est_union,
    FLOOR(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
          / COUNT(h) * 1e6 + 0.5) / 1e6 AS est_jaccard
  FROM merged
)
SELECT est_union, est_jaccard,
       CAST(FLOOR(est_jaccard * est_union + 0.5) AS BIGINT) AS est_intersection
FROM agg
"""


def kmv_distinct_by(
    df: DataFrame,
    group_col: str,
    column: str,
    k: int = DEFAULT_K,
    skew_safe: bool = True,
    subsplits: int = 32,
) -> DataFrame:
    """(group, est_distinct): KMV distinct-count estimate PER GROUP — the
    mergeable per-group sketch (distinct URLs per domain, distinct users
    per country) that ``approx_count_distinct`` serves in production but
    can never be oracle-checked; this one is md5-deterministic and exactly
    reproducible in DuckDB.

    Scale shape: one map-side-deduped distinct over (group, hash), then the
    k smallest hashes per group via the same exact two-level reduction as
    ``sampling.cap_per_group`` — each (group, hash-subsplit) keeps its
    local k-smallest, so a group holding half the corpus spreads across
    ``subsplits`` tasks, and the final per-group window sees at most
    subsplits×k rows. The global k-smallest is contained in the union of
    per-subsplit k-smallests, so the result is identical to the naive
    single-window path row for row."""
    from pyspark.sql import Window

    h = (
        df.filter(F.col(column).isNotNull())
        .select(
            F.col(group_col).alias("g"), kmv_hash(F.col(column)).alias("h")
        )
        .distinct()
    )
    order = [F.col("h").asc()]
    w = Window.partitionBy("g").orderBy(*order)
    if skew_safe:
        sub = F.pmod(F.xxhash64(F.col("h")), F.lit(subsplits))
        w1 = Window.partitionBy(F.col("g"), sub).orderBy(*order)
        h = (
            h.withColumn("_sub_rn", F.row_number().over(w1))
            .filter(F.col("_sub_rn") <= k)
            .drop("_sub_rn")
        )
    kth = h.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    est = (
        F.when(F.count("h") < k, F.count("h"))
        .otherwise(F.floor((F.lit(float(k - 1)) / F.max("h")) + F.lit(0.5)))
        .cast("bigint")
    )
    return kth.groupBy("g").agg(est.alias("est_distinct")).withColumnRenamed(
        "g", group_col
    )


def kmv_distinct_by_oracle_sql(
    table: str, group_col: str, column: str, k: int = DEFAULT_K
) -> str:
    """DuckDB twin of :func:`kmv_distinct_by`."""
    return f"""
WITH h AS (
  SELECT DISTINCT {group_col} AS g,
    (CAST(('0x' || substr(md5(CAST({column} AS VARCHAR)), 1, 8)) AS UBIGINT)
     + 1.0) / 4294967296.0 AS h
  FROM {table} WHERE {column} IS NOT NULL
),
r AS (
  SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn FROM h
),
kth AS (SELECT g, h FROM r WHERE rn <= {k})
SELECT g AS {group_col},
       CAST(CASE WHEN COUNT(h) < {k} THEN COUNT(h)
            ELSE FLOOR(({k} - 1.0) / MAX(h) + 0.5) END AS BIGINT)
         AS est_distinct
FROM kth GROUP BY g
"""


# ---------------------------------------------------------------------------
# Bloom-filter membership sketch — the join-pruning sketch
# ---------------------------------------------------------------------------
#
# KMV answers "how many distinct?"; the Bloom filter answers "could this key
# possibly be on the other side?" — the question every cross-corpus
# contamination / incremental-ingest join wants answered BEFORE paying the
# shuffle. Built relationally: each key sets k = n_hashes bit positions
# (xxhash64 with distinct seeds — engine-local is fine because the filter
# only PRUNES; the exact join downstream decides membership, so false
# positives cost a little work and false negatives cannot happen), positions
# fold into 64-bit words via bit_or, and the whole filter is a bounded
# (n_bits/64)-row table — kilobytes to a few MB regardless of corpus size,
# the same bounded-artifact contract as the IVF centroid table.

BLOOM_BITS = 1 << 20  # 128 KiB of filter for ~1e5-1e6 keys at k=4
BLOOM_HASHES = 4


def _bloom_pos(col: Column, i: int, n_bits: int) -> Column:
    return F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits))


def bloom_build(
    df: DataFrame,
    column: str,
    n_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """(word_idx, word): the Bloom filter over ``df[column]`` as a table of
    64-bit words — at most ``n_bits/64`` rows. One explode of n_hashes
    positions per row + one bit_or aggregate whose key domain is bounded by
    the filter size, so map-side combine reduces each partition to at most
    n_bits/64 rows before the (tiny) shuffle. NULL keys are skipped (they
    never join anyway)."""
    if n_bits % 64 != 0:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    pos_arr = F.array(
        *[_bloom_pos(F.col(column), i, n_bits) for i in range(n_hashes)]
    )
    return (
        df.filter(F.col(column).isNotNull())
        .select(F.explode(pos_arr).alias("pos"))
        .select(
            F.expr("CAST(pos DIV 64 AS INT)").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_words(bits: DataFrame, n_bits: int = BLOOM_BITS) -> list[int]:
    """Collect a built filter into a dense word list (length n_bits/64).
    Bounded by construction (n_bits/64 longs — 128 KiB at the default), so
    this is a sanctioned driver collect, mirroring the IVF quantizer's
    bounded sample; persist the list alongside the corpus and every probe
    batch reuses it without re-scanning."""
    n_words = n_bits // 64
    words = [0] * n_words
    for r in bits.collect():
        words[r["word_idx"]] = r["word"]
    return words


def bloom_prune(
    df: DataFrame,
    column: str,
    words: list[int],
    n_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Rows of ``df`` whose ``column`` value MIGHT be in the filtered set
    (all ``n_hashes`` bits set) — a pre-filter with zero false negatives,
    so ``exact_join(bloom_prune(probe), corpus)`` equals
    ``exact_join(probe, corpus)`` row for row. At 100 TB this is the
    difference between shuffling the full probe corpus into a
    contamination join and shuffling only the ~fpp fraction that could
    match.

    The word array rides in as a BROADCAST single-row DataFrame (not a
    literal): the filter is stored once per executor and codegen
    references it as one attribute, so expression size stays constant no
    matter how large the filter — the probe stays a map-only stage (a
    broadcast nested-loop join of a 1-row build side)."""
    spark = df.sparkSession
    words_df = spark.createDataFrame(
        [(list(words),)], "__bwords array<bigint>"
    )
    out = df.filter(F.col(column).isNotNull()).crossJoin(
        F.broadcast(words_df)
    )
    cond = None
    for i in range(n_hashes):
        out = out.withColumn(
            f"__bp{i}", _bloom_pos(F.col(column), i, n_bits)
        )
        test = F.expr(
            f"(element_at(__bwords, CAST(__bp{i} DIV 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST(pmod(__bp{i}, 64) AS INT))) != 0"
        )
        cond = test if cond is None else cond & test
    return out.filter(cond).drop(
        "__bwords", *[f"__bp{i}" for i in range(n_hashes)]
    )


# ---------------------------------------------------------------------------
# Count-min sketch: point-frequency estimation + heavy hitters
# ---------------------------------------------------------------------------
# The frequency-domain twin of KMV: a (depth x width) grid of counters,
# mergeable by plain addition, answering "how often did item X occur" with
# one-sided error (never an undercount; overcount bounded by 2N/width with
# probability 1 - 2^-depth). Like KMV it is built from md5 + modular
# arithmetic only, so DuckDB reproduces it bit-identically for the oracle.
#
# 100 TB shape: the corpus-sized work is ONE word-count aggregate (map-side
# combined); the sketch itself is a depth*width-row table (4x512 default =
# 2048 rows) that broadcasts everywhere, merges across corpora/days by
# unionByName+sum, and answers point queries with a broadcast join — no
# second corpus scan, ever.

CMS_DEPTH = 4
CMS_WIDTH = 512


def _cms_bucket(item: Column, d: Column, width: int) -> Column:
    """Row d's bucket for an item: first 8 md5 hex chars of ``item#d`` as
    an int, mod width — non-negative, identical in Spark and DuckDB."""
    hexpfx = F.substring(
        F.md5(F.concat(item.cast("string"), F.lit("#"), d.cast("string"))),
        1,
        8,
    )
    return F.conv(hexpfx, 16, 10).cast("bigint") % F.lit(width)


def _cms_bucket_sql(item: str, d: str, width: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({item} AS VARCHAR) || '#' || "
        f"CAST({d} AS VARCHAR)), 1, 8)) AS BIGINT) % {width}"
    )


def cms_build(
    df: DataFrame,
    item_col: str,
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: a (d int, bucket bigint, cnt bigint) DataFrame
    with depth*width rows at most. NULL items are ignored (COUNT
    semantics). When ``weight_col`` is given the input is treated as
    pre-aggregated (item, weight) pairs — the cheap path when the caller
    already has a word count — otherwise occurrences are counted here.

    The corpus-sized aggregate happens BEFORE the depth-explode: rows are
    first reduced to per-item totals (vocabulary-sized), and only that
    reduction is replicated depth times. Sketches over disjoint corpora
    merge with ``cms_merge`` — addition, the reason CMS works on a
    1000-executor job."""
    per_item = (
        df.filter(F.col(item_col).isNotNull())
        .groupBy(item_col)
        .agg(
            (
                F.sum(weight_col) if weight_col else F.count(F.lit(1))
            ).alias("__cms_w")
        )
    )
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    return (
        per_item.select(F.col(item_col).alias("__cms_item"), "__cms_w")
        .select("__cms_item", "__cms_w", d)
        .select(
            "d",
            _cms_bucket(F.col("__cms_item"), F.col("d"), width).alias(
                "bucket"
            ),
            F.col("__cms_w").alias("__cms_w"),
        )
        .groupBy("d", "bucket")
        .agg(F.sum("__cms_w").cast("bigint").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch of the union of the two inputs' corpora (same depth/width):
    counter-wise addition."""
    return (
        a.unionByName(b)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-frequency estimates for every probe row: min over the depth
    counters the item hashes to. All probe columns survive; probe rows
    must be unique per item. The sketch side is <= depth*width rows and
    broadcasts into the join; absent buckets count 0 (item never seen)."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    keyed = probes.select("*", d).withColumn(
        "bucket", _cms_bucket(F.col(item_col), F.col("d"), width)
    )
    joined = keyed.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return (
        joined.groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )


def cms_sketch_sql(
    item_expr: str,
    from_clause: str,
    weight_expr: str = "COUNT(*)",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB CTE body reproducing cms_build over ``from_clause`` (which
    must yield one row per occurrence, or per item with ``weight_expr``
    as the per-item total after the inner GROUP BY)."""
    return f"""
  SELECT d, {_cms_bucket_sql("item", "d", width)} AS bucket,
         CAST(SUM(w) AS BIGINT) AS cnt
  FROM (SELECT {item_expr} AS item, {weight_expr} AS w
        FROM {from_clause}
        WHERE {item_expr} IS NOT NULL GROUP BY 1) per_item,
       range({depth}) t(d)
  GROUP BY 1, 2
"""
