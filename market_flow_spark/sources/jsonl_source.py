"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
LLM-training-corpus interchange (every public web-text release ships as
.jsonl/.jsonl.gz). The reference has no JSON ingestion (its raw inputs are
CSV + REST APIs, dags/raw/ingest_kaggle_data.py:122-149); this extends the
source surface per the north-star contract with the same conventions as
the CSV path: explicit schemas (no inference scan at scale), quarantined
corrupt records instead of job failure, lineage columns at the read.

Scale notes:
- an explicit schema skips Spark's whole-file inference pass — at 100 TB,
  schema inference is a full extra read of the corpus;
- PERMISSIVE + `columnNameOfCorruptRecord` routes undecodable lines into a
  quarantine column instead of failing the load mid-corpus; the reader
  then splits good/bad in ONE pass (the corrupt column is NULL for clean
  rows) so malformed lines are auditable, never silently dropped;
- .jsonl.gz files are non-splittable (one task per file) — re-shard via
  `spread_to_cores` upstream of CPU-heavy stages, or write uncompressed /
  zstd-parquet out of the landing zone as fast as possible (what
  `jsonl_to_parquet` is for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def infer_jsonl_schema(
    spark: SparkSession, path: str | list[str], sample_lines: int = 10_000
) -> T.StructType:
    """Infer a schema from a BOUNDED head sample of the files — the
    interactive companion to the explicit-schema scale path (never scans
    past ``sample_lines`` lines, vs. the JSON reader's whole-corpus
    inference pass). Feed the result to ``read_jsonl`` after review."""
    sample = spark.read.text(path).limit(sample_lines)
    return spark.read.json(sample.rdd.map(lambda r: r[0])).schema


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | str,
    with_lineage: bool = True,
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema; malformed lines
    land in `_corrupt_record` with every data column NULL.
    `schema` may be a DDL string ("doc_id BIGINT, text STRING").

    Implemented as a text scan + `from_json` rather than `spark.read.json`:
    JSONL is by definition one object per line, so the line scan loses
    nothing, and parsing as an expression (a) sidesteps the JSON reader's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction without the documented
    `.cache()` workaround (caching a 100 TB scan is not a fix), and (b)
    keeps the raw line available to the quarantine path for free."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    fields = [f.name for f in schema.fields if f.name != CORRUPT_COL]
    if CORRUPT_COL not in [f.name for f in schema.fields]:
        schema = schema.add(T.StructField(CORRUPT_COL, T.StringType(), True))
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__j"),
        F.col("value").alias("__raw"),
    )
    # from_json flags malformed input in the corrupt field; a line whose
    # parse returns no struct at all (whitespace/empty) is also corrupt
    corrupt = F.when(F.col("__j").isNull(), F.col("__raw")).otherwise(
        F.col(f"__j.{CORRUPT_COL}")
    )
    df = parsed.select(
        *[F.col(f"__j.{f}").alias(f) for f in fields],
        corrupt.alias(CORRUPT_COL),
    )
    if with_lineage:
        df = df.withColumns(
            {
                "_filename": F.element_at(F.split(F.input_file_name(), "/"), -1),
                "_loaded_at": F.current_timestamp(),
            }
        )
    return df


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the corrupt column dropped, and
    the corrupt lines with their raw text for auditing. One filter each
    over the same scan — Spark reuses the read."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line"),
        *[c for c in df.columns if c.startswith("_") and c != CORRUPT_COL],
    )
    return clean, bad


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = None
) -> None:
    """Write newline-delimited JSON (one object per line). `compression`
    e.g. 'gzip'/'zstd'; note compressed JSONL is non-splittable on read —
    prefer parquet for anything re-read by Spark."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def jsonl_to_parquet(
    spark: SparkSession,
    src: str | list[str],
    dest: str,
    schema: T.StructType | str,
    quarantine: str | None = None,
) -> tuple[int, int]:
    """Landing-zone conversion: JSONL in, parquet out, corrupt lines to a
    quarantine path (if given). Returns (clean_rows, corrupt_rows) — the
    counts a load audit records. This is the 'get out of JSONL fast' step
    that makes everything downstream splittable and column-prunable."""
    clean, bad = split_corrupt(read_jsonl(spark, src, schema))
    clean.write.mode("overwrite").parquet(dest)
    n_bad = bad.count()
    if quarantine is not None and n_bad:
        bad.write.mode("overwrite").json(quarantine)
    n_clean = spark.read.parquet(dest).count()
    return n_clean, n_bad
