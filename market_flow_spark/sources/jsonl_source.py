"""JSONL (newline-delimited JSON) ingestion — the LLM-corpus native
format (web crawls, instruction datasets, and model outputs all land as
one-JSON-object-per-line files).

The reference has no JSON ingest path (its raw layer is CSV-only,
dags/raw/ingest_kaggle_data.py); this tier applies the same raw-layer
contract to JSONL: explicit schema (no inference scan), best-effort
per-row recovery instead of job failure, lineage columns, and a sink.

Design notes (Spark-first, 100 TB shape):

- The reader is ``spark.read.text`` + ``from_json`` rather than
  ``spark.read.json``. Two reasons. First, an explicit schema plus
  ``from_json`` keeps parsing inside whole-stage codegen with zero
  inference pass. Second, malformed-row capture: the native reader's
  ``_corrupt_record`` is an internal pseudo-column that cannot be
  filtered without caching the whole load (Spark raises
  AnalysisException otherwise); parsing the line column with a schema
  that CONTAINS the corrupt-record field makes quarantine a plain
  computed-column filter — no cache, no second scan semantics, works
  identically on a 100 TB landing zone.
- Schema is required for the scale path. ``infer_jsonl_schema`` exists
  for interactive use and infers from a BOUNDED head sample (default
  10k lines), never the full corpus.
- Quarantine split is two filters over one text scan — each side is
  predicate-pushdown friendly, and the good side drops the raw line so
  downstream plans never carry corpus-sized strings they don't need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"
_RAW = "_raw_line"


def infer_jsonl_schema(
    spark: SparkSession, path: str | list[str], sample_lines: int = 10_000
) -> T.StructType:
    """Infer a schema from a bounded head sample of the files — the
    interactive companion to the explicit-schema scale path. Never scans
    past ``sample_lines`` lines."""
    sample = spark.read.text(path).limit(sample_lines)
    return spark.read.json(sample.rdd.map(lambda r: r[0])).schema


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    keep_raw: bool = False,
) -> DataFrame:
    """Schema-projected JSONL read with per-row corrupt capture.

    Returns one column per ``schema`` field plus ``_corrupt_record``
    (NULL for clean rows, the verbatim line for malformed ones — same
    contract as Spark's PERMISSIVE mode, minus its filter-needs-cache
    restriction). ``keep_raw`` additionally carries the raw line for
    every row (audit/replay use; off by default so the parsed relation
    never drags corpus-sized strings through downstream shuffles).
    Blank lines are dropped (the JSONL convention), not quarantined.
    """
    if any(f.name == _CORRUPT for f in schema.fields):
        raise ValueError(f"schema must not already contain {_CORRUPT}")
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    lines = (
        spark.read.text(path)
        .withColumnRenamed("value", _RAW)
        .filter(F.trim(F.col(_RAW)) != "")
    )
    parsed = lines.withColumn(
        "_parsed",
        F.from_json(
            F.col(_RAW),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ),
    )
    cols = [F.col(f"_parsed.{f.name}").alias(f.name) for f in schema.fields]
    # from_json yields a NULL struct (not a populated corrupt field) for
    # lines that aren't JSON at all — fold both shapes into one signal
    corrupt = F.when(
        F.col("_parsed").isNull() | F.col(f"_parsed.{_CORRUPT}").isNotNull(),
        F.col(_RAW),
    ).alias(_CORRUPT)
    keep = cols + [corrupt] + ([F.col(_RAW)] if keep_raw else [])
    return parsed.select(*keep)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) from a ``read_jsonl`` result: clean rows with
    the corrupt column dropped, quarantined rows as (line, lineage-ready)
    for a dead-letter sink. Plain filters — no cache required."""
    clean = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("line")
    )
    return clean, bad


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None
) -> None:
    """JSONL sink (one JSON object per line, the format's write half).
    ``compression`` passes through to the writer (e.g. ``gzip`` — a
    training-data export is usually shipped compressed)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
