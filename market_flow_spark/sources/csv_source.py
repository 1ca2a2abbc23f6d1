"""CSV ingestion operators (SURVEY.md §2.1 S1-S5).

The reference's raw layer loads every CSV all-varchar with full-scan
inference (`read_csv_auto(..., all_varchar=true, sample_size=-1)`,
dags/raw/ingest_kaggle_data.py:132-134), pre-cleans encodings
(utils/csv_utils.py:4-34), injects lineage columns (:126-149), and
bootstraps tables create-if-absent (:122-149). Spark equivalents:

- all-varchar = header-driven all-StringType schema (typing is deferred to
  staging, exactly like the reference — SURVEY §1.2);
- lineage = input_file_name()/current_timestamp() expressions;
- create-if-absent append = catalog guard + saveAsTable(mode=append);
- column-name normalization ports scripts/columns_parser.py:6-19.

At 100 TB the reader is unchanged: an explicit StringType schema means no
inference scan, and the lineage columns are per-row expressions with no
shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from market_flow_spark.functions.cleaning import ascii_strip


def normalize_column_name(name: str) -> str:
    """Lowercase, spaces→underscores, strip specials, `col_` prefix for a
    leading digit (scripts/columns_parser.py:6-19)."""
    out = name.strip().lower().replace(" ", "_")
    out = re.sub(r"[^a-z0-9_]", "", out)
    if out and out[0].isdigit():
        out = f"col_{out}"
    return out or "unnamed"


def all_varchar_schema(columns: list[str]) -> T.StructType:
    """All-StringType schema from a header row — the raw layer's contract."""
    return T.StructType(
        [T.StructField(normalize_column_name(c), T.StringType(), True) for c in columns]
    )


def read_csv_all_varchar(
    spark: SparkSession,
    path: str | list[str],
    encoding: str = "UTF-8",
    strip_non_ascii: bool = False,
) -> DataFrame:
    """S1+S2: header CSV → all-string DataFrame with normalized column
    names; optional non-ASCII strip replaces the reference's pandas
    re-encode pass (F9) with a codegen regex."""
    raw = (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("encoding", encoding)
        .csv(path)
    )
    renames = {c: normalize_column_name(c) for c in raw.columns}
    df = raw.withColumnsRenamed(renames)
    if strip_non_ascii:
        df = df.withColumns({c: ascii_strip(F.col(c)) for c in df.columns})
    return df


def read_csv_with_encoding_fallback(
    spark: SparkSession,
    paths: list[str] | str,
    encodings: tuple[str, ...] = ("UTF-8", "latin1", "iso-8859-1"),
    strip_non_ascii: bool = False,
    probe_bytes: int = 1 << 20,
) -> DataFrame:
    """S2: per-file encoding recovery, the Spark re-expression of the
    reference's utf-8 → latin1 → iso-8859-1 retry loop
    (/root/reference/utils/csv_utils.py:9-18).

    Spark's CSV reader takes ONE encoding per read, so files are first
    grouped by the first encoding that cleanly decodes a bounded probe of
    the file head (latin1 accepts every byte sequence, so the chain always
    terminates), then ONE spark.read runs per encoding group and the
    groups union — per-file recovery without per-file Spark jobs. The
    probe is bounded (`probe_bytes`) and driver-side, mirroring the
    listing the reader itself performs; a bad byte past the probe window
    degrades to the reader's PERMISSIVE replacement-char behavior rather
    than failing the load, which is the reference's best-effort contract.
    """
    if isinstance(paths, str):
        import glob
        import os

        paths = (
            sorted(glob.glob(os.path.join(paths, "*.csv")))
            if os.path.isdir(paths)
            else [paths]
        )
    # python codec aliases → the canonical charset names Spark 4 validates
    spark_charset = {"latin1": "iso-8859-1", "latin-1": "iso-8859-1"}
    groups: dict[str, list[str]] = {}
    for p in paths:
        with open(p, "rb") as fh:
            head = fh.read(probe_bytes)
        for enc in encodings:
            try:
                head.decode(enc)
            except UnicodeDecodeError:
                continue
            groups.setdefault(spark_charset.get(enc.lower(), enc), []).append(p)
            break
        else:
            raise ValueError(f"could not decode {p} with any of {encodings}")
    out: DataFrame | None = None
    for enc, files in groups.items():
        df = read_csv_all_varchar(
            spark, files, encoding=enc, strip_non_ascii=strip_non_ascii
        )
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    if out is None:
        raise ValueError("no input files")
    return out


def with_lineage(df: DataFrame, source_path: str | None = None) -> DataFrame:
    """S3: audit/lineage columns (`_filename`, `_loaded_at`, `_source_path`
    — ingest_kaggle_data.py:126-149)."""
    return df.withColumns(
        {
            "_filename": F.element_at(F.split(F.input_file_name(), "/"), -1),
            "_source_path": F.lit(source_path)
            if source_path is not None
            else F.input_file_name(),
            "_loaded_at": F.current_timestamp(),
        }
    )


def create_if_absent_append(df: DataFrame, table: str) -> None:
    """S4: idempotent bootstrap-then-append (the reference's
    `CREATE TABLE ... WHERE 1=0` + INSERT idiom becomes a catalog guard)."""
    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        df.write.mode("append").saveAsTable(table)
    else:
        df.write.saveAsTable(table)
