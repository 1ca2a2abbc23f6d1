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


def _probe_head_encoding(
    head: bytes, truncated: bool, encodings: tuple[str, ...]
) -> str | None:
    """First encoding that cleanly decodes `head`.

    Uses an incremental decoder with ``final=not truncated`` so a valid
    multi-byte sequence split at the probe boundary of a larger file is NOT
    misreported as a decode failure (it is simply carried-over decoder
    state); only when the head is the whole file is a dangling partial
    sequence an error. latin1/iso-8859-1 accept every byte, so the
    reference's chain always terminates.
    """
    import codecs

    for enc in encodings:
        try:
            codecs.getincrementaldecoder(enc)(errors="strict").decode(
                head, final=not truncated
            )
        except UnicodeDecodeError:
            continue
        return enc
    return None


def _probe_file_encoding(
    path: str, probe_bytes: int, encodings: tuple[str, ...]
) -> str | None:
    """Read a bounded head of `path` and classify its encoding.

    Plain function of (path, config) so it runs identically on the driver
    (small N) and inside an executor task (large N) — the landing zone is
    shared storage on a real cluster, so executors see the same paths.
    """
    with open(path, "rb") as fh:
        head = fh.read(probe_bytes + 1)
    truncated = len(head) > probe_bytes
    return _probe_head_encoding(head[:probe_bytes], truncated, encodings)


def read_csv_with_encoding_fallback(
    spark: SparkSession,
    paths: list[str] | str,
    encodings: tuple[str, ...] = ("UTF-8", "latin1", "iso-8859-1"),
    strip_non_ascii: bool = False,
    probe_bytes: int = 1 << 20,
    distributed_probe_threshold: int = 64,
) -> DataFrame:
    """S2: per-file encoding recovery, the Spark re-expression of the
    reference's utf-8 → latin1 → iso-8859-1 retry loop
    (/root/reference/utils/csv_utils.py:9-18).

    Spark's CSV reader takes ONE encoding per read, so files are first
    grouped by the first encoding that cleanly decodes a bounded probe of
    the file head (latin1 accepts every byte sequence, so the chain always
    terminates), then ONE spark.read runs per encoding group and the
    groups union — per-file recovery without per-file Spark jobs. The
    probe is bounded (`probe_bytes`); for small file counts it runs as a
    driver loop, and from `distributed_probe_threshold` files up it fans
    out as one Spark job over the path list (each task probing its slice
    of files), so a 10⁶-file landing zone costs one parallel pass instead
    of hours of serial driver I/O. A bad byte past the probe window
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
    if len(paths) >= distributed_probe_threshold:
        sc = spark.sparkContext
        n_slices = max(1, min(len(paths) // 8, sc.defaultParallelism * 4))
        pb, encs = probe_bytes, tuple(encodings)
        probed = (
            sc.parallelize(paths, n_slices)
            .map(lambda p: (p, _probe_file_encoding(p, pb, encs)))
            .collect()
        )
    else:
        probed = [
            (p, _probe_file_encoding(p, probe_bytes, encodings)) for p in paths
        ]
    groups: dict[str, list[str]] = {}
    for p, enc in probed:
        if enc is None:
            raise ValueError(f"could not decode {p} with any of {encodings}")
        groups.setdefault(spark_charset.get(enc.lower(), enc), []).append(p)
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
