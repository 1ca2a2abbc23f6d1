"""JSONL source tier (sources/jsonl_source.py): schema-projected read,
corrupt-row quarantine without caching, bounded-sample inference, sink
round-trip, and lineage composition."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from market_flow_spark.sources.csv_source import with_lineage
from market_flow_spark.sources.jsonl_source import (
    infer_jsonl_schema,
    read_jsonl,
    split_quarantine,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def _write_lines(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_read_jsonl_clean_and_corrupt(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    _write_lines(
        p,
        [
            json.dumps({"doc_id": 1, "text": "hello world", "lang": "en"}),
            "",  # blank: dropped, not quarantined
            '{"doc_id": 2, "text": "broken',  # truncated JSON
            "not json at all",
            json.dumps({"doc_id": 3, "text": "ok", "lang": "de"}),
        ],
    )
    df = read_jsonl(spark, str(p), SCHEMA)
    assert [f.name for f in df.schema.fields] == [
        "doc_id",
        "text",
        "lang",
        "_corrupt_record",
    ]
    clean, bad = split_quarantine(df)
    got = {r["doc_id"]: r["lang"] for r in clean.collect()}
    assert got == {1: "en", 3: "de"}
    assert "_corrupt_record" not in clean.columns
    bad_lines = sorted(r["line"] for r in bad.collect())
    assert bad_lines == sorted(
        ['{"doc_id": 2, "text": "broken', "not json at all"]
    )


def test_read_jsonl_missing_and_extra_fields(spark, tmp_path):
    """Schema projection: missing fields -> NULL, unknown fields ignored —
    both are clean rows (the raw-layer best-effort contract), not
    quarantine cases."""
    p = tmp_path / "docs.jsonl"
    _write_lines(
        p,
        [
            json.dumps({"doc_id": 1}),  # text, lang missing
            json.dumps({"doc_id": 2, "text": "x", "lang": "en", "extra": 9}),
        ],
    )
    clean, bad = split_quarantine(read_jsonl(spark, str(p), SCHEMA))
    assert bad.count() == 0
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in clean.collect()}
    assert rows == {1: (None, None), 2: ("x", "en")}


def test_schema_must_not_carry_corrupt_column(spark):
    import pytest

    s = T.StructType([T.StructField("_corrupt_record", T.StringType(), True)])
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, "/nonexistent", s)


def test_infer_schema_bounded_sample(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    _write_lines(
        p,
        [json.dumps({"doc_id": i, "score": i / 2}) for i in range(50)],
    )
    schema = infer_jsonl_schema(spark, str(p), sample_lines=10)
    assert {f.name for f in schema.fields} == {"doc_id", "score"}
    assert dict((f.name, f.dataType.simpleString()) for f in schema.fields) == {
        "doc_id": "bigint",
        "score": "double",
    }


def test_write_jsonl_roundtrip_gzip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "alpha", "en"), (2, "beta", "de")], "doc_id long, text string, lang string"
    )
    out = str(tmp_path / "out")
    write_jsonl(src, out, compression="gzip")
    import glob

    gz = glob.glob(out + "/*.json.gz")
    assert gz, "expected gzip part files"
    texts = []
    for part in gz:  # some part files may be empty splits
        with gzip.open(part, "rt") as fh:
            texts += [json.loads(ln)["text"] for ln in fh if ln.strip()]
    assert sorted(texts) == ["alpha", "beta"]
    back = read_jsonl(spark, out, SCHEMA)
    clean, bad = split_quarantine(back)
    assert bad.count() == 0
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}


def test_jsonl_with_lineage_and_keep_raw(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    line = json.dumps({"doc_id": 7, "text": "t", "lang": "en"})
    _write_lines(p, [line])
    df = with_lineage(read_jsonl(spark, str(p), SCHEMA, keep_raw=True))
    row = df.collect()[0]
    assert row["_raw_line"] == line
    assert row["_filename"] == "docs.jsonl"
    assert row["_loaded_at"] is not None


def test_quarantine_filter_needs_no_cache(spark, tmp_path):
    """The whole point of the from_json design: filtering on the corrupt
    column works on the UNCACHED lazy plan (the native reader's internal
    _corrupt_record pseudo-column raises AnalysisException here)."""
    p = tmp_path / "docs.jsonl"
    _write_lines(p, ["nope", json.dumps({"doc_id": 1, "text": "a", "lang": "x"})])
    df = read_jsonl(spark, str(p), SCHEMA)
    # no .cache() anywhere; both filters execute
    assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    assert df.filter(F.col("_corrupt_record").isNull()).count() == 1
