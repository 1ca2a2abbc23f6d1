"""JSONL source/sink: explicit-schema reads, corrupt-line quarantine,
round-trip, landing-zone conversion."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from market_flow_spark.sources import jsonl_source as J


def _write_lines(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_read_jsonl_clean_and_lineage(spark, tmp_path):
    p = tmp_path / "a.jsonl"
    _write_lines(
        p,
        [json.dumps({"doc_id": i, "text": f"doc {i}"}) for i in range(5)],
    )
    df = J.read_jsonl(spark, str(p), "doc_id BIGINT, text STRING")
    rows = df.collect()
    assert len(rows) == 5
    assert all(r._filename == "a.jsonl" for r in rows)
    assert all(r._corrupt_record is None for r in rows)


def test_corrupt_lines_are_quarantined_not_dropped(spark, tmp_path):
    p = tmp_path / "b.jsonl"
    _write_lines(
        p,
        [
            json.dumps({"doc_id": 1, "text": "ok"}),
            "{not valid json",
            json.dumps({"doc_id": 2, "text": "also ok"}),
            "]]",
        ],
    )
    df = J.read_jsonl(spark, str(p), "doc_id BIGINT, text STRING")
    clean, bad = J.split_corrupt(df)
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2]
    bad_rows = bad.collect()
    assert len(bad_rows) == 2
    assert {r.raw_line for r in bad_rows} == {"{not valid json", "]]"}
    # clean frame no longer carries the quarantine column
    assert J.CORRUPT_COL not in clean.columns


def test_jsonl_roundtrip(spark, tmp_path):
    src = spark.range(10).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), "id").alias("text")
    )
    out = str(tmp_path / "out")
    J.write_jsonl(src, out)
    back = J.read_jsonl(
        spark, out, "doc_id BIGINT, text STRING", with_lineage=False
    )
    clean, bad = J.split_corrupt(back)
    assert bad.count() == 0
    assert sorted(map(tuple, clean.collect())) == sorted(map(tuple, src.collect()))


def test_jsonl_to_parquet_conversion_with_quarantine(spark, tmp_path):
    p = tmp_path / "c.jsonl"
    _write_lines(
        p,
        [json.dumps({"doc_id": i, "text": "x"}) for i in range(8)]
        + ["oops", json.dumps({"doc_id": 99, "text": "y"})],
    )
    dest = str(tmp_path / "pq")
    quar = str(tmp_path / "quarantine")
    n_clean, n_bad = J.jsonl_to_parquet(
        spark, str(p), dest, "doc_id BIGINT, text STRING", quarantine=quar
    )
    assert (n_clean, n_bad) == (9, 1)
    assert spark.read.parquet(dest).count() == 9
    quarantined = spark.read.json(quar)
    assert quarantined.count() == 1


def test_read_jsonl_missing_and_extra_fields(spark, tmp_path):
    """Schema projection: missing fields -> NULL, unknown fields ignored —
    both CLEAN rows (raw-layer best-effort), not quarantine cases."""
    p = tmp_path / "d.jsonl"
    _write_lines(
        p,
        [
            json.dumps({"doc_id": 1}),
            json.dumps({"doc_id": 2, "text": "x", "extra": 9}),
        ],
    )
    clean, bad = J.split_corrupt(
        J.read_jsonl(spark, str(p), "doc_id BIGINT, text STRING")
    )
    assert bad.count() == 0
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert rows == {1: None, 2: "x"}


def test_quarantine_filter_needs_no_cache(spark, tmp_path):
    """The point of the text+from_json design: filtering on the corrupt
    column works on the UNCACHED lazy plan (the native JSON reader's
    internal _corrupt_record pseudo-column raises AnalysisException
    here — QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
    p = tmp_path / "e.jsonl"
    _write_lines(p, ["nope", json.dumps({"doc_id": 1, "text": "a"})])
    df = J.read_jsonl(spark, str(p), "doc_id BIGINT, text STRING")
    # no .cache() anywhere; both filters execute
    assert df.filter(F.col(J.CORRUPT_COL).isNotNull()).count() == 1
    assert df.filter(F.col(J.CORRUPT_COL).isNull()).count() == 1


def test_gzip_roundtrip(spark, tmp_path):
    import glob
    import gzip

    src = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    out = str(tmp_path / "gz")
    J.write_jsonl(src, out, compression="gzip")
    gz = glob.glob(out + "/*.json.gz")
    assert gz, "expected gzip part files"
    texts = []
    for part in gz:  # some part files may be empty splits
        with gzip.open(part, "rt") as fh:
            texts += [json.loads(ln)["text"] for ln in fh if ln.strip()]
    assert sorted(texts) == ["alpha", "beta"]
    clean, bad = J.split_corrupt(
        J.read_jsonl(spark, out, "doc_id BIGINT, text STRING")
    )
    assert bad.count() == 0
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}


def test_infer_schema_bounded_sample(spark, tmp_path):
    p = tmp_path / "f.jsonl"
    _write_lines(
        p, [json.dumps({"doc_id": i, "score": i / 2}) for i in range(50)]
    )
    schema = J.infer_jsonl_schema(spark, str(p), sample_lines=10)
    assert dict((f.name, f.dataType.simpleString()) for f in schema.fields) == {
        "doc_id": "bigint",
        "score": "double",
    }
