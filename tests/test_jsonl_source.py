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
