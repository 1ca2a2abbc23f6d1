"""Spark 4 Python DataSource connector: batch read, planned parallelism,
page-filter pushdown with partition-level fetch accounting, retry on
transient failure, and the streaming tail with page offsets."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from market_flow_spark.sources.fake_api import CURRENCIES, fx_rates
from market_flow_spark.sources.pyds import PagedApiDataSource

SCHEMA = "page int, day int, currency string, rate double"


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(PagedApiDataSource)
    # engine sessions (session.py) set this at build time; the shared test
    # session may predate it, and it's a plan-time conf, so set it here too
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark


def _reader(spark, **opts):
    r = (
        spark.read.format("paged_api")
        .option("fetcher", "market_flow_spark.sources.fake_api:fx_rates")
        .option("page_size", "20")
        .option("pages", "8")
        .schema(SCHEMA)
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r


def test_batch_read_matches_fetcher_and_parallelism(registered):
    df = _reader(registered).load()
    rows = {(r.page, r.day, r.currency): r.rate for r in df.collect()}
    assert len(rows) == 8 * 20
    # value-exact vs the fetcher contract
    for r in fx_rates(3, 20):
        assert rows[(3, r["day"], r["currency"])] == r["rate"]
    # one task per page — planned parallelism, no mapInPandas scaffolding
    assert df.rdd.getNumPartitions() == 8


def test_page_filter_pushdown_prunes_fetches(registered, tmp_path):
    log = tmp_path / "fetchlog"
    log.mkdir()
    df = _reader(registered, log_dir=str(log)).load().filter(F.col("page") == 3)
    assert df.count() == 20
    fetched = sorted(os.listdir(log))
    assert fetched == ["fetched_3"]  # 7 of 8 pages never fetched

    log2 = tmp_path / "fetchlog2"
    log2.mkdir()
    df2 = (
        _reader(registered, log_dir=str(log2))
        .load()
        .filter((F.col("page") >= 5) & (F.col("page") < 7))
    )
    assert df2.count() == 40
    assert sorted(os.listdir(log2)) == ["fetched_5", "fetched_6"]


def test_unhandled_filters_still_apply(registered):
    """Filters the source can't consume (non-page columns) are returned to
    Spark and enforced post-scan — correctness never depends on pushdown."""
    df = _reader(registered).load().filter(F.col("currency") == "EUR")
    got = df.select("currency").distinct().collect()
    assert [r.currency for r in got] == ["EUR"]
    assert df.count() == 8 * 20 // len(CURRENCIES)


def test_retry_survives_transient_failure(registered, tmp_path):
    import json

    marker = tmp_path / "markers"
    marker.mkdir()
    df = (
        registered.read.format("paged_api")
        .option("fetcher", "market_flow_spark.sources.fake_api:flaky_fx_rates")
        .option("fetcher_args", json.dumps({"marker_dir": str(marker)}))
        .option("page_size", "10")
        .option("pages", "2")
        .option("backoff", "0.01")
        .schema(SCHEMA)
        .load()
    )
    assert df.count() == 20
    # both pages recorded a failed first attempt before succeeding
    assert sorted(os.listdir(marker)) == ["attempt_0", "attempt_1"]


def test_streaming_pages_as_offsets(registered, tmp_path):
    """readStream over the same endpoint: offsets are page numbers; an
    availableNow run drains exactly `pages` pages through the checkpoint
    and a second run adds nothing (offset persisted)."""
    out = {}

    def sink(batch_df, epoch_id):
        out.setdefault("rows", []).extend(batch_df.collect())

    stream = (
        registered.readStream.format("paged_api")
        .option("fetcher", "market_flow_spark.sources.fake_api:fx_rates")
        .option("page_size", "5")
        .option("pages", "4")
        .option("pages_per_batch", "2")
        .schema(SCHEMA)
        .load()
    )
    import time as _time

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = _time.monotonic() + 120
        while len(out.get("rows", [])) < 4 * 5 and _time.monotonic() < deadline:
            _time.sleep(0.5)
    finally:
        q.stop()
    assert len(out["rows"]) == 4 * 5  # bounded: page limit stops emission
    assert {r.page for r in out["rows"]} == {0, 1, 2, 3}

    # restart from the same checkpoint: offset persisted, nothing re-fetched
    out2 = {}

    def sink2(batch_df, epoch_id):
        out2.setdefault("rows", []).extend(batch_df.collect())

    q2 = (
        stream.writeStream.foreachBatch(sink2)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        _time.sleep(3)
    finally:
        q2.stop()
    assert not out2.get("rows")
