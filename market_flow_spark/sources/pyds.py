"""Spark 4 Python DataSource API connector for paged REST endpoints.

`api_source.py` models the reference's REST connectors (SURVEY §2.1 S6;
`api/weather_api.py:25-109`, `dags/raw/fetch_currencies.py:74-150`) as
helper functions. This module is the IDIOMATIC Spark 4 form of the same
capability: a registered `DataSource`, so a paged API becomes a real
table —

    spark.dataSource.register(PagedApiDataSource)
    df = (spark.read.format("paged_api")
          .option("fetcher", "market_flow_spark.sources.fake_api:fx_rates")
          .option("pages", 8).option("page_size", 100)
          .schema("page int, day int, currency string, rate double")
          .load())

and gains what the helper functions never had:

- **planned parallelism**: `partitions()` returns one InputPartition per
  page, so a 10⁶-page backfill fans out across the cluster with no
  mapInPandas scaffolding, and Spark retries a failed page as a task
  retry;
- **partition pruning via filter pushdown**: `pushFilters` consumes
  predicates on the `page` column (=, <, <=, >, >=, IN) and drops the
  matching pages from `partitions()` — a `WHERE page = 3` query fetches
  ONE page, verified by partition-level fetch accounting in tests;
- **rate limiting per task** and retry with exponential backoff inside
  `read()`, same policy as `api_source.fetch_with_retry`;
- **a streaming tail** (`simpleStreamReader`): offsets are page numbers,
  each microbatch fetches the next pages, so the same endpoint is also
  an incremental `readStream` source with exactly-once page accounting
  handled by the checkpoint.

The fetcher is configured as an importable `module:callable` string
(options are strings by contract) — exactly how a production connector
names its endpoint adapter; the in-repo deterministic fake stands in for
HTTP, which is absent from this environment.
"""

from __future__ import annotations

import importlib
import os
import time
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)


def _resolve_fetcher(opts):
    """`fetcher` is an importable "module:callable"; `fetcher_args` is an
    optional JSON object passed as keyword args (endpoint URL, auth
    profile name, test instrumentation paths — options are strings by
    contract, and executor processes don't see driver env mutations)."""
    spec = opts["fetcher"]
    mod, _, fn = spec.partition(":")
    fetcher = getattr(importlib.import_module(mod), fn)
    raw = opts.get("fetcher_args")
    if raw:
        import json

        kwargs = json.loads(raw)
        return lambda page, page_size: fetcher(page, page_size, **kwargs)
    return fetcher


def _fetch_page_with_retry(
    fetcher, page: int, page_size: int, retries: int, backoff: float
) -> list[dict]:
    for attempt in range(retries):
        try:
            return fetcher(page, page_size)
        except Exception:
            if attempt == retries - 1:
                raise
            time.sleep(backoff * (2**attempt))
    return []


class PageParts(InputPartition):
    def __init__(self, page: int) -> None:
        self.page = page


class PagedApiReader(DataSourceReader):
    def __init__(self, schema, options) -> None:
        self.schema = schema
        self.options = options
        self.pages = list(range(int(options.get("pages", "1"))))

    # -- pruning ----------------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume page-column predicates by shrinking the page list; every
        other filter is returned for Spark to evaluate post-scan. The AND
        semantics make each handled filter an independent refinement."""
        for f in filters:
            handled = False
            attr = getattr(f, "attribute", None)
            if attr == ("page",):
                v = getattr(f, "value", None)
                if isinstance(f, EqualTo):
                    self.pages = [p for p in self.pages if p == v]
                    handled = True
                elif isinstance(f, In):
                    allowed = set(v)
                    self.pages = [p for p in self.pages if p in allowed]
                    handled = True
                elif isinstance(f, LessThan):
                    self.pages = [p for p in self.pages if p < v]
                    handled = True
                elif isinstance(f, LessThanOrEqual):
                    self.pages = [p for p in self.pages if p <= v]
                    handled = True
                elif isinstance(f, GreaterThan):
                    self.pages = [p for p in self.pages if p > v]
                    handled = True
                elif isinstance(f, GreaterThanOrEqual):
                    self.pages = [p for p in self.pages if p >= v]
                    handled = True
            if not handled:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        return [PageParts(p) for p in self.pages]

    # -- per-task fetch ---------------------------------------------------
    def read(self, partition: PageParts) -> Iterator[tuple]:
        opts = self.options
        fetcher = _resolve_fetcher(opts)
        page_size = int(opts.get("page_size", "100"))
        retries = int(opts.get("retries", "3"))
        backoff = float(opts.get("backoff", "0.05"))
        rate_interval = 60.0 / max(float(opts.get("calls_per_min", "6000")), 1.0)
        log_dir = opts.get("log_dir")
        time.sleep(rate_interval)  # one call per read; interval = the budget
        rows = _fetch_page_with_retry(
            fetcher, partition.page, page_size, retries, backoff
        )
        if log_dir:
            # partition-level fetch accounting for pruning tests: one
            # marker per page actually fetched
            with open(os.path.join(log_dir, f"fetched_{partition.page}"), "w") as f:
                f.write(str(len(rows)))
        names = [f.name for f in self.schema.fields]
        for r in rows:
            yield tuple(r.get(n) for n in names)


class PagedApiStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of the same endpoint: the offset IS the next page
    number. Each microbatch fetches up to `pages_per_batch` new pages and
    stops at `pages` (a bounded backfill) or runs unbounded without it."""

    def __init__(self, schema, options) -> None:
        self.schema = schema
        self.options = options

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        opts = self.options
        first = int(start["page"])
        per_batch = int(opts.get("pages_per_batch", "1"))
        limit = int(opts.get("pages", "0")) or None
        last = first + per_batch
        if limit is not None:
            last = min(last, limit)
        fetcher = _resolve_fetcher(opts)
        page_size = int(opts.get("page_size", "100"))
        retries = int(opts.get("retries", "3"))
        backoff = float(opts.get("backoff", "0.05"))
        names = [f.name for f in self.schema.fields]
        rows = []
        for page in range(first, last):
            for r in _fetch_page_with_retry(
                fetcher, page, page_size, retries, backoff
            ):
                rows.append(tuple(r.get(n) for n in names))
        return iter(rows), {"page": max(last, first)}

    def commit(self, end: dict) -> None:
        pass


class PagedApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def reader(self, schema) -> PagedApiReader:
        return PagedApiReader(schema, self.options)

    def simpleStreamReader(self, schema) -> PagedApiStreamReader:
        return PagedApiStreamReader(schema, self.options)
