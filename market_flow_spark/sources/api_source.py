"""REST enrichment connectors (SURVEY.md §2.1 S6) — geocoding, monthly
weather, historical FX in the reference (api/geocoding_api.py,
api/weather_api.py, dags/raw/fetch_currencies.py:74-150).

Network access is not available in this environment, so the HTTP call is an
injected callable (`fetcher`); rate limiting, retry/backoff, and the
"fetch only missing keys" pattern are real. Two execution shapes:

- **driver-side** fetch for small key sets (the reference's scale: ≤ a few
  thousand geocodes) → spark.createDataFrame;
- **distributed** fetch via mapInPandas over the key list for large sets —
  each partition runs its own rate-limited loop, so the cluster-wide rate
  is partitions × per-task rate (choose partition count accordingly).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

Fetcher = Callable[[dict], dict | None]


class RateLimiter:
    """Token-interval limiter: at most `calls_per_min` invocations/min,
    mirroring the reference's @limits decorators."""

    def __init__(self, calls_per_min: int) -> None:
        self.interval = 60.0 / max(calls_per_min, 1)
        self._last = 0.0

    def wait(self) -> None:
        now = time.monotonic()
        delta = now - self._last
        if delta < self.interval:
            time.sleep(self.interval - delta)
        self._last = time.monotonic()


def fetch_with_retry(
    fetcher: Fetcher,
    key: dict,
    retries: int = 3,
    backoff: float = 1.0,
) -> dict | None:
    """Retry with exponential backoff (fetch_currencies.py:74-76)."""
    for attempt in range(retries):
        try:
            return fetcher(key)
        except Exception:
            if attempt == retries - 1:
                raise
            time.sleep(backoff * (2**attempt))
    return None


def fetch_keys_driver_side(
    spark: SparkSession,
    keys: list[dict],
    fetcher: Fetcher,
    schema: str,
    calls_per_min: int = 50,
) -> DataFrame:
    """Small-key-set path: sequential rate-limited fetch on the driver."""
    limiter = RateLimiter(calls_per_min)
    rows = []
    for key in keys:
        limiter.wait()
        result = fetch_with_retry(fetcher, key)
        if result is not None:
            rows.append({**key, **result})
    return spark.createDataFrame(rows, schema=schema)


def fetch_keys_distributed(
    keys_df: DataFrame,
    fetcher: Fetcher,
    schema: str,
    calls_per_min_per_task: int = 50,
) -> DataFrame:
    """Large-key-set path: mapInPandas fan-out; each task rate-limits its
    own partition. Repartition the key list to set total parallelism."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        limiter = RateLimiter(calls_per_min_per_task)
        for pdf in batches:
            out = []
            for key in pdf.to_dict("records"):
                limiter.wait()
                result = fetch_with_retry(fetcher, key)
                if result is not None:
                    out.append({**key, **result})
            if out:
                yield pd.DataFrame(out)

    return keys_df.mapInPandas(run, schema=schema)
