"""Deterministic stand-in for a paged REST endpoint (no network in this
environment — SURVEY §2.1 S6; reference `api/weather_api.py:25-109`).

`fx_rates(page, page_size)` returns the same rows for the same page on
every call and every process — what lets the DataSource tests assert
exact results and partition-level fetch accounting. `flaky_fx_rates`
fails the FIRST attempt per (page, marker-dir) using a cross-process
marker file, exercising the reader's retry path for real (executors are
separate processes, so in-memory counters can't see each other)."""

from __future__ import annotations

import hashlib
import os


def _rate(cur: str, day: int) -> float:
    h = int(hashlib.md5(f"{cur}:{day}".encode()).hexdigest()[:8], 16)
    return round(0.5 + (h % 10_000) / 10_000.0, 4)


CURRENCIES = ["EUR", "GBP", "JPY", "CAD", "AUD"]


def fx_rates(page: int, page_size: int) -> list[dict]:
    """Page p holds `page_size` consecutive (day, currency) quotes."""
    out = []
    for i in range(page * page_size, (page + 1) * page_size):
        day = i // len(CURRENCIES)
        cur = CURRENCIES[i % len(CURRENCIES)]
        out.append(
            {
                "page": page,
                "day": day,
                "currency": cur,
                "rate": _rate(cur, day),
            }
        )
    return out


def flaky_fx_rates(
    page: int, page_size: int, marker_dir: str | None = None
) -> list[dict]:
    """First call per page raises (marker-file state so the retry is
    observable across executor processes); later calls succeed.
    ``marker_dir`` arrives via the connector's ``fetcher_args`` option."""
    if marker_dir:
        marker = os.path.join(marker_dir, f"attempt_{page}")
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("1")
            raise ConnectionError(f"transient failure for page {page}")
    return fx_rates(page, page_size)
