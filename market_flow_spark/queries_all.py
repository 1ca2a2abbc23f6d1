"""Aggregated registry: importing this module loads every query module so
QUERIES/ORACLES are complete. Entry points (driver contract, bench, tests)
import from here."""

from __future__ import annotations

import market_flow_spark.queries as _core
import market_flow_spark.queries_ext as _ext  # noqa: F401  (registers on import)

QUERIES = _core.QUERIES
ORACLES = _core.ORACLES
