"""Executed-plan metric extraction: quantitative shuffle/spill accounting.

Reads the SQLMetrics off a DataFrame's OWN executed physical plan (the
AQE-final tree, traversed through query stages via py4j), so perf claims
("one exchange", "no spill", "broadcast stays kilobytes") are backed by
measured bytes, not plan-string pattern matching.

Contract: the metrics live on the QueryExecution attached to the
DataFrame, which is populated only by an action on the DataFrame ITSELF
(`df.collect()` / `df.toPandas()` — a `df.write` spawns a separate
QueryExecution whose metrics are unreachable from `df`). Call
:func:`collect_and_measure` to do both in one step.

At 100 TB this is the same telemetry the Spark UI SQL tab shows; having it
as a table lets CI pin budgets (e.g. "dedup_exact shuffles ≤ N bytes per
input row") the way test_plans pins shapes.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

# metric KEYS (SQLMetric map keys, stable Spark API surface) → report field
_SUM_KEYS = {
    "shuffleBytesWritten": "shuffle_bytes_written",
    "shuffleRecordsWritten": "shuffle_records_written",
    "spillSize": "spill_bytes",
}
# dataSize exists on BOTH exchange kinds; it only means "broadcast payload"
# on a BroadcastExchange node, so it's harvested name-gated
_BROADCAST_ONLY_KEYS = {
    "dataSize": "broadcast_data_bytes",
}
_MAX_KEYS = {
    "peakMemory": "peak_memory_bytes",
}


def _scala_map_items(m) -> list[tuple[str, Any]]:
    out = []
    it = m.iterator()
    while it.hasNext():
        kv = it.next()
        out.append((kv._1(), kv._2()))
    return out


def _walk(node, acc: dict[str, int], counts: dict[str, int], depth: int = 0):
    if depth > 64:
        return
    name = node.nodeName()
    # ReusedExchange shares its child's metric objects — counting them
    # again would double-bill the one physical shuffle that actually ran
    if name.startswith("ReusedExchange"):
        counts["reused_exchanges"] = counts.get("reused_exchanges", 0) + 1
        return
    if name.startswith("Exchange") or name.startswith("ShuffleExchange"):
        counts["exchanges"] = counts.get("exchanges", 0) + 1
    if name.startswith("BroadcastExchange"):
        counts["broadcast_exchanges"] = counts.get("broadcast_exchanges", 0) + 1
    is_broadcast = name.startswith("BroadcastExchange")
    for key, metric in _scala_map_items(node.metrics()):
        try:
            val = int(metric.value())
        except Exception:
            continue
        if key in _SUM_KEYS:
            acc[_SUM_KEYS[key]] = acc.get(_SUM_KEYS[key], 0) + val
        elif is_broadcast and key in _BROADCAST_ONLY_KEYS:
            f = _BROADCAST_ONLY_KEYS[key]
            acc[f] = acc.get(f, 0) + val
        elif key in _MAX_KEYS:
            f = _MAX_KEYS[key]
            acc[f] = max(acc.get(f, 0), val)
    ch = node.children()
    n = ch.size()
    for i in range(n):
        _walk(ch.apply(i), acc, counts, depth + 1)
    if n == 0:
        # leaf wrappers that hide their materialized subtree from
        # children(): AQE root, query stages, InMemoryTableScan
        for attr in ("executedPlan", "finalPhysicalPlan", "plan", "child"):
            try:
                sub = getattr(node, attr)()
            except Exception:
                continue
            if sub is not None and hasattr(sub, "nodeName"):
                _walk(sub, acc, counts, depth + 1)
                break


def executed_plan_metrics(df: DataFrame) -> dict[str, int]:
    """Sum the interesting SQLMetrics over `df`'s executed plan. The
    DataFrame must have been executed via its own action (collect /
    toPandas) first — otherwise every metric reads 0."""
    acc: dict[str, int] = {}
    counts: dict[str, int] = {}
    _walk(df._jdf.queryExecution().executedPlan(), acc, counts)
    out = {
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "spill_bytes": 0,
        "broadcast_data_bytes": 0,
        "peak_memory_bytes": 0,
        "exchanges": 0,
        "broadcast_exchanges": 0,
        "reused_exchanges": 0,
    }
    out.update(acc)
    out.update(counts)
    return out


def collect_and_measure(df: DataFrame) -> tuple[int, dict[str, int]]:
    """Execute `df` via its own collect() and return (n_rows,
    executed-plan metrics). collect (not a noop write) because only an
    action on the DataFrame's own QueryExecution populates its metrics —
    so the result briefly lives on the driver; measure at a scale factor
    whose outputs fit (the bench measures at sf0.01)."""
    n = len(df.collect())
    return n, executed_plan_metrics(df)
