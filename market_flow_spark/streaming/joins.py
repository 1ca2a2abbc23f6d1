"""Streaming joins (north-star extension — the reference is batch-only,
SURVEY.md §2.9): stream-static dimension enrichment and the watermarked
stream-stream interval join.

Both operators are written once and run in BOTH modes — on batch
DataFrames (used by the oracle-checked query twins) and on streaming
DataFrames, where Structured Streaming derives the state-retention bounds
from the watermark + time-range condition. Identical expressions,
identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame, dim: DataFrame, key: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment: join a (possibly streaming) fact side to a
    static dimension on ``key``. The static side is re-read per micro-batch
    by the engine; at cluster scale the dimension is broadcast (AQE decides
    from its actual size — no hint, the same no-forced-broadcast rule as
    the MinHash tier), so the stream side never shuffles."""
    return stream.join(dim, key, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "1 hour",
) -> DataFrame:
    """Keyed interval join: every (left, right) pair with equal ``key``
    where the right event lands in ``[left_ts, left_ts + max_delay]`` —
    the attribution join (view → clicks within the hour). Returns the
    joined frame with both timestamps.

    Streaming: give both inputs watermarks no smaller than ``max_delay``
    and the engine bounds its join state from this exact condition (left
    rows age out ``max_delay`` past the watermark). Batch: the same plan
    is an equi-join on ``key`` with the range predicate applied in-join —
    the shuffle is keyed, never a cross join; a hot key spreads via AQE
    skew handling.

    Unlike :func:`operators.temporal.asof_join` (LAST match only) and
    ``range_join_binned`` (global ts proximity, no key), this emits ALL
    qualifying pairs per key — the three cover the temporal-join triangle.
    """
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = left.alias("l").join(right.alias("r"), cond)
    keep = [F.col(f"l.{key}").alias(key), lt.alias(left_ts), rt.alias(right_ts)]
    keep += [
        F.col(f"l.{c}")
        for c in left.columns
        if c not in (key, left_ts)
    ]
    keep += [
        F.col(f"r.{c}")
        for c in right.columns
        if c not in (key, right_ts)
    ]
    return joined.select(*keep)


def view_click_attribution(
    events: DataFrame, max_delay: str = "1 hour"
) -> DataFrame:
    """All (view, click) pairs per user where the click follows the view
    within ``max_delay`` — the batch twin of the streaming attribution
    join, over the events table's view/click types."""
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event_id"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value"),
    )
    return interval_join(
        views,
        clicks,
        key="user_id",
        left_ts="view_ts",
        right_ts="click_ts",
        max_delay=max_delay,
    )
