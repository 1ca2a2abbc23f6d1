"""Custom stateful streaming operator via applyInPandasWithState
(north-star extension; the reference has no streaming at all, SURVEY §2.9).

``running_user_totals`` maintains per-user cumulative (count, sum) state
across micro-batches — the canonical arbitrary-stateful shape
(sessionization, running CDC merges, and online feature aggregation all
look like this). State lives in the state store (checkpointed, rescalable
by key); each micro-batch touches only the keys present in the batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: emit updated per-user cumulative totals each micro-batch.

    Works only on a streaming DataFrame (use ``tumbling``/batch aggregates
    for batch inputs — this operator exists precisely for the cross-batch
    state the batch planner doesn't need).
    """

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
