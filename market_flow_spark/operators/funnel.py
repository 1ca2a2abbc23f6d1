"""Event-sequence analytics: funnel conversion and cohort retention.

Classic product-analytics queries over the (user_id, ts, event_type)
event stream — adjacent to the reference's time-keyed event enrichment
(SURVEY §1.4's weather/event joins) but absent from its surface; added as
engine-breadth extensions. Both are pure aggregates/joins keyed on
user_id, so at 100 TB they shuffle the (already user-keyed) event stream
once per stage and every later stage operates on strictly smaller
per-user frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from market_flow_spark.functions.aggregates import det_round


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: a user reaches step i+1 only with an event of
    that type STRICTLY AFTER their earliest completion of step i (the
    first-touch semantic). Returns one row per step:
    (step_idx, step, n_users, conversion_from_first, conversion_from_prev)
    with deterministically rounded rates.

    Plan: one filtered aggregate per step, each joined to the previous
    step's per-user completion time — stage i's input is only the events
    of type i from users still in the funnel, so the per-user frames
    shrink monotonically down the funnel."""
    if not steps:
        raise ValueError("steps must be non-empty")
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for step in steps:
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("user_id"), F.col(ts_col).alias("__ts")
        )
        if prev is not None:
            ev = ev.join(prev, "user_id").filter(
                F.col("__ts") > F.col("__prev_ts")
            )
        cur = ev.groupBy("user_id").agg(F.min("__ts").alias("__prev_ts"))
        reached.append(cur)
        prev = cur
    counts = None
    for i, (step, df) in enumerate(zip(steps, reached)):
        c = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step_idx"), F.lit(step).alias("step"), "n_users"
        )
        counts = c if counts is None else counts.unionByName(c)
    # conversion columns via a window over the (steps-sized) counts frame
    from pyspark.sql import Window

    w_all = Window.orderBy("step_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_prev = Window.orderBy("step_idx")
    return (
        counts.withColumn("__first", F.first("n_users").over(w_all))
        .withColumn("__prev", F.lag("n_users").over(w_prev))
        .select(
            "step_idx",
            "step",
            "n_users",
            det_round(F.col("n_users") / F.col("__first"), 4).alias(
                "conversion_from_first"
            ),
            det_round(
                F.col("n_users") / F.coalesce(F.col("__prev"), F.col("n_users")),
                4,
            ).alias("conversion_from_prev"),
        )
    )


def cohort_retention(
    events: DataFrame,
    max_offset: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Monthly cohort retention: users are cohorted by the month of their
    first event (any type); for each offset 0..max_offset, count how many
    of the cohort were active (any event) in cohort_month + offset.
    Returns (cohort_month, month_offset, n_active, n_cohort,
    retention_rate).

    Plan: per-user first-month aggregate, distinct (user, month) activity,
    one join on user_id, one count aggregate — months are compared as
    year*12+month integers so the offset arithmetic is exact."""
    midx = F.year(ts_col) * 12 + F.month(ts_col) - 1
    firsts = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.min(midx).alias("cohort_idx")
    )
    activity = (
        events.select(
            F.col(user_col).alias("user_id"), midx.alias("active_idx")
        ).distinct()
    )
    cohort_sizes = firsts.groupBy("cohort_idx").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    grid = (
        activity.join(firsts, "user_id")
        .withColumn("month_offset", F.col("active_idx") - F.col("cohort_idx"))
        .filter(
            (F.col("month_offset") >= 0) & (F.col("month_offset") <= max_offset)
        )
        .groupBy("cohort_idx", "month_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    month_str = F.concat_ws(
        "-",
        F.floor(F.col("cohort_idx") / 12).cast("int"),
        F.lpad((F.pmod(F.col("cohort_idx"), F.lit(12)) + 1).cast("string"), 2, "0"),
    )
    return (
        grid.join(cohort_sizes, "cohort_idx")
        .select(
            month_str.alias("cohort_month"),
            F.col("month_offset").cast("int").alias("month_offset"),
            "n_active",
            "n_cohort",
            det_round(F.col("n_active") / F.col("n_cohort"), 4).alias(
                "retention_rate"
            ),
        )
    )


def event_transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    (from_type, to_type, n, prob) where prob = n / Σ n over the from_type
    row — the behavioral-model summary (what follows a view?) a product
    funnel generalizes.

    One window shuffle on the user key (lag over (user, ts)) feeding one
    map-side-combined pair count; the per-row normalizer is a second
    window over the (tiny, type²-bounded) count table, not the events.
    Ties at identical timestamps order by event id for determinism."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = (
        events.withColumn("__next", F.lead(type_col).over(w))
        .filter(F.col("__next").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"),
            F.col("__next").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("from_type")
    return pairs.withColumn(
        "prob", det_round(F.col("n") / F.sum("n").over(wrow), 6)
    )
