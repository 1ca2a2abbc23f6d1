"""Scale-safe global ordering: total-order ranks, deterministic corpus
shuffles, and curriculum staging — the export-side operators a training-data
pipeline needs (no counterpart in the reference, whose largest sort is a
single-node ORDER BY; cf. server/query_builder.py ORDER BY models).

Why a dedicated operator: the obvious spelling
``row_number().over(Window.orderBy(...))`` funnels the ENTIRE dataset
through one task (Spark plans an empty-frame window as a single-partition
sort) — the canonical 100 TB scale-killer. The shape here is the classic
two-phase total sort instead:

1. ``repartitionByRange`` on the order key — Spark samples range bounds and
   gives every partition a disjoint, ordered key range (this is the same
   machinery a global ``orderBy`` write uses, so it scales by construction);
2. per-partition local ``row_number`` (a window PARTITIONED by the range
   bucket — parallel, no global sort);
3. a partition-count side aggregate (one row per partition) turned into
   cumulative offsets and broadcast back; global rank = offset + local rank.

Cost at scale: two data-sized exchanges (range + the window's hash on the
bucket id) and one partitions-sized aggregate — vs. the naive window's
single-task sort of everything. Ranks are 1-based and dense.

Determinism contract: the order must be TOTAL (pass a unique tiebreaker as
the last key). With ties unbroken the assignment of equal keys to ranks is
partition-dependent; with a total order the result is a pure function of
the data, reproducible across engines — which is what makes these
operators oracle-checkable row-for-row against ``ROW_NUMBER() OVER``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from market_flow_spark.extensions.sampling import hash_bucket

_PID = "__gr_pid"
_LOCAL = "__gr_local"
_OFF = "__gr_off"


def global_sort_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based dense global rank under the (total) order given by
    ``order_cols`` — the scale-safe replacement for
    ``row_number().over(Window.orderBy(...))``.

    The input subtree is evaluated twice (once for the data pass, once for
    the tiny per-partition count aggregate); with a total order both passes
    see identical range bounds (Spark's range sampler is seeded
    deterministically), so the ranks are consistent. Callers ranking an
    expensive upstream plan can persist it first.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *cols).withColumn(
        _PID, F.spark_partition_id()
    )
    counts = parted.groupBy(_PID).agg(F.count(F.lit(1)).alias("__n"))
    # cumulative offsets: a window over <= num_partitions rows — the one
    # place a driver-small single-partition window is the right tool
    w_off = (
        Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        _PID, F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias(_OFF)
    )
    w_local = Window.partitionBy(_PID).orderBy(*cols)
    return (
        parted.join(F.broadcast(offsets), _PID)
        .withColumn(_LOCAL, F.row_number().over(w_local))
        .withColumn(rank_col, (F.col(_OFF) + F.col(_LOCAL)).cast("bigint"))
        .drop(_PID, _LOCAL, _OFF)
    )


def global_budget_select(
    df: DataFrame,
    order_cols: list[str | Column],
    weight_col: str,
    budget: int,
    cum_col: str = "cum_weight",
    keep_col: str = "selected",
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy prefix selection under a GLOBAL additive budget: walk the
    rows in ``order_cols`` order (best first) accumulating ``weight_col``,
    and mark every row whose inclusive running total stays ≤ ``budget`` —
    "fill a 1T-token training budget with the best-quality documents",
    the selection step between scoring and export in a data pipeline.

    Scale shape: the naive spelling is ``SUM(w) OVER (ORDER BY ...)`` —
    an empty-partition global window Spark plans as a SINGLE-TASK sort of
    the entire corpus. This is the two-phase cumulative sum instead, the
    prefix-sum twin of :func:`global_sort_rank`:

    1. ``repartitionByRange`` on the order (disjoint ordered key ranges);
    2. per-partition local running sum (window PARTITIONED by the range
       bucket — parallel);
    3. per-partition weight totals (one row per partition) → cumulative
       offsets, broadcast back; global running sum = offset + local.

    Integer weights make the running totals exact (no float
    accumulation-order issues), so the output is oracle-checkable against
    the naive window row-for-row. The order must be TOTAL (append a
    unique tiebreaker); same determinism contract as global_sort_rank.
    Rows are marked, not filtered — the caller chooses to filter on
    ``keep_col`` or keep the full panel (the unselected tail with its
    running total is exactly what budget-tuning wants to see).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *cols).withColumn(
        _PID, F.spark_partition_id()
    )
    totals = parted.groupBy(_PID).agg(
        F.sum(F.col(weight_col).cast("bigint")).alias("__w")
    )
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID, F.coalesce(F.sum("__w").over(w_off), F.lit(0)).alias(_OFF)
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_cum = F.sum(F.col(weight_col).cast("bigint")).over(w_local)
    return (
        parted.join(F.broadcast(offsets), _PID)
        .withColumn(cum_col, (F.col(_OFF) + local_cum).cast("bigint"))
        .withColumn(keep_col, F.col(cum_col) <= F.lit(budget))
        .drop(_PID, _OFF)
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    seed: str = "shuffle",
    rank_col: str = "shuffle_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every row a deterministic pseudo-random global position —
    the epoch-shuffle a training-data export needs: reproducible across
    runs/engines/cluster sizes (position is a pure function of the key and
    the seed string), yet uniformly mixed so batches drawn in rank order
    are unbiased. Change ``seed`` per epoch for fresh permutations.

    Order = (md5 hash of the salted key, then the key itself) — total as
    long as ``key_col`` is unique. Writing the result range-clustered by
    ``rank_col`` (``layout.write_clustered``) yields files a sequential
    trainer reads in shuffle order with no further sort.
    """
    h = "__shuf_h"
    ranked = global_sort_rank(
        df.withColumn(h, hash_bucket(F.col(key_col), seed)),
        [h, key_col],
        rank_col=rank_col,
        num_partitions=num_partitions,
    )
    return ranked.drop(h)


def curriculum_stages(
    df: DataFrame,
    score_col: str | Column,
    key_col: str,
    n_stages: int = 4,
    rank_col: str = "curriculum_rank",
    stage_col: str = "stage",
    num_partitions: int | None = None,
) -> DataFrame:
    """Curriculum ordering: rank rows by an easiness score (ascending —
    rank 1 is the easiest example) and cut the ranking into ``n_stages``
    equal-count stages, the schedule curriculum-learning data loaders
    consume (stage 0 first). Stage boundaries come from the exact global
    rank, not approximate quantiles, so stage sizes differ by at most one
    row and the assignment is engine-reproducible.

    ``key_col`` breaks score ties so the order is total. Costs one extra
    one-row COUNT aggregate (broadcast) on top of ``global_sort_rank``.
    """
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    ranked = global_sort_rank(
        df.withColumn("__cur_score", score),
        ["__cur_score", key_col],
        rank_col=rank_col,
        num_partitions=num_partitions,
    ).drop("__cur_score")
    total = df.agg(F.count(F.lit(1)).alias("__cur_total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            stage_col,
            F.floor(
                (F.col(rank_col) - 1) * n_stages / F.col("__cur_total")
            ).cast("int"),
        )
        .drop("__cur_total")
    )


def write_shuffle_sharded(
    df: DataFrame,
    path: str,
    key_col: str,
    seed: str = "shuffle",
    n_shards: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize a training-ready shuffle: rows land in parquet shards
    that, read in filename order, stream the corpus in the deterministic
    pseudo-random order of :func:`deterministic_shuffle` — no sort at
    training time, a fresh permutation per ``seed``.

    Plan shape: ONE range exchange. The shuffle rank is only needed to
    order rows, and rank order IS (hash, key) order — so rows are range-
    partitioned and within-partition sorted directly on the hash key, and
    the rank computation (offset join and all) is skipped entirely.
    Shard s of n covers the s-th slice of hash space, so concatenating
    shards 0..n-1 in order is exactly the global shuffle order."""
    h = "__shuf_h"
    out = df.withColumn(h, hash_bucket(F.col(key_col), seed))
    out = (
        out.repartitionByRange(n_shards, h, key_col)
        if n_shards is not None
        else out.repartitionByRange(h, key_col)
    )
    out.sortWithinPartitions(h, key_col).drop(h).write.mode(mode).parquet(
        path
    )
