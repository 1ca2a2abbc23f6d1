"""Incremental / upsert patterns (SURVEY.md §2.3 J9-J10, §2.1 S9-S10).

The reference's "fetch only what's missing" and keyed-upsert idioms,
re-expressed as anti-joins and overwrite writes. These are *semantic*
operators (Catalyst can't infer them), kept explicit per SURVEY §4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_keys(universe: DataFrame, existing: DataFrame, on: list[str]) -> DataFrame:
    """J9/J10: keys present in the universe but absent from the existing
    table (NOT EXISTS / LEFT JOIN...IS NULL → one left_anti join).

    Reference: dags/raw/fetch_currencies.py:44-65,
    fetch_coordinates_and_weather.py:113-121,358-383.
    """
    return universe.join(existing, on=on, how="left_anti")


def upsert(existing: DataFrame, incoming: DataFrame, on: list[str]) -> DataFrame:
    """S10: keyed upsert as a pure transform — incoming rows win, existing
    rows without a matching key survive (insert-where-not-exists + update,
    fetch_coordinates_and_weather.py:201-237).

    existing-anti-incoming ∪ incoming. At scale: both sides shuffle once on
    the key; with Delta/Iceberg this becomes MERGE INTO, but the plan shape
    is the same.
    """
    keep = existing.join(incoming, on=on, how="left_anti")
    return keep.unionByName(incoming)


def backup_then_replace(
    spark_table: str, new_df: DataFrame, backup_suffix: str = "_backup"
) -> None:
    """S9: CREATE TABLE t_backup AS SELECT * FROM t → overwrite t
    (impute_missing_currencies.py:31-52). Side-effecting catalog op."""
    spark = new_df.sparkSession
    if spark.catalog.tableExists(spark_table):
        spark.table(spark_table).write.mode("overwrite").saveAsTable(
            spark_table + backup_suffix
        )
    new_df.write.mode("overwrite").saveAsTable(spark_table)


def merge_aggregate(
    agg: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental aggregate maintenance: fold a delta batch's partial
    aggregates into an existing (keys, sums, count) aggregate table
    WITHOUT re-scanning history — the update step of a sum/count
    materialized view (means derive as sum/count downstream).

    new = full-outer on keys, coalesced sums added. One shuffle on the
    keys over |agg| + |delta| rows; at 100 TB the aggregate table is
    orders of magnitude smaller than the fact history this replaces
    re-aggregating. Only works for algebraic aggregates (sum, count, min,
    max — here sums + count); holistic ones (exact distinct, median) need
    the sketch tier (see extensions.sketches) or a re-scan."""
    d = delta.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).alias(count_col),
    )
    a = agg.alias("a")
    dd = d.alias("d")
    merged = a.join(dd, on=keys, how="full_outer")
    out_cols = [
        (
            F.coalesce(F.col(f"a.{c}"), F.lit(0))
            + F.coalesce(F.col(f"d.{c}"), F.lit(0))
        ).alias(c)
        for c in [*sum_cols, count_col]
    ]
    return merged.select(*keys, *out_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Reconciliation diff between two snapshots of a keyed table: one row
    per key present in either side, tagged 'added' / 'removed' /
    'changed' / 'unchanged' — the audit every backup-then-replace (S9)
    or upsert (S10) deployment should run before swapping tables.

    Null-safe value compare (a change TO or FROM NULL is a change). Plan:
    one full-outer shuffle join on the keys; change detection is row-wise.
    At 100 TB both sides are key-partitioned tables — this is the same
    single-shuffle shape as the upsert it audits, and the usual consumer
    aggregates it straight down to per-status counts."""
    o = old.select(*keys, *[F.col(c).alias(f"__o_{c}") for c in compare_cols])
    n = new.select(*keys, *[F.col(c).alias(f"__n_{c}") for c in compare_cols])
    in_old = F.lit(True)
    joined = (
        o.withColumn("__in_old", in_old)
        .join(n.withColumn("__in_new", in_old), on=keys, how="full_outer")
    )
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        *keys,
        status.alias("diff_status"),
        *[F.col(f"__o_{c}").alias(f"old_{c}") for c in compare_cols],
        *[F.col(f"__n_{c}").alias(f"new_{c}") for c in compare_cols],
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked_cols: list[str],
    batch_id: int,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge: apply an update batch to a
    versioned dimension, closing out rows whose tracked attributes changed
    and appending the new versions — the history-preserving alternative to
    the reference's overwrite-in-place dim rebuilds (dbt `+materialized:
    table`, profiles.yml:24-27, which silently loses attribute history).

    `current` rows carry (keys, tracked_cols, valid_from, valid_to,
    is_current); `updates` carries (keys, tracked_cols). Versioning is by
    integer ``batch_id`` (a run sequence number — deterministic and
    oracle-checkable, where a wall-clock stamp would not be). Per batch:

    - unchanged keys and keys absent from the batch pass through;
    - changed keys: the open row closes (valid_to = batch_id,
      is_current = false) and a new open row appends;
    - brand-new keys insert as open rows.

    Plan: updates anti/semi-join the OPEN slice only (history rows never
    join), then one union — two shuffles on the natural key regardless of
    history depth."""
    null_safe_same = F.lit(True)
    for c in tracked_cols:
        null_safe_same = null_safe_same & F.col(f"c.{c}").eqNullSafe(
            F.col(f"u.{c}")
        )
    open_rows = current.filter(F.col(current_col)).alias("c")
    u = updates.alias("u")
    key_cond = [F.col(f"c.{k}") == F.col(f"u.{k}") for k in keys]
    and_cond = key_cond[0]
    for extra in key_cond[1:]:
        and_cond = and_cond & extra

    # open rows whose batch twin carries identical tracked values (or that
    # have no twin) survive untouched
    matched = open_rows.join(u, and_cond, "left").select(
        *[F.col(f"c.{c}") for c in current.columns],
        F.when(
            F.col(f"u.{keys[0]}").isNull() | null_safe_same, F.lit("keep")
        )
        .otherwise(F.lit("close"))
        .alias("__action"),
    )
    kept_open = matched.filter(F.col("__action") == "keep").drop("__action")
    closed = (
        matched.filter(F.col("__action") == "close")
        .drop("__action")
        .withColumn(valid_to_col, F.lit(batch_id))
        .withColumn(current_col, F.lit(False))
    )
    # new open versions: batch rows that differ from (or lack) an open twin
    same_and_open = open_rows.join(u, and_cond & null_safe_same, "left_semi")
    changed_or_new = u.join(
        same_and_open.select(*[F.col(k) for k in keys]), on=keys, how="left_anti"
    )
    inserted = (
        changed_or_new.select(*keys, *tracked_cols)
        .withColumn(valid_from_col, F.lit(batch_id))
        .withColumn(valid_to_col, F.lit(None).cast("int"))
        .withColumn(current_col, F.lit(True))
    )
    history = current.filter(~F.col(current_col))
    cols = current.columns
    return (
        history.select(*cols)
        .unionByName(kept_open.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(inserted.select(*cols))
    )


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    on: list[str],
    op_col: str = "op",
    ts_col: str | None = None,
) -> DataFrame:
    """Apply a CDC batch (rows tagged ``op`` ∈ {'I','U','D'}) to a
    snapshot: inserts/updates win over the snapshot, deletes remove the
    key — the Debezium-style apply step as a pure transform
    (MERGE INTO ... WHEN MATCHED/NOT MATCHED, without a table format).

    ``ts_col`` compacts multi-change keys first (latest change per key
    wins, ties broken by op descending — 'U' > 'I' > 'D' at identical
    timestamps, deterministic either way). Without it the
    batch must be pre-compacted (one change per key); violations raise at
    plan time via a uniqueness check left to the caller's quality gate.

    Plan shape: one per-key window over the (small) change batch, one
    left_anti of the snapshot against changed keys, one union — the
    snapshot never shuffles more than once, and at 100 TB the changed-key
    side is typically broadcast by AQE."""
    payload = [c for c in snapshot.columns]
    ch = changes
    if ts_col is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*on).orderBy(
            F.col(ts_col).desc(), F.col(op_col).desc()
        )
        ch = (
            ch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    untouched = snapshot.join(ch.select(*on), on=on, how="left_anti")
    upserts = ch.filter(F.col(op_col) != "D").select(*payload)
    return untouched.unionByName(upserts)


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    asof_col: str,
    values: list[str],
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    suffix: str = "_asof",
) -> DataFrame:
    """Point-in-time join: attach to each fact row the SCD2 dim version
    that was effective at the fact's ``asof_col`` — i.e. the row with
    equal ``keys`` and ``valid_from <= asof < valid_to`` (open rows have
    NULL ``valid_to`` = effective forever). Left semantics: every fact
    survives exactly once, with NULL values when no version was
    effective (fact predates the key's history, or the history was
    truncated past the fact).

    Physical shape (r12): a LEFT equi-join on ``keys`` with the period
    bounds as a residual condition. SCD2 periods per key are
    non-overlapping, so at most one dim version matches any fact — the
    left join therefore preserves the exactly-once fact semantics with
    no window and **no shuffle of the fact side at all when the dim
    broadcasts** (the usual case: a versioned dimension is orders of
    magnitude smaller than the facts that reference it). The previous
    shape (union + keyed window via ``temporal.asof_join``) shuffled and
    sorted EVERY fact row by the natural key just to locate the
    effective version; at 100 TB that is a facts-sized exchange bought
    back by nothing. When the dim is too large to broadcast the planner
    falls back to a sort-merge join on ``keys`` with the bounds as a
    per-key residual — the same facts-sized exchange the window shape
    paid, so the join shape is never worse and usually shuffle-free.

    Preconditions (the SCD2 contract, now load-bearing):
    - versions per key must be non-overlapping — an overlapping pair
      would match one fact twice (the old window shape silently kept
      the later ``valid_from``); ``scd2_merge`` output satisfies this
      by construction,
    - ``valid_from_col`` must be non-null (use the epoch floor for
      genesis rows, as ``scd2_merge`` does); a NULL ``valid_to`` means
      effective-forever, as before.

    ``asof_col`` and ``valid_from_col``/``valid_to_col`` must share a
    comparable type (both ints / dates / timestamps).
    """
    kcols = [f"__pit_k{i}" for i in range(len(keys))]
    d = dim.select(
        *[F.col(k).alias(kc) for k, kc in zip(keys, kcols)],
        *[F.col(v).alias(v + suffix) for v in values],
        F.col(valid_from_col).alias("__pit_from"),
        F.col(valid_to_col).alias("__pit_to"),
    )
    cond = F.lit(True)
    for k, kc in zip(keys, kcols):
        cond = cond & (F.col(k) == F.col(kc))
    cond = (
        cond
        & (F.col("__pit_from") <= F.col(asof_col))
        & (
            F.col("__pit_to").isNull()
            | (F.col(asof_col) < F.col("__pit_to"))
        )
    )
    return facts.join(d, cond, "left").drop(
        *kcols, "__pit_from", "__pit_to"
    )
