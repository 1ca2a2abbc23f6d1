"""App-layer analytics operators (SURVEY.md §2.2 P3-P6, §2.4 A5/A7-A10,
§2.5 W3, §2.6 O2-O5).

These re-express the reference's pandas/Streamlit analytics as distributed
DataFrame transforms. Float aggregates are rounded to 2 decimals at the
operator boundary — deterministic under partial-aggregation order and
matching the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from market_flow_spark.functions.aggregates import det_avg, det_avg_over, det_round


# ---- filters (P3-P6) -------------------------------------------------------


def filter_eq(df: DataFrame, **eq: object) -> DataFrame:
    """P3: equality slice, e.g. filter_eq(df, country='Kenya', product=p)."""
    out = df
    for c, v in eq.items():
        out = out.filter(F.col(c) == F.lit(v))
    return out


def filter_isin(df: DataFrame, col: str, values: list) -> DataFrame:
    """P4: IN-list membership (single_product_forecasting.py:143-146)."""
    return df.filter(F.col(col).isin(values))


def filter_contains(df: DataFrame, col: str, needle: str) -> DataFrame:
    """P5: generic dataset-viewer filter (dataset_viewer.py:18-29) —
    case-insensitive substring on any column; numeric equality fallback."""
    try:
        num = float(needle)
        is_numeric = dict(df.dtypes)[col] in ("int", "bigint", "double", "float")
    except ValueError:
        is_numeric = False
    if is_numeric:
        return df.filter(F.col(col) == F.lit(num))
    return df.filter(
        F.lower(F.col(col).cast("string")).contains(needle.lower())
    )


def filter_positive(df: DataFrame, col: str) -> DataFrame:
    """P6: drop nonpositive values (visualization.py:13-17)."""
    return df.filter(F.col(col) > 0)


# ---- aggregations (A5, A7-A10) ---------------------------------------------


def conditional_count(df: DataFrame, group: str, cond: Column, name: str) -> DataFrame:
    """A5: SUM(CASE WHEN cond THEN 1 ELSE 0 END) per group
    (impute_missing_coords.py:67-74)."""
    return df.groupBy(group).agg(
        F.sum(F.when(cond, 1).otherwise(0)).alias(name),
        F.count(F.lit(1)).alias("total"),
    )


def multi_stat_summary(df: DataFrame, group: str, value: str) -> DataFrame:
    """A7: mean/std/min/max of a measure per group, rounded to 2
    (single_product_forecasting.py:263-274)."""
    v = F.col(value)
    return df.groupBy(group).agg(
        det_avg(v).alias("mean_price"),
        F.round(F.stddev(v), 2).alias("std_price"),
        F.round(F.min(v), 2).alias("min_price"),
        F.round(F.max(v), 2).alias("max_price"),
    )


def two_level_mean(df: DataFrame, g1: str, g2: str, value: str) -> DataFrame:
    """A8: avg of a measure by (group, date) (single_product_forecasting.py:241-245)."""
    return df.groupBy(g1, g2).agg(det_avg(value).alias("avg_price"))


def distinct_counts_per_group(df: DataFrame, group: str, cols: list[str]) -> DataFrame:
    """A9: exact countDistinct per group (dataset_viewer.py:63-71). Exact,
    not approx — the reference uses pandas nunique; approx_count_distinct is
    offered separately for the 100 TB path."""
    aggs = [F.countDistinct(c).alias(f"n_{c}") for c in cols]
    return df.groupBy(group).agg(*aggs)


def group_profile(
    df: DataFrame,
    group: str,
    distinct_cols: dict[str, str],
    cond: Column,
    cond_name: str,
) -> DataFrame:
    """A5 + A9 fused: exact per-group distinct counts and a conditional
    (CASE-filtered) count in ONE groupBy — the two reference panels share
    the same grouping, so computing them together halves the shuffles.

    ``distinct_cols`` maps output alias -> source column."""
    aggs = [F.countDistinct(c).alias(name) for name, c in distinct_cols.items()]
    aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(cond_name))
    aggs.append(F.count(F.lit(1)).alias("total"))
    return df.groupBy(group).agg(*aggs)


def null_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """A10: per-column null/non-null counts (dataset_viewer.py:43-52)."""
    aggs = [
        F.sum(F.col(c).isNull().cast("bigint")).alias(f"nulls_{c}") for c in cols
    ] + [F.count(F.lit(1)).alias("total_rows")]
    return df.agg(*aggs)


# ---- windows (W3) -----------------------------------------------------------


def rolling_mean(
    df: DataFrame, partition: str, order: str, value: str, periods: int = 30
) -> DataFrame:
    """W3: per-group trailing rolling mean, min_periods=1
    (single_product_forecasting.py:41-43 'MA30').

    rowsBetween(-(periods-1), 0) reproduces pandas rolling(min_periods=1)
    exactly: short prefixes average whatever rows exist.
    """
    w = (
        Window.partitionBy(partition)
        .orderBy(order)
        .rowsBetween(-(periods - 1), Window.currentRow)
    )
    return df.withColumn(f"ma{periods}", det_avg_over(value, w))


def rolling_median(
    df: DataFrame,
    partition: str,
    order_cols: list[str],
    value: str,
    periods: int = 12,
    out_col: str | None = None,
    ndigits: int = 4,
) -> DataFrame:
    """Exact trailing rolling MEDIAN over a bounded row frame — the robust
    twin of :func:`rolling_mean` (a single spike moves MA30 by spike/30;
    the median ignores it entirely).

    Physical shape: ``sort_array(collect_list(x) OVER frame)`` — each row
    materializes at most ``periods`` values, so per-row cost is
    O(periods log periods) regardless of partition length or corpus size
    (unlike a full-partition percentile, which needs the whole series in
    one place). The only shuffle is the window's partitionBy — same
    exchange the mean/zscore panels already pay.

    Even-count frames return the midpoint of the two central values
    (quantile_cont 0.5 — DuckDB's ``median`` window semantics), so the
    DuckDB oracle is simply ``median(x) OVER w``. The midpoint of two
    doubles ((a+b)/2) is computed identically by both engines, which keeps
    the det_round boundary safe.
    """
    w = (
        Window.partitionBy(partition)
        .orderBy(*order_cols)
        .rowsBetween(-(periods - 1), Window.currentRow)
    )
    # r12: materialize the frame array ONCE and derive the median from the
    # column. Inlining the window expression into every element_at/size
    # reference made the analyzer emit SEVEN identical collect_list window
    # functions (one per reference — Spark does not dedup equal window
    # expressions), each maintaining its own frame buffer per row. One
    # named column = one window function; the median arithmetic is then a
    # plain projection (measured ×0.85 min interleaved; plan: 7 window
    # expressions → 1).
    arr_col = "__rolling_median_arr"
    out = df.withColumn(
        arr_col,
        F.sort_array(F.collect_list(F.col(value).cast("double")).over(w)),
    )
    arr = F.col(arr_col)
    n = F.size(arr)
    med = F.when(
        n % 2 == 1, F.element_at(arr, ((n + F.lit(1)) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(arr, (n / 2).cast("int"))
            + F.element_at(arr, (n / 2 + 1).cast("int"))
        )
        / 2
    )
    return out.withColumn(
        out_col or f"median{periods}", det_round(med, ndigits)
    ).drop(arr_col)


# ---- sorts / limits / top-k (O2-O5) -----------------------------------------


def top_k(df: DataFrame, order_cols: list[str], k: int = 10) -> DataFrame:
    """O2: deterministic top-k — order columns must form a total order
    (callers append a unique tiebreaker). Spark plans this as TakeOrdered:
    per-partition heap + driver merge, no global sort."""
    return df.orderBy(*order_cols).limit(k)


def paginate(df: DataFrame, order_cols: list[str], page: int, size: int) -> DataFrame:
    """O3: dataset-viewer pagination (dataset_viewer.py:144-178) over a
    deterministic total order."""
    return df.orderBy(*order_cols).offset(page * size).limit(size)


def last_n(df: DataFrame, order_col: str, n: int, tiebreak: list[str]) -> DataFrame:
    """O5: pandas tail(n) analog — last n rows by a sort column
    (single_product_forecasting.py:177-180)."""
    return df.orderBy(F.col(order_col).desc(), *[F.col(c).desc() for c in tiebreak]).limit(n)


def group_percentiles(
    df: DataFrame,
    group: str,
    value: str,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """Per-group quantiles of a measure. ``approx=False`` uses the exact
    interpolated `percentile` aggregate ((n-1)·p linear interpolation —
    the same definition as ANSI PERCENTILE_CONT / DuckDB quantile_cont, so
    it is oracle-checkable); ``approx=True`` switches to
    `approx_percentile` (t-digest-style bounded-memory sketch) — the
    100 TB path, where an exact per-group sort of a fact-table measure is
    the thing you avoid. Same schema either way, so callers flip the flag
    by data size."""
    fn = "approx_percentile" if approx else "percentile"
    # ONE aggregate call with the percentile array: the exact aggregate
    # buffers each group's values once instead of once per requested
    # quantile (3 separate calls measured ~2.6 s vs ~1 s at sf0.1)
    plist = ", ".join(str(p) for p in ps)
    arr = F.expr(f"{fn}({value}, array({plist}))")
    return (
        df.groupBy(group)
        .agg(arr.alias("__ps"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            group,
            *[
                det_round(F.col("__ps").getItem(i), 4).alias(percentile_name(p))
                for i, p in enumerate(ps)
            ],
            "n_rows",
        )
    )


def percentile_name(p: float) -> str:
    """Stable column name for a quantile: p50, p90, p99, p99_9, p100 —
    valid for any p in [0, 1] (naive str(p) slicing mislabels 1.0 as 'p0'
    and breaks on scientific notation)."""
    scaled = p * 100
    if float(scaled).is_integer():
        return f"p{int(scaled)}"
    return "p" + f"{scaled:.6f}".rstrip("0").replace(".", "_")


def rolling_zscore_anomalies(
    df: DataFrame,
    partition: str,
    order_cols: list[str],
    value: str,
    lookback: int = 12,
    min_periods: int = 6,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group rolling z-score anomaly detection: each point is compared
    against the mean/stddev of its TRAILING window (current row excluded,
    so an outlier cannot dilute its own baseline). Rows with fewer than
    `min_periods` trailing points get NULL stats — not silently z=0.

    Cross-engine determinism: Σx and Σx² accumulate in DECIMAL (exact,
    order-independent), so mean/variance derive from identical doubles on
    every engine; variance is clamped at 0 before the sqrt to absorb the
    cancellation dust of (Σx² - n·mean²). Appends (roll_mean, roll_std, z,
    is_anomaly); `z` is det-rounded BEFORE the threshold compare so the
    anomaly flag is reproducible too.

    One window shuffle per call — the same exchange the rolling-mean panel
    already pays; at scale the partition key keeps groups independent."""
    w = (
        Window.partitionBy(partition)
        .orderBy(*order_cols)
        .rowsBetween(-lookback, -1)
    )
    dec = "decimal(27,6)"
    x = F.col(value)
    # r12: the three frame aggregates are materialized ONCE in a single
    # select and everything downstream derives from the named columns.
    # Inlining them into mean/var/std/z made the analyzer instantiate a
    # window function PER REFERENCE (Spark does not dedup equal window
    # expressions): the executed plan carried count ×9 + sum ×7 identical
    # window functions across two Window nodes, each maintaining its own
    # frame buffer per row. One select over one spec = one Window node
    # with exactly 3 functions; the z-score arithmetic is then a plain
    # projection (same fix as rolling_median, measured there ×0.85 min).
    nc, s1c, s2c = "__rz_n", "__rz_s1", "__rz_s2"
    out = df.select(
        "*",
        F.count(value).over(w).alias(nc),
        F.sum(x.cast(dec)).over(w).cast("double").alias(s1c),
        F.sum((x.cast(dec) * x.cast(dec)).cast("decimal(38,12)"))
        .over(w)
        .cast("double")
        .alias(s2c),
    )
    n = F.col(nc)
    mean = F.col(s1c) / n
    var = F.greatest(
        (F.col(s2c) - n * mean * mean) / (n - 1), F.lit(0.0)
    )
    std = F.sqrt(var)
    guard = n >= min_periods
    z = F.when(guard & (std > 0), det_round((x - mean) / std, 4))
    return (
        out.withColumn("roll_mean", F.when(guard, det_round(mean, 4)))
        .withColumn("roll_std", F.when(guard, det_round(std, 4)))
        .withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("z")) > threshold, F.lit(False)),
        )
        .drop(nc, s1c, s2c)
    )


def window_function_panel(
    df: DataFrame,
    partition: str,
    order_cols: list[str],
    value: str,
    n_tiles: int = 4,
) -> DataFrame:
    """The full ranking/navigation window-function surface in one pass:
    lag/lead neighbors, row_number sequence, ntile buckets, percent_rank
    and cume_dist — all over ONE window spec, so Catalyst plans a single
    sort+shuffle on the partition key rather than one per function.

    Ordering must be made total by the caller (include a unique key in
    ``order_cols``): percent_rank/cume_dist are tie-sensitive and a
    non-total order would be non-deterministic across engines.

    The running total accumulates in DECIMAL (exact, associative) and is
    det-rounded — the same cross-engine determinism contract as every
    other float aggregate in the repo. One exchange, arbitrary partition
    cardinality; per-group state is a sort buffer, not a materialized
    group."""
    w = Window.partitionBy(partition).orderBy(*order_cols)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run = F.sum(F.col(value).cast("decimal(27,6)")).over(wrun).cast("double")
    return df.select(
        partition,
        *order_cols,
        F.col(value),
        F.lag(value).over(w).alias("prev_value"),
        F.lead(value).over(w).alias("next_value"),
        F.row_number().over(w).alias("seq"),
        F.ntile(n_tiles).over(w).alias("tile"),
        det_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        det_round(F.cume_dist().over(w), 6).alias("cume"),
        det_round(run, 2).alias("running_total"),
    )


def winsorize_summary(
    df: DataFrame,
    group: str,
    value: str,
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Per-group percentile winsorization (outlier clipping), reported as a
    group summary: exact interpolated bounds, clip counts on each side, and
    the mean before/after clipping.

    Two-pass shape — the only correct one for exact quantiles: pass 1 is a
    per-group percentile aggregate (group-cardinality-sized output), pass 2
    re-scans the fact with the bounds joined back. The bounds table is
    explicitly broadcast so pass 2 adds NO shuffle beyond its own final
    aggregate; at fact scale swap ``group_percentiles(approx=True)``-style
    sketch bounds in — the join-back skeleton is unchanged. Bounds are
    det-rounded BEFORE the clip compare so the clipped values (and counts)
    are bit-identical across engines."""
    bounds = (
        df.groupBy(group)
        .agg(
            F.expr(f"percentile({value}, array({lower}, {upper}))").alias(
                "__b"
            )
        )
        .select(
            group,
            det_round(F.col("__b").getItem(0), 4).alias("p_low"),
            det_round(F.col("__b").getItem(1), 4).alias("p_high"),
        )
    )
    x = F.col(value)
    clipped = F.least(F.greatest(x, F.col("p_low")), F.col("p_high"))
    return (
        df.join(F.broadcast(bounds), group)
        .groupBy(group, "p_low", "p_high")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(x < F.col("p_low"), F.lit(1))).alias(
                "n_clipped_low"
            ),
            F.count(F.when(x > F.col("p_high"), F.lit(1))).alias(
                "n_clipped_high"
            ),
            det_avg(x, 4).alias("mean_raw"),
            det_avg(clipped, 4).alias("mean_winsorized"),
        )
    )


def cooccurrence_pairs(
    df: DataFrame,
    basket: str,
    item: str,
    min_support: int = 2,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Market-basket pair co-occurrence: (item_a, item_b, support) for
    every unordered item pair appearing together in >= min_support
    baskets (the candidate-pair stage of frequent-itemset mining).

    NOT a self-join: baskets are collapsed to sorted distinct item sets
    with ONE map-side-combined aggregate, and pairs are emitted map-side
    with an indexed higher-order transform (x before y in the sorted
    array, so each pair emits exactly once). The only other shuffle is the
    (item_a, item_b) support count, bounded by distinct-pair cardinality
    with map-side combine. The equivalent basket-keyed self-join would
    shuffle the item table twice and re-emit every pair through the join.

    Pair emission per basket is C(n,2) — inherently quadratic in basket
    size, which at scale is a skew problem (one 10^5-item basket emits
    5·10^9 pairs). ``max_basket_items`` is the guard: baskets larger than
    the cap are dropped BEFORE expansion (an over-full basket carries
    little association signal anyway — standard practice in A-Priori
    implementations). None = exact semantics over all baskets."""
    sets = df.groupBy(basket).agg(
        F.array_sort(F.collect_set(item)).alias("__items")
    )
    if max_basket_items is not None:
        sets = sets.filter(F.size("__items") <= int(max_basket_items))
    pair = F.explode(
        F.expr(
            "flatten(transform(__items, (x, i) -> "
            "transform(slice(__items, i + 2, size(__items)), "
            "y -> struct(x AS item_a, y AS item_b))))"
        )
    ).alias("__p")
    return (
        sets.select(pair)
        .select("__p.item_a", "__p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= int(min_support))
    )


def corr_regression_panel(
    df: DataFrame, group: str, x: str, y: str
) -> DataFrame:
    """Per-group Pearson correlation + OLS slope/intercept of y on x,
    computed from EXACT decimal moment sums (n, Σx, Σy, Σxy, Σx², Σy²)
    rather than Spark's streaming corr/covar aggregates: decimal addition
    is associative, so the panel is bit-stable under any partitioning and
    reproducible in any engine — a floating corr() merge is neither. The
    floating-point ops (one sqrt, three divisions) happen once per GROUP
    on the final exact sums, then round to 6 digits.

    Shape at 100 TB: one scan, one map-side-combined groupBy on the group
    key — the same single-aggregate plan as any sum panel. Degenerate
    groups (zero variance in x or y) return NULL corr/slope rather than
    dividing by zero."""
    # products of two decimal(12,2) inputs stay exact in decimal(30,4);
    # sums get 38-digit headroom
    xd = F.col(x).cast("decimal(18,4)")
    yd = F.col(y).cast("decimal(18,4)")
    g = df.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("decimal(38,4)").alias("sx"),
        F.sum(yd).cast("decimal(38,4)").alias("sy"),
        F.sum((xd * yd).cast("decimal(38,8)")).alias("sxy"),
        F.sum((xd * xd).cast("decimal(38,8)")).alias("sxx"),
        F.sum((yd * yd).cast("decimal(38,8)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy  # n² · covariance
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    corr = F.when(
        (varx_n > 0) & (vary_n > 0), cov_n / F.sqrt(varx_n * vary_n)
    )
    slope = F.when(varx_n > 0, cov_n / varx_n)
    intercept = F.when(varx_n > 0, (sy - (cov_n / varx_n) * sx) / n)
    return g.select(
        group,
        "n",
        det_round(corr, 6).alias("corr_xy"),
        det_round(slope, 6).alias("slope"),
        det_round(intercept, 6).alias("intercept"),
    )


def profile_columns(
    df: DataFrame, columns: list[str] | None = None, exact: bool = False
) -> DataFrame:
    """Long-format column profile — (column, n_nulls, n_distinct,
    min_value, max_value), one row per profiled column — the
    dataset-viewer panel as ONE scan: every per-column statistic is an
    aggregate over the same pass, and the single result row unpivots
    lazily via inline(array(structs)) (no collect, no per-column scan).

    ``exact=False`` (default, the 100 TB path) uses HLL++
    ``approx_count_distinct`` — single-pass, mergeable, ±~2%;
    ``exact=True`` uses COUNT(DISTINCT), which Catalyst expands into one
    extra shuffle per distinct column — the oracle-checkable mode the
    registered query runs at test scale. min/max are cast to string
    AFTER aggregating so the schema is column-type-agnostic."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__n_{c}"))
        aggs.append(
            (F.countDistinct(c) if exact else F.approx_count_distinct(c)).alias(
                f"__d_{c}"
            )
        )
        aggs.append(F.min(c).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__mx_{c}"))
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__n_{c}").alias("n_nulls"),
            F.col(f"__d_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return row.select(F.inline(F.array(*entries)))


def profile_drift(
    df_old: DataFrame,
    df_new: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Column-level drift report between two snapshots of one schema:
    (column, n_nulls_old, n_nulls_new, n_distinct_old, n_distinct_new,
    null_rate_delta, distinct_delta) — the data-contract check a nightly
    load runs before promoting a batch (did a upstream change silently
    null out a column? did cardinality collapse?).

    Two :func:`profile_columns` scans (one per snapshot — they are
    different datasets; there is nothing to fuse) joined on the column
    name, deltas computed on the (columns-count-sized) profile rows.
    Columns present in only one snapshot surface with NULLs on the other
    side via the full outer join — schema drift and stats drift in one
    report."""
    cols_old = columns or df_old.columns
    cols_new = columns or df_new.columns
    # row counts ride as broadcast one-row singletons so the whole report
    # stays lazy (no construction-time count() actions)
    po = (
        profile_columns(df_old, cols_old, exact=exact)
        .crossJoin(F.broadcast(df_old.agg(F.count(F.lit(1)).alias("__rows_old"))))
        .select(
            "column",
            F.col("n_nulls").alias("n_nulls_old"),
            F.col("n_distinct").alias("n_distinct_old"),
            "__rows_old",
        )
    )
    pn = (
        profile_columns(df_new, cols_new, exact=exact)
        .crossJoin(F.broadcast(df_new.agg(F.count(F.lit(1)).alias("__rows_new"))))
        .select(
            "column",
            F.col("n_nulls").alias("n_nulls_new"),
            F.col("n_distinct").alias("n_distinct_new"),
            "__rows_new",
        )
    )
    null_rate_delta = det_round(
        F.coalesce(
            F.col("n_nulls_new") / F.greatest(F.col("__rows_new"), F.lit(1)),
            F.lit(0.0),
        )
        - F.coalesce(
            F.col("n_nulls_old") / F.greatest(F.col("__rows_old"), F.lit(1)),
            F.lit(0.0),
        ),
        6,
    )
    return (
        po.join(pn, "column", "full_outer")
        .select(
            "column",
            "n_nulls_old",
            "n_nulls_new",
            "n_distinct_old",
            "n_distinct_new",
            null_rate_delta.alias("null_rate_delta"),
            (
                F.coalesce(F.col("n_distinct_new"), F.lit(0))
                - F.coalesce(F.col("n_distinct_old"), F.lit(0))
            ).alias("distinct_delta"),
        )
    )


def top_values_per_column(
    df: DataFrame, columns: list[str], k: int = 3
) -> DataFrame:
    """(column, value, n, rank): the k most frequent values of each listed
    (categorical) column — the rest of the profiler panel. One unpivot of
    the listed columns via inline(array(structs)) feeding ONE grouped
    count + one rank window; cost is one scan regardless of how many
    columns are profiled. Values are stringified for a uniform schema;
    NULLs are profiled too (they are usually the interesting value). Ties
    break by value for a deterministic cut."""
    from pyspark.sql import Window

    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(c).cast("string").alias("value"),
        )
        for c in columns
    ]
    counts = (
        df.select(F.inline(F.array(*entries)))
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("column").orderBy(
        F.col("n").desc(), F.col("value").asc_nulls_last()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
