"""Declarative data-quality checks (SURVEY §5).

The reference configures dbt with a test path but ships zero tests; this
module supplies the checks its schema *should* have declared —
not_null / unique / accepted_values / relationship (referential integrity) —
as composable DataFrame assertions.

Each check compiles to ONE aggregate (violation count), so a whole suite
over a 100 TB table is a handful of scans, not row-by-row validation; the
relationship check is a left-anti join (violations = orphans). Results come
back as plain records so callers can route them (fail the pipeline, emit
metrics, write an audit table).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    check: str
    table: str
    column: str
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def check_not_null(df: DataFrame, column: str, table: str = "") -> CheckResult:
    n = df.filter(F.col(column).isNull()).count()
    return CheckResult("not_null", table, column, n)


def check_unique(df: DataFrame, column: str, table: str = "") -> CheckResult:
    dup = (
        df.groupBy(column)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("v"))
        .collect()[0]
        .v
    )
    return CheckResult("unique", table, column, int(dup))


def check_accepted_values(
    df: DataFrame, column: str, values: list, table: str = ""
) -> CheckResult:
    n = df.filter(~F.col(column).isin(values) | F.col(column).isNull()).count()
    return CheckResult("accepted_values", table, column, n)


def check_relationship(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    table: str = "",
) -> CheckResult:
    """Referential integrity: every child FK must exist in the parent —
    violations are the anti-join count (orphan rows)."""
    orphans = child.select(F.col(child_col).alias("__k")).join(
        parent.select(F.col(parent_col).alias("__k")), on="__k", how="left_anti"
    )
    return CheckResult("relationship", table, child_col, orphans.count())


def run_star_schema_checks(tables: dict[str, DataFrame]) -> list[CheckResult]:
    """The dbt-style suite for the built star schema: key integrity on the
    fact and dims (what dbt/models/*/schema.yml should have declared)."""
    from market_flow_spark.operators import dims, star

    fact = star.fact_transactions(tables)
    dim_product = dims.dim_product(tables["part"])
    dim_date = dims.dim_date_scaffold(tables["orders"])

    results = [
        check_not_null(fact, "transaction_id", "fact_transactions"),
        check_unique(fact, "transaction_id", "fact_transactions"),
        check_not_null(fact, "price", "fact_transactions"),
        check_unique(dim_product, "product_sk", "dim_product"),
        check_unique(dim_product, "p_partkey", "dim_product"),
        check_unique(dim_date, "date_sk", "dim_date"),
        check_relationship(
            fact, "product_id", tables["part"], "p_partkey", "fact_transactions"
        ),
        check_relationship(
            fact, "customer_id", tables["customer"], "c_custkey", "fact_transactions"
        ),
        check_relationship(
            fact, "date_sk", dim_date, "date_sk", "fact_transactions"
        ),
    ]
    return results


def run_checks_fused(
    df: DataFrame,
    not_null: list[str] | None = None,
    accepted_values: dict[str, list] | None = None,
    positive: list[str] | None = None,
    table: str = "",
) -> list[CheckResult]:
    """All scan-local checks (not_null / accepted_values / positive) in ONE
    aggregate over ONE scan — at 100 TB the difference between a quality
    gate that costs one pass and one that costs one pass per declared
    check. unique/relationship stay separate (they need a shuffle/join by
    nature)."""
    aggs = []
    labels: list[tuple[str, str]] = []
    for c in not_null or []:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")))
        labels.append(("not_null", c))
    for c, vals in (accepted_values or {}).items():
        aggs.append(
            F.sum(
                (F.col(c).isNotNull() & ~F.col(c).isin(vals)).cast("bigint")
            )
        )
        labels.append(("accepted_values", c))
    for c in positive or []:
        aggs.append(
            F.sum(
                (F.col(c).isNotNull() & (F.col(c) <= 0)).cast("bigint")
            )
        )
        labels.append(("positive", c))
    if not aggs:
        return []
    row = df.agg(*[a.alias(f"v{i}") for i, a in enumerate(aggs)]).collect()[0]
    return [
        CheckResult(check, table, col, int(row[f"v{i}"] or 0))
        for i, (check, col) in enumerate(labels)
    ]
