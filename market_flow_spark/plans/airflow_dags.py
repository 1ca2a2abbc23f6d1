"""Airflow orchestration shim (SURVEY §3.1; BASELINE "Spark jobs scheduled
via Airflow").

The reference runs its pipeline as Airflow DAGs carrying data between tasks
over XCom; here every task is a thin wrapper over a Spark job and NO data
crosses task boundaries — tasks share only the warehouse path. The DAG
exists when Airflow is installed; without it this module still imports and
the same callables run under any scheduler (or none — see
plans/pipeline.py).

Task graph (mirrors the reference's make run-full-pipeline order,
Makefile:114-141, minus the sleep synchronization — Airflow dependencies
replace the sleeps):

    ingest_raw  →  build_staging  →  build_dims  →  build_analytics
"""

from __future__ import annotations

from typing import Any

from market_flow_spark.plans import pipeline
from market_flow_spark.session import get_spark
from market_flow_spark.tables import load_tables

try:  # pragma: no cover - exercised only where airflow is installed
    from airflow import DAG
    from airflow.operators.python import PythonOperator

    HAS_AIRFLOW = True
except Exception:  # airflow not installed in this environment
    DAG = None
    PythonOperator = None
    HAS_AIRFLOW = False


def task_build_staging(sf_dir: str, warehouse: str) -> None:
    spark = get_spark(app_name="mfs-staging")
    tables = load_tables(spark, sf_dir)
    for name, df in pipeline.build_staging(tables).items():
        from market_flow_spark.sources.sinks import export_parquet

        export_parquet(df, f"{warehouse}/staging/{name}")


def task_build_dims(sf_dir: str, warehouse: str) -> None:
    spark = get_spark(app_name="mfs-dims")
    tables = load_tables(spark, sf_dir)
    for name, df in pipeline.build_dims(tables).items():
        from market_flow_spark.sources.sinks import export_parquet

        export_parquet(df, f"{warehouse}/analytics/{name}")


def task_build_analytics(sf_dir: str, warehouse: str) -> None:
    spark = get_spark(app_name="mfs-analytics")
    tables = load_tables(spark, sf_dir)
    analytics = pipeline.build_analytics(tables)
    from market_flow_spark.sources.sinks import export_parquet

    export_parquet(
        analytics["fact_transactions"],
        f"{warehouse}/analytics/fact_transactions",
        partition_by=["date_sk"],
    )
    export_parquet(
        analytics["flagship_wide"],
        f"{warehouse}/analytics/flagship_wide",
        partition_by=["year"],
    )


def build_dag(sf_dir: str, warehouse: str, **dag_kwargs: Any):
    """Return the Airflow DAG, or None when Airflow is absent."""
    if not HAS_AIRFLOW:
        return None
    dag = DAG(dag_id="market_flow_spark_pipeline", **dag_kwargs)
    with dag:
        staging = PythonOperator(
            task_id="build_staging",
            python_callable=task_build_staging,
            op_args=[sf_dir, warehouse],
        )
        dims = PythonOperator(
            task_id="build_dims",
            python_callable=task_build_dims,
            op_args=[sf_dir, warehouse],
        )
        analytics = PythonOperator(
            task_id="build_analytics",
            python_callable=task_build_analytics,
            op_args=[sf_dir, warehouse],
        )
        staging >> dims >> analytics
    return dag
