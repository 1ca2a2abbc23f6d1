"""market_flow_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
pinkfloydsito/market-flow (DuckDB + dbt + Airflow + pandas reference), as an
idiomatic Spark DataFrame engine: medallion-layer tables, a star schema, a
flagship wide denormalized export, cleaning/typing operators, imputation,
window analytics, per-group model fitting via applyInPandas, plus
large-scale-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) that the reference does not have.

Every operator is declared via the DataFrame API so Catalyst handles
pushdown, pruning, join selection, and AQE; Python UDFs appear only as
Arrow-batched pandas UDFs where built-ins genuinely cannot express the
semantics (per-group model fit).
"""

__version__ = "0.1.0"

from market_flow_spark.session import get_spark
from market_flow_spark.tables import TABLE_NAMES, load_tables

__all__ = ["get_spark", "load_tables", "TABLE_NAMES", "__version__"]
