# Entry points mirroring the reference's Makefile workflow
# (run-full-pipeline / dbt-run / dbt-test), Spark-native.

SF_DIR ?= /root/testdata/sf0.001
WAREHOUSE ?= /tmp/mfs-warehouse

.PHONY: test test-sf001 test-sf01 bench pipeline quality smoke

test:
	python -m pytest tests/ -q

test-sf01:
	SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_oracle_parity.py -q

bench:
	python bench.py

# the reference's `make run-full-pipeline` analog: raw → staging → analytics
pipeline:
	python -c "from market_flow_spark.session import get_spark; \
from market_flow_spark.plans.pipeline import run_pipeline; \
import json; \
print(json.dumps(run_pipeline(get_spark(), '$(SF_DIR)', '$(WAREHOUSE)'), indent=2))"

# the reference's `make dbt-test` analog: data-quality suite over the star schema
quality:
	python -c "from market_flow_spark.session import get_spark; \
from market_flow_spark.tables import load_tables; \
from market_flow_spark.quality import run_star_schema_checks; \
spark = get_spark(); \
results = run_star_schema_checks(load_tables(spark, '$(SF_DIR)')); \
[print(f'{r.check:20s} {r.table}.{r.column}: ' + ('PASS' if r.passed else f'FAIL ({r.violations})')) for r in results]; \
import sys; sys.exit(0 if all(r.passed for r in results) else 1)"

smoke:
	python -c "from market_flow_spark.session import get_spark; \
import __spark_entry__ as e; \
print('flagship rows:', e.entry(get_spark()).count())"
