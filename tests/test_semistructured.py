"""VARIANT tier and UNPIVOT reshape: oracle parity, permissive-path
semantics, schema-drift profiling, and plan hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_flow_spark.functions import semistructured as ss
from market_flow_spark.queries_all import ORACLES, QUERIES


def _pairs(df, cols):
    return sorted((tuple(r[c] for c in cols) for r in df.collect()), key=str)


def test_variant_round_trip_matches_source_oracle(spark, sf_dir, duck):
    cols = ["etype", "n_events", "sum_value", "n_users", "max_k"]
    got = _pairs(QUERIES["variant_events_stats"](spark, sf_dir), cols)
    exp = sorted(
        (tuple(t) for t in duck.execute(ORACLES["variant_events_stats"]).fetchall()),
        key=str,
    )
    assert got == exp


def test_unpivot_matches_duckdb_unpivot(spark, sf_dir, duck):
    cols = ["l_returnflag", "metric", "value"]
    got = _pairs(QUERIES["unpivot_flag_metrics"](spark, sf_dir), cols)
    exp = sorted(
        (tuple(t) for t in duck.execute(ORACLES["unpivot_flag_metrics"]).fetchall()),
        key=str,
    )
    assert got == exp
    # 3 metrics per flag, every metric name present
    metrics = {m for (_, m, _) in got}
    assert metrics == {"sum_qty", "sum_price", "n_rows"}


def test_try_variant_get_is_permissive(spark):
    """Missing paths and failed casts go NULL — never fail the job (the
    landing-zone contract)."""
    ev = spark.createDataFrame(
        [
            (1, "click", 1.5, 7, '{"k": 3}'),
            (2, "view", None, 8, None),  # null value and props
            (3, "err", 2.0, 9, '{"k": "not-an-int"}'),  # failed cast
        ],
        "event_id long, event_type string, value double, user_id long, props string",
    )
    typed = {r["event_id"]: r for r in ss.variant_typed_view(
        ss.events_as_variant(ev)
    ).collect()}
    assert typed[1]["k"] == 3 and typed[1]["value"] == 1.5
    assert typed[2]["value"] is None and typed[2]["k"] is None
    assert typed[3]["k"] is None  # cast failure -> NULL, not error
    assert typed[3]["etype"] == "err"


def test_variant_json_quoting_escapes(spark):
    """Event types containing quotes/backslashes survive the manual JSON
    quoting round trip."""
    ev = spark.createDataFrame(
        [(1, 'we"ird\\type', 1.0, 2, None)],
        "event_id long, event_type string, value double, user_id long, props string",
    )
    row = ss.variant_typed_view(ss.events_as_variant(ev)).first()
    assert row["etype"] == 'we"ird\\type'


def test_variant_schema_profile_detects_drift(spark, tables):
    """The corpus props are homogeneous {"k": int} → one merged OBJECT
    schema per event type; adding a payload with a new field widens the
    merged schema string."""
    prof = {
        r["event_type"]: r["props_schema"]
        for r in ss.variant_schema_profile(tables["events"]).collect()
    }
    assert prof and all(s == "OBJECT<k: BIGINT>" for s in prof.values())

    drifted = spark.createDataFrame(
        [("click", '{"k": 1}'), ("click", '{"k": 2, "lang": "en"}')],
        "event_type string, props string",
    )
    merged = ss.variant_schema_profile(drifted).first()["props_schema"]
    assert "lang" in merged and "k" in merged


def test_variant_and_unpivot_plans_are_jvm_side(spark, sf_dir):
    for name in ("variant_events_stats", "unpivot_flag_metrics"):
        plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
    # unpivot plans as Expand (one pass), not a union of per-metric scans
    up = QUERIES["unpivot_flag_metrics"](spark, sf_dir)
    assert "Expand" in up._jdf.queryExecution().executedPlan().toString()
