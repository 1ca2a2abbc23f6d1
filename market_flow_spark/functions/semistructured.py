"""Semi-structured columns beyond JSON strings: the VARIANT type.

`queries.q_json_props_stats` covers the classic path (get_json_object
over a JSON string — reference has no JSON at all, SURVEY §2.8
"absent"). At 100 TB that path re-parses the string for every extracted
field; Spark 4's VARIANT type parses ONCE into a binary-encoded value
that every `variant_get` then navigates without re-parsing (and that
parquet writers can shred into typed subcolumns, restoring min/max
pruning for paths). These helpers model that tier:

- ``events_as_variant``: one `parse_json` per row over a composed JSON
  document (type/value/ids/props merged), the single-parse artifact.
- ``variant_typed_view``: typed extraction via `try_variant_get` —
  casts happen inside the variant decoder, malformed paths go NULL
  instead of failing the job.
- ``variant_schema_profile``: `schema_of_variant_agg` per group — the
  drift monitor for a landing zone of heterogeneous payloads (which
  new fields appeared this batch, did a type widen).

Extraction is all JVM-side expressions (no UDF); the registered query's
oracle aggregates the SOURCE columns directly, so a hash match proves
the construct→parse→extract round trip is value-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def events_as_variant(events: DataFrame) -> DataFrame:
    """(event_id, v VARIANT): compose the event's typed columns plus its
    raw JSON `props` payload into ONE JSON document and parse it to a
    binary variant. `props` rides along as a nested object (parsed, not
    re-quoted), so nested-path extraction is exercised for real."""
    # JSON-quote the string field by hand (escape \ then "); to_json only
    # accepts container types, and the event types are plain ASCII tokens
    etype_json = F.concat(
        F.lit('"'),
        F.regexp_replace(
            F.regexp_replace(F.col("event_type"), r"\\", r"\\\\"), '"', r"\\\""
        ),
        F.lit('"'),
    )
    doc = F.concat(
        F.lit('{"type":'),
        etype_json,
        F.lit(',"value":'),
        F.coalesce(F.col("value").cast("string"), F.lit("null")),
        F.lit(',"ids":'),
        F.to_json(F.array(F.col("user_id"), F.col("event_id"))),
        F.lit(',"props":'),
        F.coalesce(F.col("props"), F.lit("null")),
        F.lit("}"),
    )
    return events.select("event_id", F.parse_json(doc).alias("v"))


def variant_typed_view(variants: DataFrame) -> DataFrame:
    """Typed columns back out of the variant: string / double / array
    element / nested-object path, each via try_variant_get (NULL on
    missing path or failed cast — the permissive read a landing zone
    needs)."""
    return variants.select(
        "event_id",
        F.try_variant_get("v", "$.type", "string").alias("etype"),
        F.try_variant_get("v", "$.value", "double").alias("value"),
        F.try_variant_get("v", "$.ids[0]", "bigint").alias("user_id"),
        F.try_variant_get("v", "$.props.k", "int").alias("k"),
    )


def variant_round_trip_stats(events: DataFrame) -> DataFrame:
    """Per-type aggregate computed ENTIRELY from variant-extracted
    columns — the registered, oracle-checked round trip."""
    from market_flow_spark.functions.aggregates import det_round

    typed = variant_typed_view(events_as_variant(events))
    return typed.groupBy("etype").agg(
        F.count(F.lit(1)).alias("n_events"),
        # decimal-sum then round: double addition is partition-order-
        # dependent; decimal is exact, so the hash is stable on any plan
        det_round(F.sum(F.col("value").cast("decimal(27,6)")).cast("double"), 2).alias(
            "sum_value"
        ),
        F.countDistinct("user_id").alias("n_users"),
        F.max("k").alias("max_k"),
    )


def variant_schema_profile(events: DataFrame) -> DataFrame:
    """Per-event-type merged variant schema — schema drift monitoring
    over a heterogeneous payload column (engine-specific schema string,
    so pytest-pinned rather than DuckDB-checked)."""
    return (
        events.select(
            "event_type",
            F.parse_json(F.coalesce("props", F.lit("null"))).alias("pv"),
        )
        .groupBy("event_type")
        .agg(F.schema_of_variant_agg("pv").alias("props_schema"))
    )
