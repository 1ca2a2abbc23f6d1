"""Aggregated registry: importing this module loads every query module so
QUERIES/ORACLES are complete, then re-emits them in an explicit priority
order.

Why the explicit order matters: the driver's correctness harness checks the
first 50 registered queries against their DuckDB oracles (rows + schema +
value hash at sf0.01) — that row is the HARD evidence tier, above the local
pytest sweep (tests/test_oracle_parity.py, which still runs EVERY registered
oracle every suite run — no hardcoded count; len(ORACLES) is the source of
truth).

Window structure (since round 6, per the round-5 verdict's #1 ask): a
15-query PERMANENT CORE — one representative per SURVEY.md §2 family plus
the flagship — and 35 ROTATING slots scheduled strictly by
"never-driver-certified first", then "oldest certification first".

Round-11 rotation (this file's current window), scheduled by the
standing rule — never-driver-certified first (two: this round's new
registrations; every name registered before round 11 has carried a green
driver row as of CORRECTNESS_r10), then oldest certification first:
  slots 1-2 (never certified, round-11 operators):
    exact_substring_dedup (the APPLY half of the Lee et al.
    exact-substring pipeline: every duplicated span cut from its
    document's normalized text, returning the cleaned corpus + per-doc
    cut sizes) and semantic_dedup_keep_banded (SemDeDup keep-list over
    the banded near-dup pair graph — the measured-higher-recall
    candidate generator).
  slots 3-17 (the 15 remaining r7-certified names — the documented
    round-11 refresh front, alphabetical): langid_trigram,
    nb_classify_lang, pit_part_price_sales, price_anomalies,
    price_histogram, price_percentiles, profile_drift_orders,
    profile_orders, rolling_median_price, theta_overlap_years,
    token_budget_select, unpivot_flag_metrics, url_canonical_dedup,
    weighted_sample_docs, window_panel.
  slots 18-35 (18 of the 35 r8-certified names, alphabetical — no
    intra-round priority signal): ann_lsh_topk, asof_last_view,
    contamination_ngram, corpus_prefilter, cube_returnflag_priority,
    dedup_exact, dedup_minhash_incremental, dedup_ngram_jaccard,
    dedup_word_jaccard, embedding_near_dup, events_typed,
    float_key_join, forecast_horizon, ivf_topk, json_props_stats,
    kmv_distinct_parts, monthly_event_stats, multimodal_bytes.
    (multimodal_frames and page_and_tail were displaced by the round's
    two never-certified registrations, per the standing rule.)
  Round-12 refresh front (verdict r10 ask #6 — documented ahead of the
  window): the 17 remaining r8-certified names (multimodal_frames,
  page_and_tail, pii_redact,
  range_join_nearby, rollup_revenue, seasonal_forecast, session_windows,
  simhash_pairs, simhash_signatures, sliding_window_stats, span_dedup,
  theta_rollup_custkeys, tumbling_hour_stats, user_sessions_core,
  variant_events_stats, winnow_containment, winnow_containment_capped),
  then the r9 cohort (35 names, alphabetical). Any query registered in
  round 11+ is never-certified and takes the first rotating slots, per
  the standing rule.

Permanent core (always in-window; each anchors a §2 family):
  flagship_wide (J2 star join)      fact_transactions (J4/J11/W2)
  stg_transactions_typed (P1/P2/F5) unit_conversion (F1/F2/F4)
  dim_country_merged (A2/U1/W1)     dim_date (A3/J6/F12)
  table_audit (A4/A10)              rolling_ma30 (W3)
  group_mean_impute (A13/P7)        anti_join_missing_months (J9/J10/J5)
  top10_products (O2/O4)            dedup_minhash_lsh (dedup tier)
  cosine_topk (similarity tier)     text_profile (text tier)
  linear_forecast (UD1)

Rotated OUT this round: the full r10 rotating cohort (all 35 driver-green
in CORRECTNESS_r10, still in the local all-oracle parity sweep every
suite run). The r1-r10 past-window set listed in prior revisions of this
docstring remains driver-green and local-sweep-green.
"""

from __future__ import annotations

import market_flow_spark.queries as _core
import market_flow_spark.queries_ext as _ext  # noqa: F401  (registers on import)

# The first 50 names land in the driver's correctness window: 15-query
# permanent core + 35 rotating slots (never-driver-certified first).
_PRIORITY: list[str] = [
    # ---- permanent core (15) — one per SURVEY §2 family + flagship ----
    "flagship_wide",
    "fact_transactions",
    "stg_transactions_typed",
    "unit_conversion",
    "dim_country_merged",
    "dim_date",
    "table_audit",
    "rolling_ma30",
    "group_mean_impute",
    "anti_join_missing_months",
    "top10_products",
    "dedup_minhash_lsh",
    "cosine_topk",
    "text_profile",
    "linear_forecast",
    # ---- rotating slots (35): never-driver-certified first -------------
    # never certified (2): the round-11 apply half of the exact-substring
    # pipeline, and the SemDeDup keep-list over the banded pair graph
    "exact_substring_dedup",
    "semantic_dedup_keep_banded",
    # last green in r7 (the 15 remaining r7 names, alphabetical)
    "langid_trigram",
    "nb_classify_lang",
    "pit_part_price_sales",
    "price_anomalies",
    "price_histogram",
    "price_percentiles",
    "profile_drift_orders",
    "profile_orders",
    "rolling_median_price",
    "theta_overlap_years",
    "token_budget_select",
    "unpivot_flag_metrics",
    "url_canonical_dedup",
    "weighted_sample_docs",
    "window_panel",
    # last green in r8 (18 of 35, alphabetical)
    "ann_lsh_topk",
    "asof_last_view",
    "contamination_ngram",
    "corpus_prefilter",
    "cube_returnflag_priority",
    "dedup_exact",
    "dedup_minhash_incremental",
    "dedup_ngram_jaccard",
    "dedup_word_jaccard",
    "embedding_near_dup",
    "events_typed",
    "float_key_join",
    "forecast_horizon",
    "ivf_topk",
    "json_props_stats",
    "kmv_distinct_parts",
    "monthly_event_stats",
    "multimodal_bytes",
]

_WINDOW = 50
assert len(_PRIORITY) == _WINDOW, f"priority list has {len(_PRIORITY)} entries"
_missing = [n for n in _PRIORITY if n not in _core.QUERIES]
assert not _missing, f"priority names not registered: {_missing}"

QUERIES = {n: _core.QUERIES[n] for n in _PRIORITY}
QUERIES.update({n: f for n, f in _core.QUERIES.items() if n not in QUERIES})
ORACLES = {n: _core.ORACLES[n] for n in QUERIES if n in _core.ORACLES}
