"""Aggregated registry: importing this module loads every query module so
QUERIES/ORACLES are complete, then re-emits them in an explicit priority
order.

Why the explicit order matters: the driver's correctness harness checks the
first 50 registered queries against their DuckDB oracles (rows + schema +
value hash at sf0.01) — that row is the HARD evidence tier, above the local
pytest sweep (tests/test_oracle_parity.py, which still runs every oracle —
all 126 as of late round 6 — every suite run).

Round-6 restructure (per the round-5 verdict's #1 ask): the window is now a
15-query PERMANENT CORE — one representative per SURVEY.md §2 family plus
the flagship — and 35 ROTATING slots scheduled strictly by
"never-driver-certified first". 54 of 115 registered queries had no driver
CORRECTNESS row in any of rounds 1-5 (all local-parity-green; the gap is
evidence tier, not correctness). This round certifies 35 of them; the
remaining 19 are the round-7 rotation, listed below so the next rotation is
mechanical.

Permanent core (always in-window; each anchors a §2 family):
  flagship_wide (J2 star join)      fact_transactions (J4/J11/W2)
  stg_transactions_typed (P1/P2/F5) unit_conversion (F1/F2/F4)
  dim_country_merged (A2/U1/W1)     dim_date (A3/J6/F12)
  table_audit (A4/A10)              rolling_ma30 (W3)
  group_mean_impute (A13/P7)        anti_join_missing_months (J9/J10/J5)
  top10_products (O2/O4)            dedup_minhash_lsh (dedup tier)
  cosine_topk (similarity tier)     text_profile (text tier)
  linear_forecast (UD1)

Round-7 rotation backlog (the 19 never-certified names NOT in this round's
window — swap these into the 35 rotating slots next round; every one is
local-parity-green today):
  contamination_exact, contamination_exact_bloomed, country_name_cleaning,
  price_percentiles, price_histogram, price_anomalies, corpus_clean,
  corpus_shuffle, curriculum_stages, knn_label_vote,
  kmv_distinct_by_returnflag, window_panel, feature_encode_panel,
  basket_pairs, gap_fill_months, corr_quantity_price, weighted_sample_docs,
  theta_overlap_years, unpivot_flag_metrics
plus the twelve queries added later in round 6 (also never-certified,
local-parity-green): url_canonical_dedup, domain_url_stats,
nb_classify_lang, ewma_monthly_price, ewma_daily_price_unbounded,
interval_price_bands, cms_heavy_hitters, pit_part_price_sales,
corpus_kl_by_lang, rolling_median_price, token_budget_select,
drift_score_odd_vs_even — 31 names total, fitting one round-7 window
(31 rotating + the 15-core leaves 4 slots for re-certifying
rotated-out names).

Rotated OUT this round to make room (every one carries a green driver row
from r1-r5 — hash-certified at least once — and stays in the local sweep):
  json_props_stats, dim_product, price_summary_stats, country_month_avg,
  sales_agg_profile, filter_suite, mean_impute, ffill_bfill_impute,
  normalized_join, upsert_plan, corpus_prefilter, dedup_exact,
  dedup_word_jaccard, contamination_ngram, dedup_minhash_incremental,
  simhash_pairs, winnow_containment, span_dedup, ivf_topk,
  embedding_near_dup, kmv_distinct_parts, theta_rollup_custkeys,
  variant_events_stats, multimodal_frames, best_markets, pivot_returnflag,
  tumbling_hour_stats, session_windows, asof_last_view, range_join_nearby,
  rollup_revenue, cube_returnflag_priority, stratified_sample,
  train_test_split, quota_cap
(plus the r5-era past-window set: forecast_horizon, page_and_tail,
float_key_join, ann_lsh_topk, seasonal_forecast, monthly_event_stats,
events_typed, simhash_signatures, multimodal_bytes, dedup_ngram_jaccard,
sliding_window_stats — all r1-r5 driver-green, local-sweep-green.)
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
    # heavy text / language-model tier
    "langid_trigram",
    "tfidf_doc_similarity",
    "bigram_logprob",
    "unigram_logprob",
    "bm25_topk",
    "dsir_weights",
    "winsorize_prices",
    "token_counts",
    "repetition_stats",
    "pii_scan",
    "top_tokens_per_lang",
    "pmi_collocations",
    # warehouse operations
    "grouping_sets_sales",
    "scd2_part_prices",
    "cdc_apply_orders",
    "snapshot_diff_orders",
    "merge_aggregate_returnflag",
    "profile_orders",
    "profile_drift_orders",
    "top_values_orders",
    # behavioral / funnel analytics
    "funnel_view_click_purchase",
    "cohort_retention",
    "event_transitions",
    "view_click_attribution",
    # packing / sampling / selection
    "sequence_packing",
    "chunk_documents",
    "mixture_sample",
    "kfold_orders",
    "leakage_safe_split",
    "semantic_dedup_keep",
    # iterative graph / cluster tier
    "pagerank_part_supplier",
    "dedup_cluster_sizes",
    "dedup_clusters_minhash",
    # fuzzy matching / sketch algebra
    "fuzzy_customer_names",
    "kmv_overlap_parts",
]

_WINDOW = 50
assert len(_PRIORITY) == _WINDOW, f"priority list has {len(_PRIORITY)} entries"
_missing = [n for n in _PRIORITY if n not in _core.QUERIES]
assert not _missing, f"priority names not registered: {_missing}"

QUERIES = {n: _core.QUERIES[n] for n in _PRIORITY}
QUERIES.update({n: f for n, f in _core.QUERIES.items() if n not in QUERIES})
ORACLES = {n: _core.ORACLES[n] for n in QUERIES if n in _core.ORACLES}
