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

Round-10 rotation (this file's current window), scheduled by the
standing rule — never-driver-certified first, then oldest certification
first:
  slots 1-2 (never certified): embedding_near_dup_banded (round-10
    operator — the banded sign-LSH shape that repairs the recall the
    measured escalation regime pays; disjoint sign bands at equal
    emission to a single wider block) and embedding_near_dup_banded_routed
    (the same tier behind its emission-aware layout chooser — the ladder
    (4,10)→(3,21)→(2,32)→(1,64) walked until the sampled emission fits
    the 2e6 cap).
  slots 3-15 (the 13 remaining r6-certified names — the documented
    round-10 refresh front, alphabetical): pmi_collocations,
    repetition_stats, scd2_part_prices, semantic_dedup_keep,
    sequence_packing, snapshot_diff_orders, tfidf_doc_similarity,
    token_counts, top_tokens_per_lang, top_values_orders,
    unigram_logprob, view_click_attribution, winsorize_prices.
  slots 16-35 (20 of the 35 r7-certified names, alphabetical — no
    intra-round priority signal): basket_pairs, cms_heavy_hitters,
    contamination_exact, contamination_exact_bloomed, corpus_clean,
    corpus_kl_by_lang, corpus_shuffle, corr_quantity_price,
    country_name_cleaning, curriculum_stages, domain_url_stats,
    drift_score_odd_vs_even, dsir_weights, ewma_daily_price_unbounded,
    ewma_monthly_price, feature_encode_panel, gap_fill_months,
    interval_price_bands, kmv_distinct_by_returnflag, knn_label_vote.
  The 15 remaining r7-certified names (langid_trigram, nb_classify_lang,
  pit_part_price_sales, price_anomalies, price_histogram,
  price_percentiles, profile_drift_orders, profile_orders,
  rolling_median_price, theta_overlap_years, token_budget_select,
  unpivot_flag_metrics, url_canonical_dedup, weighted_sample_docs,
  window_panel) are the round-11 refresh front, followed by the r8
  cohort (35 names). (langid_trigram and nb_classify_lang were displaced
  by this round's two never-certified registrations, per the standing
  rule.)

Permanent core (always in-window; each anchors a §2 family):
  flagship_wide (J2 star join)      fact_transactions (J4/J11/W2)
  stg_transactions_typed (P1/P2/F5) unit_conversion (F1/F2/F4)
  dim_country_merged (A2/U1/W1)     dim_date (A3/J6/F12)
  table_audit (A4/A10)              rolling_ma30 (W3)
  group_mean_impute (A13/P7)        anti_join_missing_months (J9/J10/J5)
  top10_products (O2/O4)            dedup_minhash_lsh (dedup tier)
  cosine_topk (similarity tier)     text_profile (text tier)
  linear_forecast (UD1)

Rotated OUT this round: the full r9 rotating cohort (all 35 driver-green
in CORRECTNESS_r09, still in the local all-oracle parity sweep every
suite run). The r1-r9 past-window set listed in prior revisions of this
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
    # never certified (2): the round-10 banded near-dup operator + its
    # emission-aware layout-routed shape
    "embedding_near_dup_banded",
    "embedding_near_dup_banded_routed",
    # last green in r6 (the 13 remaining r6 names, alphabetical)
    "pmi_collocations",
    "repetition_stats",
    "scd2_part_prices",
    "semantic_dedup_keep",
    "sequence_packing",
    "snapshot_diff_orders",
    "tfidf_doc_similarity",
    "token_counts",
    "top_tokens_per_lang",
    "top_values_orders",
    "unigram_logprob",
    "view_click_attribution",
    "winsorize_prices",
    # last green in r7 (20 of 35, alphabetical)
    "basket_pairs",
    "cms_heavy_hitters",
    "contamination_exact",
    "contamination_exact_bloomed",
    "corpus_clean",
    "corpus_kl_by_lang",
    "corpus_shuffle",
    "corr_quantity_price",
    "country_name_cleaning",
    "curriculum_stages",
    "domain_url_stats",
    "drift_score_odd_vs_even",
    "dsir_weights",
    "ewma_daily_price_unbounded",
    "ewma_monthly_price",
    "feature_encode_panel",
    "gap_fill_months",
    "interval_price_bands",
    "kmv_distinct_by_returnflag",
    "knn_label_vote",
]

_WINDOW = 50
assert len(_PRIORITY) == _WINDOW, f"priority list has {len(_PRIORITY)} entries"
_missing = [n for n in _PRIORITY if n not in _core.QUERIES]
assert not _missing, f"priority names not registered: {_missing}"

QUERIES = {n: _core.QUERIES[n] for n in _PRIORITY}
QUERIES.update({n: f for n, f in _core.QUERIES.items() if n not in QUERIES})
ORACLES = {n: _core.ORACLES[n] for n in QUERIES if n in _core.ORACLES}
