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

Round-12 rotation (this file's current window), scheduled by the
standing rule — never-driver-certified first (six: this round's new
registrations; every name registered before round 12 has carried a green
driver row as of CORRECTNESS_r11), then oldest certification first:
  slots 1-6 (never certified, round-12 operators, alphabetical):
    dedup_clusters_twostar (connected components by alternating
    large-star/small-star — Kiveris et al. 2014, O(log² n) rounds
    regardless of pair-graph diameter), gopher_quality (the Rae et
    al. 2021 line/word-shape rules — bullet/ellipsis line ratios,
    alpha-word ratio, symbol ratio, stopword floor — one scan-fused
    projection), ngram_novelty (share of a doc's distinct 3-grams
    first seen in that doc — the template-recombination curation
    signal no pairwise tier flags), semantic_dedup_keep_routed
    (SemDeDup keep-list behind the emission-routed candidate
    generator — verdict r11 ask #3's supersession closure: base sign
    block under the cap, banded ladder beyond), token_entropy
    (per-doc Shannon entropy of the doc's own token distribution +
    ln(n_types)-normalized ratio — the lexical-diversity gate between
    repetition_stats and unigram_logprob), and zipf_fit (OLS
    ln-freq ~ ln-rank over the frequency head, 1e-9 fixed-point sums
    for cross-engine determinism — the no-reference-model corpus
    drift alarm).
  slots 7-23 (the 17 remaining r8-certified names — the documented
    round-12 refresh front, alphabetical): multimodal_frames,
    page_and_tail, pii_redact, range_join_nearby, rollup_revenue,
    seasonal_forecast, session_windows, simhash_pairs,
    simhash_signatures, sliding_window_stats, span_dedup,
    theta_rollup_custkeys, tumbling_hour_stats, user_sessions_core,
    variant_events_stats, winnow_containment, winnow_containment_capped.
  slots 24-35 (12 of the 35 r9-certified names, alphabetical — no
    intra-round priority signal): best_markets, bigram_logprob,
    bm25_topk, cdc_apply_orders, chunk_documents, cohort_retention,
    country_month_avg, dedup_cluster_sizes, dedup_clusters_minhash,
    dedup_word_jaccard_routed, dim_product, embedding_near_dup_routed.
  Round-13 refresh front (documented ahead of the window): the 23
  remaining r9-certified names (event_transitions,
  exact_substring_spans,
  ffill_bfill_impute, filter_suite, funnel_view_click_purchase,
  fuzzy_customer_names, grouping_sets_sales, kfold_orders,
  kmv_overlap_parts, leakage_safe_split, mean_impute,
  merge_aggregate_returnflag, mixture_sample, normalized_join,
  pagerank_part_supplier, pii_scan, pivot_returnflag,
  price_summary_stats, quota_cap, sales_agg_profile,
  stratified_sample, train_test_split, upsert_plan), then the r10
  cohort (35 names, alphabetical). Any query registered in round 12+
  is never-certified and takes the first rotating slots, per the
  standing rule.

Permanent core (always in-window; each anchors a §2 family):
  flagship_wide (J2 star join)      fact_transactions (J4/J11/W2)
  stg_transactions_typed (P1/P2/F5) unit_conversion (F1/F2/F4)
  dim_country_merged (A2/U1/W1)     dim_date (A3/J6/F12)
  table_audit (A4/A10)              rolling_ma30 (W3)
  group_mean_impute (A13/P7)        anti_join_missing_months (J9/J10/J5)
  top10_products (O2/O4)            dedup_minhash_lsh (dedup tier)
  cosine_topk (similarity tier)     text_profile (text tier)
  linear_forecast (UD1)

Rotated OUT this round: the full r11 rotating cohort (all 35 driver-green
in CORRECTNESS_r11, still in the local all-oracle parity sweep every
suite run). The r1-r11 past-window set listed in prior revisions of this
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
    # never certified (6, alphabetical): the round-12 two-star components
    # algorithm, the Gopher line/word-shape quality rules, the n-gram
    # novelty curation signal, the emission-routed SemDeDup entry, the
    # per-doc token-entropy diversity gate, and the Zipf power-law
    # corpus diagnostic
    "dedup_clusters_twostar",
    "gopher_quality",
    "ngram_novelty",
    "semantic_dedup_keep_routed",
    "token_entropy",
    "zipf_fit",
    # last green in r8 (the 17 remaining r8 names, alphabetical)
    "multimodal_frames",
    "page_and_tail",
    "pii_redact",
    "range_join_nearby",
    "rollup_revenue",
    "seasonal_forecast",
    "session_windows",
    "simhash_pairs",
    "simhash_signatures",
    "sliding_window_stats",
    "span_dedup",
    "theta_rollup_custkeys",
    "tumbling_hour_stats",
    "user_sessions_core",
    "variant_events_stats",
    "winnow_containment",
    "winnow_containment_capped",
    # last green in r9 (12 of 35, alphabetical)
    "best_markets",
    "bigram_logprob",
    "bm25_topk",
    "cdc_apply_orders",
    "chunk_documents",
    "cohort_retention",
    "country_month_avg",
    "dedup_cluster_sizes",
    "dedup_clusters_minhash",
    "dedup_word_jaccard_routed",
    "dim_product",
    "embedding_near_dup_routed",
]

_WINDOW = 50
assert len(_PRIORITY) == _WINDOW, f"priority list has {len(_PRIORITY)} entries"
_missing = [n for n in _PRIORITY if n not in _core.QUERIES]
assert not _missing, f"priority names not registered: {_missing}"

QUERIES = {n: _core.QUERIES[n] for n in _PRIORITY}
QUERIES.update({n: f for n, f in _core.QUERIES.items() if n not in QUERIES})
ORACLES = {n: _core.ORACLES[n] for n in QUERIES if n in _core.ORACLES}
