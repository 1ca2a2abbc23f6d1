"""Aggregated registry: importing this module loads every query module so
QUERIES/ORACLES are complete, then re-emits them in an explicit priority
order.

Why the explicit order matters: the driver's correctness harness checks the
first 50 registered queries against their DuckDB oracles. Every query that
is the sole driver-checkable evidence for a SURVEY.md §2 operator (or a
north-star extension op) is pinned inside that window; the handful of
deliberate near-duplicates — queries whose operators are ALSO exercised by
an in-window query — are registered after it and carry pytest-only
coverage (tests/test_oracle_parity.py still runs every oracle, including
theirs).

Past-window set and the in-window query that already covers each operator
(rotated in round 4 so the driver itself certifies the contamination and
incremental-MinHash operators, per the round-3 brief):
- seasonal_forecast   (UD1 per-group model fit  -> linear_forecast)
- monthly_event_stats (A6 group means           -> group_mean_impute)
- events_typed        (F5 guarded casts         -> stg_transactions_typed)
- country_name_cleaning (F2/F4 remap ladder     -> unit_conversion)
- simhash_signatures  (signature build          -> simhash_pairs, which
                       derives every pair from those signatures)
- multimodal_bytes    (binary-asset plumbing    -> multimodal_frames)
- contamination_exact (fingerprint equi-join    -> dedup_exact)
- dedup_ngram_jaccard (prefix-filter machinery  -> contamination_ngram,
                       the cross-side run of the SAME prefix-filtered
                       inverted-index + exact-rational verify; rotated out
                       in r4 after two green driver rounds)
- sliding_window_stats (overlapping F.window    -> tumbling_hour_stats,
                       the same window() operator with slide == width, and
                       session_windows for the stateful variant; rotated
                       out in r4 after two green driver rounds)
- token_counts        (regex pre-token counting -> text_profile covers the
                       scan-level token/char stats surface)
- winnow_containment  (rolling-hash fingerprints; cross-side fp equi-join
                       -> contamination_exact covers the cross-side
                       fingerprint-join shape)
- dedup_clusters_minhash (pairs->components->keep list over the in-window
                       dedup_minhash_lsh pair graph; recursive-CTE oracle
                       in pytest)
- repetition_stats    (row-wise quality features  -> text_profile covers
                       the map-only quality-scan shape)
- pii_scan            (regexp_extract_all counts  -> text_profile /
                       token_counts cover the regex-scan shape)
- price_percentiles   (exact PERCENTILE_CONT agg  -> price_summary_stats
                       covers the per-group multi-stat aggregate shape)
- corpus_clean        (composition of in-window stages: corpus_prefilter
                       gates + dedup_exact + dedup_minhash_lsh machinery)
- merge_aggregate_returnflag (full-outer fold of delta partials; the
                       underlying join/agg shapes are in-window via
                       upsert_plan and sales_agg_profile)
- kmv_overlap_parts   (KMV set algebra -> kmv_distinct_parts covers the
                       sketch-construction machinery in-window)
- bm25_topk           (inverted-index scoring -> text_profile/token_counts
                       cover the scan; the postings join shape is in-window
                       via dedup_word_jaccard's inverted index)
- sequence_packing    (hash-shard + windowed prefix sum -> rolling_ma30 /
                       ffill_bfill_impute cover the window-frame machinery)
- mixture_sample      (content-addressed sampling -> stratified_sample /
                       train_test_split cover the hash-draw machinery)
- unigram_logprob     (corpus-frequency join-back -> text_profile covers
                       the scan; dedup_word_jaccard the vocabulary agg)
- knn_label_vote      (majority vote over exact-cosine top-k ->
                       cosine_topk covers the scoring machinery in-window)
- chunk_documents     (map-only overlapping-chunk explode -> multimodal_
                       frames covers the row-wise explode machinery)
- snapshot_diff_orders (full-outer reconciliation -> upsert_plan /
                       merge_aggregate_returnflag cover the keyed
                       outer-join machinery in-window)
- scd2_part_prices    (versioned-dim merge -> upsert_plan covers the
                       anti/semi-join slicing machinery in-window)
- funnel_view_click_purchase (staged filtered aggregates -> sales_agg_
                       profile / monthly_event_stats cover the machinery)
- cohort_retention    (first-touch cohorting -> asof_last_view /
                       country_month_avg cover the join+agg machinery)
- price_anomalies     (trailing-window z-score -> rolling_ma30 covers the
                       window-frame machinery in-window)
- corpus_shuffle      (two-phase total-order rank -> quota_cap /
                       train_test_split cover the hash-draw machinery; the
                       rank plan shape is pinned in test_ranking_selection)
- curriculum_stages   (same two-phase rank + one-row count singleton)
- dsir_weights        (bucket-bounded model aggregates + broadcast scoring
                       -> unigram_logprob covers the corpus-frequency
                       join-back shape in-window)
- semantic_dedup_keep (embedding pair graph -> components ->
                       embedding_near_dup covers the pair machinery
                       in-window; recursive-CTE oracle in pytest)
- leakage_safe_split  (cluster-grain hash split over the same components
                       -> train_test_split covers the split machinery)
- grouping_sets_sales (hand-picked multi-grain Expand -> rollup_revenue /
                       cube_returnflag_priority cover the pre-aggregated
                       Expand machinery in-window)
- kmv_distinct_by_returnflag (grouped KMV estimator -> kmv_distinct_parts
                       covers the sketch machinery; quota_cap the two-level
                       skew-safe window)
- price_histogram     (fixed-bound equi-width profile -> sales_agg_profile
                       covers the conditional-aggregate scan shape)
- span_dedup          (C4-style repeated-span scrub; freq-agg + hot-set
                       join-back -> dedup_exact / dedup_word_jaccard cover
                       the corpus-frequency machinery in-window)
- window_panel        (lag/lead/ntile/percent_rank/cume_dist panel ->
                       rolling_ma30 covers the window-shuffle machinery)
- winsorize_prices    (exact-percentile clip summary -> price_summary_
                       stats / sales_agg_profile cover the two-pass
                       bounds-join machinery)
- top_tokens_per_lang (per-group heavy hitters -> text_profile covers the
                       scan; top10_products the rank-filter shape)
- feature_encode_panel (z-score/min-max/LOO-target/frequency encoders;
                       group-stats broadcast join-back -> group_mean_
                       impute / mean_impute cover the machinery in-window)
- basket_pairs        (co-occurrence via map-side pair expansion from
                       collected item sets -> dedup_word_jaccard covers
                       the pair-emission + support-count shape)
- gap_fill_months     (per-group date-spine regularization + ffill ->
                       ffill_bfill_impute covers the ignorenulls window;
                       dim_date the calendar-generation machinery)
- contamination_exact_bloomed (Bloom-pruned twin of contamination_exact —
                       identical oracle by construction, zero false
                       negatives; the fingerprint-join shape is in-window
                       via dedup_exact)
- pmi_collocations    (vocabulary-bounded count aggregates + top-k ->
                       text_profile / top10_products cover the machinery)
- corr_quantity_price (exact decimal moment sums + per-group fit ->
                       sales_agg_profile covers the grouped-agg shape)
- view_click_attribution (keyed interval join, batch twin of the
                       watermarked stream-stream join -> asof_last_view /
                       range_join_nearby cover the temporal-join family;
                       streaming parity in tests/test_streaming.py)
- pagerank_part_supplier (fixed-point iterative rank; per-round join+agg
                       -> dedup_clusters_minhash covers the checkpointed
                       iterative machinery; unrolled-CTE oracle in pytest)
- kfold_orders        (content-addressed fold assignment ->
                       train_test_split covers the hash-draw machinery)
- weighted_sample_docs (A-Res weighted draw -> quota_cap covers the
                       per-group window-rank machinery)
- profile_orders      (one-scan fused column profile -> table_audit
                       covers the fused-aggregate machinery in-window)
- fuzzy_customer_names (deletion-neighborhood blocked self-join ->
                       dedup_exact / simhash_pairs cover the blocked
                       equi-join machinery in-window)
- cdc_apply_orders    (anti-join + union apply -> upsert_plan covers the
                       keyed-merge machinery in-window)
- event_transitions   (lag window + normalized counts -> rolling_ma30 /
                       session_windows cover the machinery in-window)
- tfidf_doc_similarity (hashed TF-IDF postings join -> dedup_word_jaccard
                       / cosine_topk cover the machinery in-window)
- profile_drift_orders (two fused profiles + outer join -> table_audit /
                       snapshot_diff_orders cover the machinery)
- top_values_orders   (unpivot + rank -> top10_products covers the
                       rank-filter machinery in-window)
- bigram_logprob      (positional bigram join-back -> unigram_logprob's
                       in-window analogue text_profile / dedup_word_
                       jaccard cover the machinery)
- langid_trigram      (trigram rank profiles + OOP distance ->
                       text_profile / top10_products cover the machinery)
- dedup_cluster_sizes (two-level aggregate over the in-window
                       dedup_minhash_lsh component machinery)
Rotated out in round 5 (each driver-green in r1-r4; the swap lets the
driver certify the r4 VARIANT / theta-sketch / winnowing / span tiers):
- forecast_horizon    (UD2 horizon computation  -> linear_forecast covers
                       the per-group applyInPandas fit; country_month_avg
                       the grouped date-agg shape)
- page_and_tail       (O3 offset/limit + O5 last-N -> top10_products
                       covers the TakeOrderedAndProject rank-filter;
                       every ordered query the presentation ORDER BY)
- float_key_join      (J8 float-key equi-join -> normalized_join covers
                       the normalized-key equi-join idiom in-window)
- ann_lsh_topk        (sign-bucket LSH ANN -> dedup_minhash_lsh covers
                       the hash-bucket equi-join; ivf_topk the bucketed
                       cosine-scoring machinery in-window)
All r4 additions are full-oracle-checked in tests/test_oracle_parity.
"""

from __future__ import annotations

import market_flow_spark.queries as _core
import market_flow_spark.queries_ext as _ext  # noqa: F401  (registers on import)

# The first 50 names land in the driver's correctness window. Keep every
# sole-evidence operator query in here.
_PRIORITY: list[str] = [
    # core star-schema / staging path
    "flagship_wide",
    "fact_transactions",
    "stg_transactions_typed",
    "json_props_stats",
    "unit_conversion",
    "dim_product",
    "dim_date",
    "dim_country_merged",
    # aggregation / analytics panels
    "price_summary_stats",
    "country_month_avg",
    "sales_agg_profile",
    "table_audit",
    "top10_products",
    "rolling_ma30",
    "filter_suite",
    # imputation
    "mean_impute",
    "ffill_bfill_impute",
    "group_mean_impute",
    # joins / incremental
    "anti_join_missing_months",
    "normalized_join",
    "upsert_plan",
    # text analysis
    "text_profile",
    "corpus_prefilter",
    # dedup ladder (contamination_ngram carries the prefix-filter machinery
    # in-window; dedup_minhash_incremental carries the band join cross-side)
    "dedup_exact",
    "dedup_word_jaccard",
    "contamination_ngram",
    "dedup_minhash_lsh",
    "dedup_minhash_incremental",
    "simhash_pairs",
    # r5 rotation: winnowing containment + C4 span scrub driver-certified
    "winnow_containment",
    "span_dedup",
    # similarity search
    "cosine_topk",
    "ivf_topk",
    "embedding_near_dup",
    # sketches / semi-structured / multimodal (r5 rotation: theta sketch
    # algebra + VARIANT round-trip driver-certified)
    "kmv_distinct_parts",
    "theta_rollup_custkeys",
    "variant_events_stats",
    "multimodal_frames",
    # forecasting
    "linear_forecast",
    "best_markets",
    "pivot_returnflag",
    # time windows (streaming twins; sliding is past-window — same window()
    # operator as tumbling, session covers the stateful variant)
    "tumbling_hour_stats",
    "session_windows",
    # temporal joins / hierarchical aggregation
    "asof_last_view",
    "range_join_nearby",
    "rollup_revenue",
    "cube_returnflag_priority",
    # sampling
    "stratified_sample",
    "train_test_split",
    "quota_cap",
]

_WINDOW = 50
assert len(_PRIORITY) == _WINDOW, f"priority list has {len(_PRIORITY)} entries"
_missing = [n for n in _PRIORITY if n not in _core.QUERIES]
assert not _missing, f"priority names not registered: {_missing}"

QUERIES = {n: _core.QUERIES[n] for n in _PRIORITY}
QUERIES.update({n: f for n, f in _core.QUERIES.items() if n not in QUERIES})
ORACLES = {n: _core.ORACLES[n] for n in QUERIES if n in _core.ORACLES}
