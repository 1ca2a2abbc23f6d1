#!/usr/bin/env python
"""Regenerate PLANS.md: the physical plans of the headline queries with the
plan-shape claims the test suite pins (broadcasts, reused exchanges,
pushed filters, no cartesian products). Run after plan-affecting changes:

    python gen_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from market_flow_spark.queries_all import QUERIES  # noqa: E402
from market_flow_spark.session import get_spark  # noqa: E402

# query -> what to look at in the plan (the claim the suite pins)
SHOWCASE: dict[str, str] = {
    "flagship_wide": (
        "8-way star join: every dimension is a BroadcastHashJoin (plan-"
        "asserted), the one big-big join (lineitem⋈orders) a SortMergeJoin; "
        "ReadSchema on every scan carries only referenced columns and "
        "IsNotNull filters are pushed to the parquet scans."
    ),
    "dedup_minhash_lsh": (
        "LSH band self-join: the shingle build + signature aggregate + "
        "banding runs ONCE (the other side is a ReusedExchange); the "
        "signature screen filters BEFORE the distinct; no broadcast hints — "
        "AQE sizes the join at runtime. No cartesian product anywhere."
    ),
    "dedup_ngram_jaccard": (
        "Prefix-filtered inverted index (SSJoin): only the ⌊(1-t)·n⌋+1 "
        "rarest-ordered shingles enter the exploded index; the self-join "
        "canonicalizes to one exchange; survivors verify in-row with "
        "array_intersect."
    ),
    "dedup_word_jaccard": (
        "Saturated-vocabulary bitset strategy (auto-selected here): each "
        "word set packs into ONE BIGINT, the distinct masks cross-compare "
        "with in-row bit_count algebra (a bounded BNLJ over single longs, "
        "M² guarded), and two broadcast equi-joins expand set pairs back "
        "to doc pairs — no inverted index, no corpus-sized shuffle."
    ),
    "contamination_exact_bloomed": (
        "Bloom-pruned contamination: the probe scan carries the filter test "
        "as a map-side BroadcastNestedLoopJoin against the 1-row word-array "
        "build side (kilobytes), so only could-match rows reach the "
        "fingerprint exchange; result provably equals the exact join."
    ),
    "cosine_topk": (
        "Brute-force cosine: corpus norms computed once pre-fanout, the "
        "5-row query set broadcast, the dot product a JVM-side aggregate "
        "fold (no Python anywhere), top-k per query as a window over the "
        "broadcast-joined scores."
    ),
    "rollup_revenue": (
        "Pre-aggregated ROLLUP: the fact table reduces to (returnflag, "
        "linestatus) partials BEFORE Expand, so the grouping-sets "
        "multiplier applies to dozens of rows, not millions."
    ),
    "sequence_packing": (
        "Hash-sharded packing: one exchange on the shard key, per-shard "
        "sort + running prefix sum inside the window — no global sort, no "
        "single-partition window."
    ),
    "corpus_prefilter": (
        "Fused gate scan: quality + lang-ID + fingerprint computed in one "
        "projection over one corpus scan; the dedup window is the only "
        "hash exchange (plan-asserted)."
    ),
    "exact_substring_spans": (
        "Collision-proof exact-substring spans (r11 verify reclaim, "
        "×0.75): the occ≥2 hash prefilter aggregates behind ONE "
        "corpus-sized exchange and AQE broadcasts the resulting heavy-"
        "hash list into a LeftSemi BHJ (no second corpus shuffle at this "
        "SF; SMJ on the same key at scale); survivors pull text through "
        "one doc_id join; the content verify is a count over ONE "
        "exchange on the content key (window count — no aggregate + "
        "join-back pair); the span merge is one per-doc hash aggregate "
        "folding sorted positions into islands (no running-max window "
        "pass)."
    ),
    "exact_substring_dedup": (
        "The APPLY half (r11): the span plan above plus one OUTPUT-SIZED "
        "per-doc aggregate packing (start, end) spans and a left join "
        "back to the corpus; the cut itself is a linear aggregate() fold "
        "in the projection — kept segments concatenate in one pass, no "
        "extra corpus-sized shuffle beyond the doc_id join."
    ),
    "gopher_quality": (
        "Gopher line/word-shape gate (r12): ONE projection over ONE "
        "parquet scan — every feature (bullet/ellipsis line ratios, "
        "alpha-word ratio, symbol ratio, stopword floor) is a JVM "
        "higher-order-function expression on the row's own text; no "
        "exchange, no aggregate, no UDF anywhere in the plan, so the "
        "gate fuses with any downstream pipeline's scan."
    ),
    "zipf_fit": (
        "Zipf head fit (r12): the vocabulary aggregate is the one "
        "map-side-combined exchange; the top-N head is a "
        "TakeOrderedAndProject (no global sort), and the window + fit "
        "aggregate run over ≤ top_n rows on one task by construction — "
        "the only single-partition data is the fixed-size head. The "
        "one-row totals crossJoin is a declared tiny-broadcast BNLJ "
        "(the unigram_logprob shape)."
    ),
    "token_entropy": (
        "Per-doc token entropy (r12): explode feeds a map-side-combined "
        "(doc_id, term) hash aggregate; the doc_id window and the final "
        "per-doc aggregate share the second exchange; the restore-all-"
        "docs join is doc_id-keyed. Two hash exchanges total — the "
        "unigram_logprob budget — and the fixed-point p·ln p sums keep "
        "the whole reduction in bigint columns."
    ),
    "quota_cap": (
        "Skew-safe two-level cap: per-(group, subsplit) local top-k bounds "
        "every task before the per-group window — a group holding half the "
        "corpus spreads across 32 subsplits instead of one task."
    ),
    "weighted_sample_docs": (
        "A-Res weighted draw: md5 uniforms and the ln(u)/w key are "
        "projections inside the scan stage; one window exchange on the "
        "group key."
    ),
    "fuzzy_customer_names": (
        "Deletion-neighborhood fuzzy join: the variant index self-joins "
        "as one exchange (ReusedExchange other side); levenshtein "
        "verifies BEFORE the distinct so the dedup exchange carries true "
        "pairs only."
    ),
    "tfidf_doc_similarity": (
        "Sparse-cosine retrieval: corpus stats ride as broadcast one-row "
        "singletons, the query weight set broadcasts into the postings "
        "join, dot products are exact BIGINT sums with map-side combine."
    ),
    "url_canonical_dedup": (
        "URL canonicalization is pure scan-local column algebra (regexp + "
        "array ops inside the scan projection); the ONLY hash exchange is "
        "the final keep-min aggregate on the canonical URL "
        "(plan-asserted), with map-side partial combine."
    ),
    "nb_classify_lang": (
        "Naive-Bayes train+apply as DataFrame algebra: one tokenize+"
        "explode per split, the vocab-bounded model grid and the 5-row "
        "label scaffold ride as broadcasts (declared tiny crossJoins), "
        "per-doc scores are integer sums, argmax a doc-grain window."
    ),
    "interval_price_bands": (
        "Overlapping band join without a nested loop: intervals "
        "replicate into median-width buckets, each fact equi-joins its "
        "single bucket (broadcast here, shuffle-hash at scale), the "
        "exact range predicate filters after; the only BNLJ is the "
        "declared 8-row x 1-row band-dim scaffold."
    ),
    "cms_heavy_hitters": (
        "One map-side-combined word count feeds both the exact top-20 "
        "and the 4x512 count-min grid; estimates ride a broadcast "
        "min-over-depth join — no second corpus scan."
    ),
    "pit_part_price_sales": (
        "Point-in-time SCD2 lookup as union+window: facts and dim "
        "versions share ONE hash exchange on the natural key, the "
        "keyed sort resolves 'latest valid_from <= t', and the "
        "closing bound is a projection — no BETWEEN-join range "
        "fan-out anywhere in the plan."
    ),
    "ewma_daily_price_unbounded": (
        "Unbounded EWMA: rank window on the group key, segmented "
        "prefix window on (group, segment) — the second and last "
        "corpus exchange — then a segment-count-sized lag frame whose "
        "carry join-back broadcasts; series length never touches the "
        "plan."
    ),
    "ewma_monthly_price": (
        "Recursive EWMA as a closed-form ordered prefix sum: monthly "
        "pre-aggregation reduces the fact before the window, then ONE "
        "keyed window exchange computes every y_n exactly — no UDF, no "
        "per-group loop."
    ),
}


HAND_MARKER = "<!-- hand-maintained below: gen_plans.py preserves this tail -->"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="mfs-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by `gen_plans.py` at `{sf_dir}` (AQE final plans; "
        "regenerate after plan-affecting changes). The claims below are "
        "also pinned by `tests/test_plans.py`, which additionally sweeps "
        "EVERY registered query for row-wise Python UDFs, cartesian "
        "products, and undeclared broadcast-nested-loop joins.",
        "",
    ]
    for name, claim in SHOWCASE.items():
        df = QUERIES[name](spark, sf_dir)
        # execute once so AQE's final plan (with runtime join choices) shows
        df.write.format("noop").mode("overwrite").save()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree; drop the verbose per-node detail section
        tree = plan.split("\n\n")[0]
        tree = re.sub(r"#\d+L?", "", tree)  # strip expr ids for stable diffs
        out += [
            f"## {name}",
            "",
            claim,
            "",
            "```",
            tree.strip(),
            "```",
            "",
        ]
    # Hand-maintained analysis sections (cold-start anatomy, bench-basis
    # notes) live BELOW the marker and survive regeneration verbatim.
    target = Path(__file__).resolve().parent.joinpath("PLANS.md")
    preserved = ""
    if target.exists() and HAND_MARKER in target.read_text():
        preserved = HAND_MARKER + target.read_text().split(HAND_MARKER, 1)[1]
    target.write_text("\n".join(out) + ("\n" + preserved if preserved else ""))
    print(
        f"PLANS.md written ({len(SHOWCASE)} queries"
        + (", hand sections preserved)" if preserved else ")")
    )
    spark.stop()


if __name__ == "__main__":
    main()
