"""Gopher line/word-shape quality rules + Zipf power-law fit (round 12).

The driver's synthetic documents contain no newlines, bullets, or
ellipses, so the registered-query certification only exercises the
degenerate single-line path — these tests plant multi-line / bullet /
ellipsis / non-alpha fixtures and (a) hand-check every feature, (b) run
the SAME DuckDB twin the registry uses over the planted frame, so the
interesting branches are twin-certified even though the corpus never
takes them.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from market_flow_spark.extensions import text
from market_flow_spark.queries_ext import _gopher_oracle, _zipf_oracle
from tests.oracle_utils import assert_matches_oracle


GOOD_TEXT = (
    "the quick brown fox jumps over a lazy dog and runs to the hills "
    "of the north in a long day of travel and rest is found at last "
    "near the river where the water is clear and the grass is soft "
    "and the wind of the evening moves in the trees by the old stone "
    "bridge that leads to town"
)  # 59 words... padded below to cross the 50-token floor


def _planted_docs(spark):
    rows = [
        (0, GOOD_TEXT + " one more word here"),          # passes everything
        (1, "• first\n- second\n* third\nplain tail"),   # 3/4 bullet lines
        (2, "wait for it...\nstill waiting…\nthe end"),  # 2/3 ellipsis lines
        (3, "1 2 3 4 5 6 7 8 9 10 11 12"),               # zero alpha words
        (4, "# tags # and # more # hashes the a of"),    # symbol-heavy
        (5, ""),                                          # empty
        (6, None),                                        # NULL text
        (7, "   \n  \n\t"),                               # whitespace only
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_hand_computed(spark):
    docs = _planted_docs(spark)
    got = {r["doc_id"]: r.asDict() for r in text.gopher_quality(docs).collect()}

    g0 = got[0]
    assert g0["n_lines"] == 1 and g0["n_tokens"] >= 50
    assert g0["bullet_ratio"] == 0.0 and g0["ellipsis_ratio"] == 0.0
    assert g0["alpha_ratio"] == 1.0 and g0["n_stop"] >= 2
    assert g0["passes_gopher"] is True

    g1 = got[1]
    assert g1["n_lines"] == 4
    assert g1["bullet_ratio"] == 0.75  # •, -, * lines of 4
    assert g1["passes_gopher"] is False  # (also under the token floor)

    g2 = got[2]
    assert g2["n_lines"] == 3
    assert abs(g2["ellipsis_ratio"] - 0.6667) < 1e-9  # ... and … lines of 3
    assert g2["passes_gopher"] is False

    g3 = got[3]
    assert g3["n_tokens"] == 12 and g3["alpha_ratio"] == 0.0
    assert g3["n_stop"] == 0 and g3["passes_gopher"] is False

    g4 = got[4]
    assert g4["n_tokens"] == 11
    # four '#' occurrences / 11 tokens, floor-rounded at 4 digits
    assert abs(g4["symbol_ratio"] - 0.3636) < 1e-9
    assert abs(g4["alpha_ratio"] - round(7 / 11, 4)) < 1e-9
    assert g4["passes_gopher"] is False

    g5 = got[5]
    assert g5["n_lines"] == 0 and g5["n_tokens"] == 0
    assert g5["mean_word_len"] is None
    assert g5["passes_gopher"] is False
    # trim() strips spaces only (same on both engines): the tab-only line
    # survives the blank-line filter, but tokenization still yields 0
    g7 = got[7]
    assert g7["n_lines"] == 1 and g7["n_tokens"] == 0
    assert g7["bullet_ratio"] == 0.0 and g7["mean_word_len"] is None
    assert g7["passes_gopher"] is False
    assert got[6]["n_tokens"] is None  # NULL text propagates NULL counts
    assert got[6]["passes_gopher"] is False


def test_gopher_matches_twin_on_planted_lines(spark):
    """The registry's DuckDB twin, over the planted multi-line corpus —
    certifies the bullet/ellipsis/alpha/symbol branches the driver's
    newline-free documents never reach."""
    docs = _planted_docs(spark)
    pdf = pd.DataFrame(
        {"doc_id": [r["doc_id"] for r in docs.collect()],
         "text": [r["text"] for r in docs.collect()]}
    )
    con = duckdb.connect()
    try:
        con.register("documents", pdf)
        assert_matches_oracle(text.gopher_quality(docs), con, _gopher_oracle())
    finally:
        con.close()


def _power_law_docs(spark, counts=(60, 30, 20, 15, 12, 10)):
    # term w{r} appears exactly 60/r times -> y = ln60 - x exactly:
    # the OLS slope is -1 and r² is 1 up to the 1e-9 quantization.
    words = []
    for r, c in enumerate(counts, start=1):
        words.extend([f"w{r}"] * c)
    return spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )


def test_zipf_exact_power_law(spark):
    docs = _power_law_docs(spark)
    row = text.zipf_fit(docs).collect()[0]
    assert row["n_vocab"] == 6 and row["c_total"] == 147
    assert row["n_fit"] == 6 and row["top_coverage"] == 1.0
    assert row["zipf_slope"] == -1.0
    assert row["zipf_r2"] == 1.0


def test_zipf_top_n_truncates_head(spark):
    docs = _power_law_docs(spark)
    row = text.zipf_fit(docs, top_n=3).collect()[0]
    assert row["n_fit"] == 3
    assert row["n_vocab"] == 6 and row["c_total"] == 147  # totals are corpus-wide
    assert abs(row["top_coverage"] - round(110 / 147, 6)) < 1e-9
    assert row["zipf_slope"] == -1.0


def test_zipf_degenerate_single_term(spark):
    docs = spark.createDataFrame(
        [(0, "same same same same")], "doc_id long, text string"
    )
    row = text.zipf_fit(docs).collect()[0]
    assert row["n_vocab"] == 1 and row["n_fit"] == 1
    assert row["zipf_slope"] is None and row["zipf_r2"] is None


def test_zipf_matches_twin_at_truncating_top_n(spark):
    """Twin parity at a top_n that actually truncates (the registered
    query's top_n=1000 never truncates at driver SFs), with count TIES so
    the (cnt DESC, term) tiebreak order is load-bearing on both engines."""
    words = []
    for r, c in enumerate((8, 5, 5, 5, 2, 2, 1), start=1):
        words.extend([f"t{r}"] * c)
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    pdf = pd.DataFrame(
        {"doc_id": [0], "text": [" ".join(words)]}
    )
    con = duckdb.connect()
    try:
        con.register("documents", pdf)
        assert_matches_oracle(
            text.zipf_fit(docs, top_n=4), con, _zipf_oracle(top_n=4)
        )
    finally:
        con.close()


def test_token_entropy_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (0, "a a b b"),       # balanced 2 types: H = ln 2, ratio 1
            (1, "a a a b"),       # skewed: H = -(.75 ln .75 + .25 ln .25)
            (2, "a a a a"),       # one type: H = 0, ratio NULL
            (3, "a b c d"),       # uniform 4 types: H = ln 4, ratio 1
            (4, ""),              # empty: no tokens, NULL entropy
            (5, None),            # NULL text
        ],
        "doc_id long, text string",
    )
    from market_flow_spark.extensions.text import token_entropy

    got = {r["doc_id"]: r.asDict() for r in token_entropy(docs).collect()}
    assert got[0]["n_tokens"] == 4 and got[0]["n_types"] == 2
    assert got[0]["entropy"] == 0.693147  # ln 2, floor-rounded at 6
    assert got[0]["entropy_ratio"] == 1.0
    assert got[1]["entropy"] == 0.562335
    assert got[2]["entropy"] == 0.0 and got[2]["entropy_ratio"] is None
    assert got[3]["entropy"] == 1.386294 and got[3]["entropy_ratio"] == 1.0
    for i in (4, 5):
        assert got[i]["n_tokens"] == 0 and got[i]["n_types"] == 0
        assert got[i]["entropy"] is None and got[i]["entropy_ratio"] is None


def test_token_entropy_flags_stuffing_that_neighbors_pass(spark):
    """The discrimination claim: a doc that repeats ONE corpus-common
    word scores near the corpus mean under unigram_logprob (each token
    is common) and clean under repetition_stats' dup_word_frac would
    flag it — but entropy_ratio is the signal that needs no corpus
    context and no threshold tuning: 0 for the stuffed doc, near 1 for
    natural text of the same length."""
    from market_flow_spark.extensions.text import token_entropy

    docs = spark.createDataFrame(
        [(0, "the " * 40), (1, "the quick brown fox jumps over a lazy dog")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in token_entropy(docs).collect()}
    assert got[0]["entropy"] == 0.0 and got[0]["n_types"] == 1
    assert got[1]["entropy_ratio"] == 1.0  # 9 distinct tokens, all once


def test_token_entropy_matches_twin_on_planted_docs(spark):
    from market_flow_spark.extensions.text import token_entropy
    from market_flow_spark.queries_ext import _token_entropy_oracle

    rows = [
        (0, "a a b b c"),
        (1, "x x x x y z z"),
        (2, ""),
        (3, None),
        (4, "only"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pdf = pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
    )
    con = duckdb.connect()
    try:
        con.register("documents", pdf)
        assert_matches_oracle(
            token_entropy(docs), con, _token_entropy_oracle()
        )
    finally:
        con.close()


def test_zipf_reuses_the_vocab_exchange(spark, sf_dir):
    """The head pipeline and the totals row both derive from ONE
    vocabulary aggregate: the REAL executed plan (post-AQE metrics, not
    the pre-AQE string — which misleadingly prints both branches) must
    show a ReusedExchange, and nothing may spill."""
    from market_flow_spark.metrics import collect_and_measure
    from market_flow_spark.queries_all import QUERIES

    df = QUERIES["zipf_fit"](spark, sf_dir)
    n, m = collect_and_measure(df)
    assert n == 1
    assert m["reused_exchanges"] >= 1, m
    assert m["spill_bytes"] == 0


def test_token_entropy_stays_in_budget(spark, sf_dir):
    """Two semantic exchanges (the (doc_id, term) count and the doc_id
    window/aggregate) plus the conditional RoundRobin spread — and zero
    spill; the doc_id window and final aggregate pipeline on one
    exchange rather than adding a fourth."""
    from market_flow_spark.metrics import collect_and_measure
    from market_flow_spark.queries_all import QUERIES

    df = QUERIES["token_entropy"](spark, sf_dir)
    n, m = collect_and_measure(df)
    assert n > 0
    assert m["exchanges"] <= 3, m
    assert m["spill_bytes"] == 0
