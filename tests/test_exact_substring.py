"""exact_substring_spans: Lee-et-al-style duplicated char ranges at fixed
window grain — span boundaries computed by hand on a synthetic corpus."""

from __future__ import annotations

from market_flow_spark.extensions.dedup import exact_substring_spans


def _blocks(start: int, n: int) -> str:
    """n non-repeating 4-char hex blocks: no 30-char window of the result
    occurs twice anywhere across different ``start`` ranges."""
    return "".join(f"{i:04x}" for i in range(start, start + n))


L = 30


def test_spans_cover_exactly_the_shared_substring(spark):
    shared = _blocks(1000, 15)  # 60 chars, present in docs 0 and 1
    # fillers end/start with DISTINCT non-hex letters so no window can
    # straddle a boundary and still match across docs (hex blocks all
    # start with '0', which would genuinely extend the shared substring
    # by one char — caught by this operator on this fixture's v1 draft)
    u0, v0 = _blocks(0, 10) + "g", "q" + _blocks(2000, 9)
    u1, v1 = _blocks(3000, 6) + "j", "r" + _blocks(4000, 8)
    docs = spark.createDataFrame(
        [
            (0, u0 + shared + v0),
            (1, u1 + shared + v1),
            (2, _blocks(6000, 30)),  # fully unique -> no spans
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in exact_substring_spans(docs, min_len=L).collect()
    }
    n_win = len(shared) - L + 1  # 31 duplicated window starts per side
    assert rows == {
        (0, len(u0), len(u0) + len(shared), n_win),
        (1, len(u1), len(u1) + len(shared), n_win),
    }


def test_within_doc_repeat_yields_two_spans(spark):
    """A substring repeated INSIDE one document is duplication too (the
    paper's criterion counts any second occurrence): each occurrence
    becomes its own maximal span when separated by unique text."""
    rep = _blocks(5000, 10)  # 40 chars, repeated with a 2-char separator
    docs = spark.createDataFrame(
        [(7, rep + "zz" + rep)], "doc_id long, text string"
    )
    rows = {
        (r["span_start"], r["span_end"], r["n_windows"])
        for r in exact_substring_spans(docs, min_len=L).collect()
    }
    # duplicated window starts: p and p+42 for p in 0..10 (window must fit
    # inside one occurrence to match the other) -> spans [0,40) and [42,82)
    assert rows == {(0, 40, 11), (42, 82, 11)}


def test_short_docs_contribute_nothing(spark):
    docs = spark.createDataFrame(
        [(0, "tiny"), (1, "tiny")], "doc_id long, text string"
    )
    assert exact_substring_spans(docs, min_len=L).count() == 0
