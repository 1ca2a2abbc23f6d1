"""Text-analysis operators for large-scale training-data pipelines.

Not present in the reference (which is numeric price analytics); added per
the north-star extension contract (BASELINE.json): language-ID, quality
scoring, token counting, document fingerprinting — each as pure Column
expressions (JVM-side, codegen-friendly; zero Python UDFs), so they scan at
full parquet speed on a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from market_flow_spark.functions.aggregates import det_round
from market_flow_spark.sources.layout import spread_to_cores

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately small and hard-coded: the point is deterministic, cheap,
# JVM-side scoring, not linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(text), r"\s+")


def count_in_expr(toks_sql: str, words: list[str]) -> str:
    """SQL text for counting tokens that belong to a fixed word list —
    shared verbatim between the Spark plan and the DuckDB oracle."""
    quoted = ", ".join(f"'{w}'" for w in words)
    return f"size(filter({toks_sql}, x -> x IN ({quoted})))"


def _stats_cols(text_col: str) -> dict[str, Column]:
    """The per-row quality feature columns, shared by text_stats and
    corpus_prefilter so both compute bit-identical values."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_stop = F.expr(
        count_in_expr(f"split(trim({text_col}), '\\\\s+')", STOPWORDS)
    )
    avg_token_len = det_round(
        F.length(F.regexp_replace(t, r"\s+", "")) / n_tokens, 4
    )
    stopword_ratio = det_round(n_stop / n_tokens, 4)
    approx_bpe = F.ceil(n_chars / F.lit(4.0)).cast("bigint")
    # quality: in-range token count and a sane avg token length
    quality = det_round(
        F.when((n_tokens >= 5) & (n_tokens <= 10000), F.lit(0.5)).otherwise(0.0)
        + F.when((avg_token_len >= 2) & (avg_token_len <= 12), F.lit(0.5)).otherwise(
            0.0
        ),
        2,
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": avg_token_len,
        "stopword_ratio": stopword_ratio,
        "approx_bpe_tokens": approx_bpe,
        "quality_score": quality,
    }


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring feature set per document: char/token counts, average
    token length, stopword ratio, an approximate BPE token estimate
    (chars/4, the common fast heuristic), and a 0..1 quality score."""
    cols = _stats_cols(text_col)
    return spread_to_cores(docs).select(
        "doc_id", *(c.alias(name) for name, c in cols.items())
    )


def _lang_pred(text_col: str) -> tuple[dict[str, Column], Column]:
    """Per-language score columns + the winning-language column (ties broken
    by fixed language order)."""
    toks_sql = f"split(trim({text_col}), '\\\\s+')"
    scores = {
        lang: F.expr(count_in_expr(toks_sql, words))
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    pred = None
    for lang in langs:  # fixed priority order resolves ties deterministically
        cond = None
        for other in langs:
            if other == lang:
                continue
            ge = scores[lang] >= scores[other]
            cond = ge if cond is None else (cond & ge)
        pred = (
            F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
        )
    return scores, pred.otherwise(F.lit(langs[0]))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score each language's lexicon against the
    token list; highest score wins, ties broken by fixed language order.
    Pure CASE/filter expressions — no UDF."""
    scores, pred = _lang_pred(text_col)
    sel = [F.col("doc_id")]
    sel += [scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS]
    sel.append(pred.alias("predicted_lang"))
    return spread_to_cores(docs).select(*sel)


def text_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality stats + language ID in ONE projection pass: all columns of
    text_stats and lang_id computed together so the corpus is scanned once
    (joining the two separate outputs would scan the 100 TB table twice)."""
    stats = _stats_cols(text_col)
    scores, pred = _lang_pred(text_col)
    sel = [F.col("doc_id")]
    sel += [c.alias(name) for name, c in stats.items()]
    sel += [scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS]
    sel.append(pred.alias("predicted_lang"))
    return spread_to_cores(docs).select(*sel)


def corpus_prefilter(
    docs: DataFrame, min_quality: float = 1.0, text_col: str = "text"
) -> DataFrame:
    """The canonical training-data pre-filter, end to end: quality gate →
    language ID → exact-dedup keeper, in ONE scan plus ONE shuffle.

    Quality score and language are pure column expressions computed in the
    same projection as the md5 fingerprint (no self-joins between the
    "stages"); the quality filter runs before the fingerprint window so
    low-quality rows never shuffle; the dedup keeper is min(doc_id) per
    fingerprint among quality survivors — deduplicating after the quality
    gate keeps the best-scoring duplicate group alive even when its lowest
    doc_id is junk. At 100 TB this plans as scan → filter → one hash
    exchange on fingerprint → window — the minimum possible movement."""
    stats = _stats_cols(text_col)
    _, pred = _lang_pred(text_col)
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    enriched = spread_to_cores(docs).select(
        "doc_id",
        stats["n_tokens"].alias("n_tokens"),
        stats["quality_score"].alias("quality_score"),
        pred.alias("predicted_lang"),
        F.md5(norm).alias("fingerprint"),
    ).filter(F.col("quality_score") >= min_quality)
    w = Window.partitionBy("fingerprint")
    return (
        enriched.withColumn("min_id", F.min("doc_id").over(w))
        .filter(F.col("min_id") == F.col("doc_id"))
        .select("doc_id", "predicted_lang", "n_tokens", "quality_score")
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized, lowercased text
    plus a coarse length band — the cheap pre-filter for exact/near dedup."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return spread_to_cores(docs).select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        (F.floor(F.length(norm) / 64) * 64).alias("length_band"),
    )


# The GPT-2-style pre-tokenizer shape, restricted to a portable character
# class form both Spark (Java regex) and DuckDB (RE2) execute identically:
# letter runs, digit runs, single punctuation marks. BPE merges only ever
# split WITHIN these pre-token boundaries, so their count is a tight lower
# bound (and the usual fast estimator) for the real BPE token count.
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token counting, both ways a data pipeline needs it:
    whitespace tokens (the shingling unit) and BPE-ish pre-tokens (the
    budget unit — letter runs / digit runs / punctuation, the boundaries a
    byte-pair encoder never crosses). Pure regexp column expressions: one
    codegen'd scan, no UDF, no shuffle."""
    t = F.col(text_col)
    return spread_to_cores(docs).select(
        "doc_id",
        F.size(tokens(t)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_PRETOKEN_RE), F.lit(0))).alias(
            "n_pretokens"
        ),
        F.length(t).alias("n_chars"),
    )
