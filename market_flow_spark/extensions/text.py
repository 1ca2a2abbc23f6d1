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
    return spread_to_cores(docs, "doc_id").select(
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
    return spread_to_cores(docs, "doc_id").select(*sel)


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
    return spread_to_cores(docs, "doc_id").select(*sel)


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
    enriched = spread_to_cores(docs, "doc_id").select(
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
    return spread_to_cores(docs, "doc_id").select(
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
    return spread_to_cores(docs, "doc_id").select(
        "doc_id",
        F.size(tokens(t)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_PRETOKEN_RE), F.lit(0))).alias(
            "n_pretokens"
        ),
        F.length(t).alias("n_chars"),
    )


# --- quality filters: repetition + PII -------------------------------------
# Portable regexes: no lookaround/backrefs, so Java (Spark) and RE2 (DuckDB)
# produce identical non-overlapping leftmost matches.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition features (the Gopher-style repetition
    filters): duplicate-line fraction, duplicate-word fraction, and the
    share of word bigrams taken by the single most frequent bigram. A doc
    that fails any of the standard thresholds (dup lines > 30%, dup words
    > 30%, top bigram > 20%) is flagged repetitive.

    All row-wise higher-order functions — the top-bigram share is an
    in-row frequency scan over the doc's own bigrams (quadratic in
    DOCUMENT length, constant per corpus row), so the whole operator is
    one map-only projection: no explode, no shuffle, 100 TB-safe."""
    out = _rep_base(docs, text_col).select("doc_id", *_rep_feature_cols())
    return out.withColumn("repetitive", _repetitive_flag())


def _rep_base(docs: DataFrame, text_col: str) -> DataFrame:
    """Base projection carrying the row-wise repetition intermediates
    (__lines, __toks, __bg) alongside doc_id and the text column — shared
    by repetition_stats and the fused clean-corpus flag scan."""
    t = F.col(text_col)
    lines = F.expr(f"filter(split({text_col}, '\\n'), x -> trim(x) <> '')")
    toks = F.expr(
        f"filter(split(trim(lower({text_col})), '\\\\s+'), x -> x <> '')"
    )
    bigrams = F.expr(
        "CASE WHEN size(__toks) >= 2 THEN "
        "transform(sequence(0, size(__toks) - 2), "
        "i -> concat_ws(' ', __toks[i], __toks[i+1])) "
        "ELSE cast(array() as array<string>) END"
    )
    return spread_to_cores(docs, "doc_id").select(
        "doc_id", t.alias(text_col), lines.alias("__lines"), toks.alias("__toks")
    ).withColumn("__bg", bigrams)


def _rep_feature_cols() -> list[Column]:
    """The four repetition feature columns over a ``_rep_base`` frame."""
    top_bigram_cnt = F.expr(
        "CASE WHEN size(__bg) > 0 THEN "
        "array_max(transform(array_distinct(__bg), "
        "x -> size(filter(__bg, y -> y = x)))) ELSE 0 END"
    )

    def frac(dup: Column, tot: Column) -> Column:
        return det_round(F.when(tot > 0, dup / tot).otherwise(F.lit(0.0)), 4)

    n_lines = F.size("__lines")
    n_toks = F.size("__toks")
    n_bg = F.size("__bg")
    return [
        n_lines.alias("n_lines"),
        frac(
            (n_lines - F.size(F.array_distinct("__lines"))).cast("double"), n_lines
        ).alias("dup_line_frac"),
        frac(
            (n_toks - F.size(F.array_distinct("__toks"))).cast("double"), n_toks
        ).alias("dup_word_frac"),
        frac(top_bigram_cnt.cast("double"), n_bg).alias("top_bigram_share"),
    ]


def _repetitive_flag() -> Column:
    # built lazily: Column operators need an active SparkContext, so this
    # cannot be a module-level constant (imports happen before the session)
    return (
        (F.col("dup_line_frac") > 0.3)
        | (F.col("dup_word_frac") > 0.3)
        | (F.col("top_bigram_share") > 0.2)
    )


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex PII detection per document: email / IPv4 / phone-shaped match
    counts and a has_pii flag — the scrub-or-drop gate of a training-data
    pipeline. Pure regexp_extract_all column expressions (one codegen'd
    scan); redaction is the same patterns via regexp_replace
    (``redact_pii``)."""
    t = F.col(text_col)

    def n(pattern: str) -> Column:
        return F.size(F.regexp_extract_all(t, F.lit(pattern), F.lit(0)))

    return spread_to_cores(docs, "doc_id").select(
        "doc_id",
        n(EMAIL_RE).alias("n_emails"),
        n(IPV4_RE).alias("n_ipv4"),
        n(PHONE_RE).alias("n_phones"),
    ).withColumn(
        "has_pii",
        (F.col("n_emails") > 0) | (F.col("n_ipv4") > 0) | (F.col("n_phones") > 0),
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace PII matches with typed placeholder tokens, preserving all
    other content — the scrub path (vs pii_scan's drop path)."""
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), EMAIL_RE, "[EMAIL]"),
            IPV4_RE,
            "[IP]",
        ),
        PHONE_RE,
        "[PHONE]",
    )
    return docs.withColumn(text_col, redacted)


def quality_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The fused per-document gate scan of a corpus-cleaning pipeline:
    quality score, repetition flag, and PII flag computed in ONE
    projection over ONE corpus scan (running text_stats + repetition_stats
    + pii_scan separately and joining would scan a 100 TB corpus three
    times and shuffle twice). Returns (doc_id, <text_col>, quality_score,
    repetitive, has_pii); semantics are bit-identical to the standalone
    operators (shared column builders)."""
    t = F.col(text_col)
    stats = _stats_cols(text_col)

    def pii_count(pattern: str) -> Column:
        return F.size(F.regexp_extract_all(t, F.lit(pattern), F.lit(0)))

    base = _rep_base(docs, text_col)
    feats = base.select(
        "doc_id",
        text_col,
        stats["quality_score"].alias("quality_score"),
        *_rep_feature_cols(),
        (
            (pii_count(EMAIL_RE) > 0)
            | (pii_count(IPV4_RE) > 0)
            | (pii_count(PHONE_RE) > 0)
        ).alias("has_pii"),
    )
    return feats.select(
        "doc_id",
        text_col,
        "quality_score",
        _repetitive_flag().alias("repetitive"),
        "has_pii",
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — the CCNet-style fluency/quality signal (docs far
    below the corpus mean are gibberish or boilerplate-heavy; far above are
    repetitive). A cheap stand-in for LM perplexity that stays entirely
    JVM-side.

    score(d) = avg over token occurrences t∈d of ln(count(t) / total) —
    no smoothing needed because every scored token is by construction in
    the vocabulary it is scored against.

    Plan shape at 100 TB: one corpus explode feeding a map-side-combined
    vocabulary aggregate, then the postings re-join the (vocab-sized,
    typically broadcastable) count table and fold back to one row per doc —
    two shuffles total, both on bounded keys (term, doc_id). Returns
    (doc_id, n_tokens, avg_logprob) with NULL avg_logprob for docs with no
    tokens."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    words = (
        spread_to_cores(docs, "doc_id")
        .select("doc_id", F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
    )
    vocab = words.groupBy("term").agg(F.count(F.lit(1)).alias("c_term"))
    # r12: the executed plan ran the corpus tokenize+explode THREE times —
    # once for the occurrence side, once for the vocab join side, once
    # for the totals branch (column pruning differentiates the duplicated
    # subtrees, so neither Catalyst nor AQE stage-reuse deduplicates
    # them; probed on the EXECUTED plan: 4 scans, 0 ReusedExchange).
    # The vocab-sized model table is materialized once (the DSIR
    # raw-counts pattern, selection.py) and the corpus total rides along
    # as a whole-frame window sum over it instead of a separate
    # aggregate branch — warm cost is ONE corpus explode plus the join.
    if not docs.isStreaming:
        vocab = vocab.localCheckpoint(eager=True)
    vocab = vocab.withColumn(
        "c_total", F.sum("c_term").over(Window.partitionBy())
    )
    scored = (
        words.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            det_round(
                F.avg(F.log(F.col("c_term") / F.col("c_total"))), 4
            ).alias("avg_logprob"),
        )
    )
    # keep every document (empty/NULL text rows score NULL, n_tokens 0)
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "avg_logprob",
        )
    )


def unigram_logprob_oracle_sql() -> str:
    """DuckDB twin of :func:`unigram_logprob` over the `documents` view."""
    return """
WITH words AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents
), postings AS (
  SELECT doc_id, term FROM words WHERE term <> ''
), vocab AS (
  SELECT term, COUNT(*) AS c_term FROM postings GROUP BY term
), totals AS (
  SELECT SUM(c_term) AS c_total FROM vocab
), scored AS (
  SELECT p.doc_id,
         COUNT(*) AS n_tokens,
         FLOOR(AVG(ln(CAST(v.c_term AS DOUBLE) / t.c_total)) * 10000 + 0.5)
           / 10000 AS avg_logprob
  FROM postings p
  JOIN vocab v ON p.term = v.term
  CROSS JOIN totals t
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_tokens, 0) AS n_tokens,
       s.avg_logprob
FROM documents d
LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


_KL_SCALE = 1_000_000_000  # 1e-9 fixed-point quantization per contribution


def token_kl_divergence(
    docs: DataFrame, group: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-group token-distribution drift: KL(P_group || P_corpus) in nats,
    where P_group is a group's unigram distribution and P_corpus the whole
    corpus's. The distribution-shift monitor a crawl pipeline runs between
    snapshots/domains/languages — a group whose token distribution matches
    the corpus scores ~0; a divergent slice scores high and gets looked at
    before it trains anything.

    Well-defined without smoothing: every token of every group is by
    construction part of the corpus distribution, so Q(t) > 0 wherever
    P(t) > 0.

    Determinism (same scheme as DSIR's log-ratio table,
    selection.py): each token's contribution p·ln(p/q) is quantized to
    1e-9 fixed point (BIGINT) immediately after the ``ln``, so the
    per-group SUM is exact integer arithmetic — invariant to partial-agg
    order and to the engines' last-ulp ``ln`` differences (p and q are
    correctly-rounded double quotients of exact integer counts, identical
    on both engines; only ln's ulps differ, bounded away from the 1e-9
    grid).

    Plan shape at 100 TB: ONE corpus explode into a map-side-combined
    (group, token) aggregate — everything after is vocabulary-sized: token
    totals derive from that compact table (no second corpus pass), group
    totals and the corpus total ride in as broadcasts. Returns one row per
    group: (group, n_tokens, vocab, kl_nats).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    words = (
        spread_to_cores(docs)  # generic frame: no doc_id contract here
        .select(F.col(group).alias("grp"), F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
    )
    cnt_gt = words.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("c_gt"))
    # r12: cnt_gt feeds FOUR consumers (token counts, group totals, the
    # corpus total, and the scoring join); their pruned branches do not
    # canonicalize identically, so the corpus explode re-ran per branch.
    # Materialize the (group, token)-bounded table once (DSIR pattern) —
    # every consumer then reads the compact checkpoint.
    if not docs.isStreaming:
        cnt_gt = cnt_gt.localCheckpoint(eager=True)
    cnt_t = cnt_gt.groupBy("tok").agg(F.sum("c_gt").alias("c_t"))
    tot_g = cnt_gt.groupBy("grp").agg(F.sum("c_gt").alias("t_g"))
    tot = cnt_gt.agg(F.sum("c_gt").alias("t_all"))

    p = F.col("c_gt").cast("double") / F.col("t_g")
    q = F.col("c_t").cast("double") / F.col("t_all")
    contrib_fx = F.floor(p * F.log(p / q) * F.lit(_KL_SCALE) + F.lit(0.5)).cast(
        "long"
    )
    return (
        cnt_gt.join(cnt_t, "tok")
        .join(F.broadcast(tot_g), "grp")
        .crossJoin(F.broadcast(tot))
        .groupBy("grp")
        .agg(
            F.max("t_g").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            (F.sum(contrib_fx).cast("double") / F.lit(float(_KL_SCALE))).alias(
                "kl_nats"
            ),
        )
        .select(
            F.col("grp").alias(group),
            "n_tokens",
            "vocab",
            det_round(F.col("kl_nats"), 6).alias("kl_nats"),
        )
    )


def token_kl_divergence_oracle_sql(group: str = "lang") -> str:
    """DuckDB twin of :func:`token_kl_divergence` over the `documents`
    view — identical tokenization, identical quantize-then-sum fixed-point
    arithmetic."""
    return f"""
WITH words AS (
  SELECT {group} AS grp,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
cg AS (
  SELECT grp, tok, COUNT(*) AS c_gt FROM words WHERE tok <> '' GROUP BY 1, 2
),
ct AS (SELECT tok, CAST(SUM(c_gt) AS BIGINT) AS c_t FROM cg GROUP BY 1),
tg AS (SELECT grp, CAST(SUM(c_gt) AS BIGINT) AS t_g FROM cg GROUP BY 1),
ta AS (SELECT CAST(SUM(c_gt) AS BIGINT) AS t_all FROM cg),
f AS (
  SELECT cg.grp, tg.t_g,
         CAST(FLOOR((CAST(cg.c_gt AS DOUBLE) / tg.t_g)
                    * ln((CAST(cg.c_gt AS DOUBLE) / tg.t_g)
                         / (CAST(ct.c_t AS DOUBLE) / ta.t_all))
                    * {_KL_SCALE} + 0.5) AS BIGINT) AS contrib_fx
  FROM cg JOIN ct USING (tok) JOIN tg USING (grp) CROSS JOIN ta
)
SELECT grp AS {group},
       MAX(t_g) AS n_tokens,
       COUNT(*) AS vocab,
       FLOOR((CAST(SUM(contrib_fx) AS DOUBLE) / {_KL_SCALE}.0)
             * 1000000 + 0.5) / 1000000 AS kl_nats
FROM f
GROUP BY grp
"""


def top_tokens_per_group(
    docs: DataFrame,
    group: str = "lang",
    k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Per-group heavy hitters: the k most frequent tokens (total term
    frequency, not doc frequency) within each group, rank made total by
    (count DESC, token ASC). The corpus-health view every pretraining
    pipeline keeps: per-language vocabulary heads expose boilerplate and
    tokenizer pathologies before they hit training.

    100 TB shape: explode → groupBy(group, token) collapses the corpus to
    vocabulary cardinality with map-side partial aggregation (the explode
    never shuffles raw rows — only (group, token) partials move); the
    ranking window then sorts the vocabulary-sized aggregate, not the
    corpus. For a true single-pass sketch at extreme cardinality, chain
    the same rank over a count-min/space-saving pre-filter — the exact
    two-level shape here is already sublinear in corpus size after the
    partial agg."""
    norm = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    toks = docs.select(
        F.col(group),
        F.explode(
            F.when(norm == "", F.array().cast("array<string>")).otherwise(
                F.split(norm, r"\s+")
            )
        ).alias("token"),
    )
    counts = toks.groupBy(group, "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy(group).orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
        .select(group, "token", "cnt", F.col("rk").cast("long").alias("rk"))
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual information —
    the classic corpus-analysis op (Church & Hanks 1990) that surfaces
    multiword expressions ("new york", "machine learning") for tokenizer
    vocabulary curation and boilerplate discovery.

    PMI(x, y) = ln( p(xy) / (p(x)·p(y)) ) with p(xy) from adjacent-bigram
    occurrence counts and p(·) from token occurrence counts; pairs seen
    fewer than ``min_count`` times are dropped (PMI is noise-dominated on
    rare pairs).

    Plan shape at 100 TB: ONE tokenize pass feeding two map-side-combined
    occurrence aggregates (unigram, bigram — both vocabulary-bounded), the
    bigram table joins the unigram counts twice (vocab-sized sides; AQE
    broadcasts when they fit), totals ride in as one-row broadcasts, and
    top-k plans as TakeOrdered. No self-joins, no driver state. The ln is
    applied once per surviving pair to exact integer counts, so results
    are bit-stable under any partitioning (ties broken by the pair
    itself)."""
    norm = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    toked = spread_to_cores(docs, "doc_id").select(
        F.filter(F.split(norm, r"\s+"), lambda x: x != "").alias("toks")
    )
    uni = (
        toked.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi_pairs = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(0, size(toks)-2), "
        "i -> struct(toks[i] AS w1, toks[i+1] AS w2)) "
        "ELSE cast(array() as array<struct<w1:string,w2:string>>) END"
    )
    bi_all = (
        toked.select(F.explode(bi_pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_pair"))
    )
    # r12: the tokenize pass re-ran per consumer branch (uni ×3 via the
    # two join sides + its total, bi once, t_bi once — pruned duplicated
    # subtrees never canonicalize identically, so nothing reuses them).
    # Materialize the two vocabulary-bounded count tables once (DSIR
    # pattern); t_bi becomes Σ c_pair over the unfiltered bigram table —
    # the same integer by construction (every adjacent position emits
    # exactly one pair occurrence) — instead of a third corpus pass.
    if not docs.isStreaming:
        uni = uni.localCheckpoint(eager=True)
        bi_all = bi_all.localCheckpoint(eager=True)
    bi = bi_all.filter(F.col("c_pair") >= int(min_count))
    t_uni = uni.agg(F.sum("c").alias("t_uni"))
    t_bi = bi_all.agg(F.sum("c_pair").alias("t_bi"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log(
        (F.col("c_pair") / F.col("t_bi"))
        / ((F.col("c1") / F.col("t_uni")) * (F.col("c2") / F.col("t_uni")))
    )
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(t_uni))
        .crossJoin(F.broadcast(t_bi))
        .select(
            "w1",
            "w2",
            "c_pair",
            det_round(pmi, 4).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
    )


def pmi_collocations_oracle_sql(min_count: int = 5, k: int = 50) -> str:
    """DuckDB twin of :func:`pmi_collocations` over the `documents` view."""
    return f"""
WITH base AS (
  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
),
uni AS (
  SELECT w, COUNT(*) AS c FROM (SELECT unnest(toks) AS w FROM base) GROUP BY w
),
bi AS (
  SELECT w1, w2, COUNT(*) AS c_pair FROM (
    SELECT unnest(CASE WHEN len(toks) >= 2 THEN
             list_transform(range(1, len(toks)),
                            i -> {{'w1': toks[i], 'w2': toks[i+1]}})
           ELSE [] END, recursive := true)
    FROM base)
  GROUP BY w1, w2
  HAVING COUNT(*) >= {min_count}
),
t_uni AS (SELECT SUM(c) AS t_uni FROM uni),
t_bi AS (
  SELECT SUM(CASE WHEN len(toks) >= 1 THEN len(toks) - 1 ELSE 0 END) AS t_bi
  FROM base
)
SELECT b.w1, b.w2, b.c_pair,
       FLOOR(ln((b.c_pair / t_bi.t_bi)
                / ((u1.c / t_uni.t_uni) * (u2.c / t_uni.t_uni)))
             * 10000 + 0.5) / 10000 AS pmi
FROM bi b
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
CROSS JOIN t_uni CROSS JOIN t_bi
ORDER BY pmi DESC, b.w1 ASC, b.w2 ASC
LIMIT {k}
"""


def bigram_logprob(
    docs: DataFrame, lam: float = 0.7, text_col: str = "text"
) -> DataFrame:
    """Per-document mean token log-probability under an interpolated
    bigram corpus model — the next rung above :func:`unigram_logprob` on
    the fluency ladder (word order now matters: scrambled text scores
    visibly lower than natural phrasing with the same vocabulary).

    score(d) = avg over positions i>=2 of
        ln( lam * p(w_i | w_{i-1}) + (1 - lam) * p(w_i) )
    with p(w|v) = c(v w)/c(v ·) from corpus bigram counts and p(w) the
    corpus unigram frequency. The unigram interpolation floor keeps every
    observed token scoreable (no zero for unseen-in-context bigrams), so
    no extra smoothing constant is needed. Single-token documents (no
    bigram positions) score NULL.

    Plan shape: one tokenize pass explodes positional bigrams; corpus
    bigram counts aggregate map-side (vocabulary²-bounded but sparse —
    only observed pairs); each position joins its bigram count (left —
    unseen pairs hit the unigram floor) and its context/unigram counts
    (vocab-bounded sides, AQE broadcasts when they fit); one fold back to
    doc grain. No self-joins, no driver state."""
    norm = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    toked = spread_to_cores(docs, "doc_id").select(
        "doc_id",
        F.filter(F.split(norm, r"\s+"), lambda x: x != "").alias("toks"),
    )
    pos_pairs = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(1, size(toks)-1), "
        "i -> struct(toks[i-1] AS prev, toks[i] AS w)) "
        "ELSE cast(array() as array<struct<prev:string,w:string>>) END"
    )
    occurrences = toked.select(
        "doc_id", F.explode(pos_pairs).alias("p")
    ).select("doc_id", "p.prev", "p.w")
    uni = (
        toked.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    # r12: the scoring join consumes FIVE model branches (bigram counts,
    # context counts, unigram counts, the corpus total, plus the
    # occurrence side itself), and each duplicated pruned subtree re-ran
    # the corpus tokenize+explode (static plan: 12 scans, 0
    # ReusedExchange). Materialize the two vocabulary-bounded count
    # tables once (DSIR pattern); ctx and the total derive from the
    # compact checkpoint — warm cost is ONE positional explode + joins.
    bi = occurrences.groupBy("prev", "w").agg(
        F.count(F.lit(1)).alias("c_bi")
    )
    if not docs.isStreaming:
        uni = uni.localCheckpoint(eager=True)
        bi = bi.localCheckpoint(eager=True)
    total = uni.agg(F.sum("c_w").alias("c_total"))
    ctx = uni.select(F.col("w").alias("prev"), F.col("c_w").alias("c_prev"))
    # context count c(v ·) = c(v) - [v ends a document]; using the raw
    # unigram count keeps the model a proper mixture up to that boundary
    # term and saves a second positional aggregate — a DEFINITIONAL
    # choice mirrored exactly in the oracle.
    p_bi = F.coalesce(
        F.col("c_bi") / F.col("c_prev"), F.lit(0.0)
    )
    p_uni = F.col("c_w") / F.col("c_total")
    lp = F.log(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni)
    scored = (
        occurrences.join(F.broadcast(bi), ["prev", "w"], "left")
        .join(F.broadcast(ctx), "prev")
        .join(F.broadcast(uni), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            det_round(F.avg(lp), 4).alias("avg_logprob"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
        )
    )


def bigram_logprob_oracle_sql(lam: float = 0.7) -> str:
    """DuckDB twin of :func:`bigram_logprob` over the `documents` view."""
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
),
occ AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 2 THEN
           list_transform(range(2, len(toks) + 1),
                          i -> {{'prev': toks[i-1], 'w': toks[i]}})
         ELSE [] END, recursive := true)
  FROM base
),
uni AS (
  SELECT w, COUNT(*) AS c_w FROM (SELECT unnest(toks) AS w FROM base)
  GROUP BY w
),
total AS (SELECT SUM(c_w) AS c_total FROM uni),
bi AS (SELECT prev, w, COUNT(*) AS c_bi FROM occ GROUP BY 1, 2),
scored AS (
  SELECT o.doc_id,
         COUNT(*) AS n_bigrams,
         FLOOR(AVG(ln({lam} * COALESCE(b.c_bi / cx.c_w, 0)
                       + {1.0 - lam} * (u.c_w / t.c_total)))
               * 10000 + 0.5) / 10000 AS avg_logprob
  FROM occ o
  LEFT JOIN bi b ON b.prev = o.prev AND b.w = o.w
  JOIN uni cx ON cx.w = o.prev
  JOIN uni u ON u.w = o.w
  CROSS JOIN total t
  GROUP BY o.doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_bigrams, 0) AS n_bigrams,
       s.avg_logprob
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


LANGID_PROFILE_SIZE = 100


def char_trigram_langid(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    profile_size: int = LANGID_PROFILE_SIZE,
) -> DataFrame:
    """Char-trigram language identification (Cavnar & Trenkle 1994,
    "N-Gram-Based Text Categorization") — the real algorithm behind
    classic langid tools, upgraded from :func:`lang_id`'s marker-word
    heuristic: per-language rank profiles of the ``profile_size`` most
    frequent character trigrams, documents classified by minimum
    out-of-place distance (Σ |doc rank − profile rank|, missing trigrams
    costing ``profile_size``). Pure integer arithmetic end to end — no
    floats anywhere, so results are trivially engine-identical.

    Self-training shape: profiles come from the corpus's own ``lang``
    labels (the labeled-seed-corpus setup); returns (doc_id, lang,
    predicted_lang, distance) for every document with at least one
    trigram, enabling a confusion/accuracy readout downstream.

    Scale: the trigram explode is corpus-bytes-sized but map-only into
    two bounded aggregates (per-language profiles: langs × profile_size
    rows; per-doc top trigrams: docs × profile_size). The scoring join is
    doc-top-trigrams × (tiny, broadcast) profile table, grouped per
    (doc, lang) with map-side combine, then one per-doc min. Ties break
    by language code for a total order."""
    norm = F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    grams = F.expr(
        "CASE WHEN length(__padded) >= 3 THEN "
        "transform(sequence(1, length(__padded) - 2), "
        "i -> substr(__padded, i, 3)) "
        "ELSE cast(array() as array<string>) END"
    )
    base = (
        spread_to_cores(docs, "doc_id")
        .select("doc_id", F.col(lang_col).alias("lang"), padded.alias("__padded"))
        # the explicit doc_id/lang not-null guards match the constraint the
        # final inner join INFERS into the doc-profile branch — with them
        # stated up front, every consumer of the shared count aggregate
        # below canonicalizes identically and AQE reuses ONE exchange for
        # all three (doc profile, language profile, language universe)
        # instead of re-running the corpus trigram explode per branch
        .filter(
            (F.length("__padded") >= 3)
            & F.col("doc_id").isNotNull()
            & F.col("lang").isNotNull()
        )
        .select("doc_id", "lang", F.explode(grams).alias("g"))
    )
    from pyspark.sql import Window

    # ONE corpus-sized explode: both rank profiles derive from the same
    # (doc_id, lang, g) count aggregate (lang is functionally dependent on
    # doc_id, so the extra grouping key changes nothing semantically). The
    # two consumers' plans share the aggregate's exchange verbatim, so the
    # explode + partial agg runs once (ReusedExchange) instead of twice —
    # the language rollup then sums doc-grain counts, which is exact.
    base_counts = base.groupBy("doc_id", "lang", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    # per-language rank profile (rank 1 = most frequent; ties by trigram)
    lang_counts = base_counts.groupBy("lang", "g").agg(F.sum("c").alias("c"))
    wl = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("g").asc())
    profiles = (
        lang_counts.withColumn("r_lang", F.row_number().over(wl))
        .filter(F.col("r_lang") <= profile_size)
        .select(F.col("lang").alias("cand_lang"), "g", "r_lang")
    )
    # per-document rank profile (straight projection of the shared agg)
    doc_counts = base_counts.select("doc_id", "g", "c")
    # candidate-language universe: every lang owning >= 1 trigram-bearing
    # document ⇔ every lang the profiles cover. Derived from a LIGHT scan
    # (length test only — no explode): a pruned branch off the shared
    # aggregate would drop its count expression, break the canonical
    # match, and silently re-run the corpus trigram pass
    langs = (
        docs.select(F.col(lang_col).alias("cand_lang"), padded.alias("__p"))
        .filter((F.length("__p") >= 3) & F.col("cand_lang").isNotNull())
        .select("cand_lang")
        .distinct()
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.col("c").desc(), F.col("g").asc()
    )
    doc_prof = (
        doc_counts.withColumn("r_doc", F.row_number().over(wd))
        .filter(F.col("r_doc") <= profile_size)
        .select("doc_id", "g", "r_doc")
    )
    oop = F.coalesce(
        F.abs(F.col("r_doc") - F.col("r_lang")), F.lit(profile_size)
    )
    # every doc scores against EVERY candidate language (missing trigrams
    # must cost profile_size, so absent join rows can't just vanish):
    # doc-profile × langs is docs × n_langs × profile_size — fine, and the
    # profile join stays a broadcast lookup
    dists = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(profiles), ["cand_lang", "g"], "left")
        .groupBy("doc_id", "cand_lang")
        .agg(F.sum(oop).alias("distance"))
    )
    wbest = Window.partitionBy("doc_id").orderBy(
        F.col("distance").asc(), F.col("cand_lang").asc()
    )
    best = (
        dists.withColumn("__rn", F.row_number().over(wbest))
        .filter(F.col("__rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("predicted_lang"), "distance")
    )
    return (
        docs.select("doc_id", F.col(lang_col).alias("lang"))
        .join(best, "doc_id")
        .select("doc_id", "lang", "predicted_lang", "distance")
    )


def char_trigram_langid_oracle_sql(profile_size: int = LANGID_PROFILE_SIZE) -> str:
    """DuckDB twin of :func:`char_trigram_langid` over `documents`."""
    return f"""
WITH base AS (
  SELECT doc_id, lang,
         unnest(CASE WHEN length(p) >= 3 THEN
           list_transform(range(1, length(p) - 1), i -> substr(p, i, 3))
         ELSE [] END) AS g
  FROM (
    SELECT doc_id, lang,
           ' ' || regexp_replace(lower(trim(COALESCE(text, ''))),
                                 '\\s+', ' ', 'g') || ' ' AS p
    FROM documents
  ) WHERE length(p) >= 3
),
lang_counts AS (SELECT lang, g, COUNT(*) AS c FROM base GROUP BY 1, 2),
profiles AS (
  SELECT lang AS cand_lang, g, r_lang FROM (
    SELECT lang, g,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, g ASC)
             AS r_lang
    FROM lang_counts)
  WHERE r_lang <= {profile_size}
),
doc_counts AS (SELECT doc_id, g, COUNT(*) AS c FROM base GROUP BY 1, 2),
doc_prof AS (
  SELECT doc_id, g, r_doc FROM (
    SELECT doc_id, g,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC)
             AS r_doc
    FROM doc_counts)
  WHERE r_doc <= {profile_size}
),
langs AS (SELECT DISTINCT cand_lang FROM profiles),
dists AS (
  SELECT d.doc_id, l.cand_lang,
         CAST(SUM(COALESCE(ABS(d.r_doc - p.r_lang), {profile_size}))
           AS BIGINT) AS distance
  FROM doc_prof d
  CROSS JOIN langs l
  LEFT JOIN profiles p ON p.cand_lang = l.cand_lang AND p.g = d.g
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, cand_lang AS predicted_lang, distance FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY distance ASC, cand_lang ASC) AS rn
    FROM dists)
  WHERE rn = 1
)
SELECT d.doc_id, d.lang, b.predicted_lang, b.distance
FROM documents d JOIN best b ON d.doc_id = b.doc_id
"""


# ---------------------------------------------------------------------------
# Gopher-style document quality heuristics (line + word level)
# ---------------------------------------------------------------------------

# Line starts with a bullet glyph / ends in an ellipsis (Rae et al. 2021,
# "Scaling Language Models" §A.1.1 — the repetition half of those rules is
# repetition_stats; this operator is the line/word-shape half).
GOPHER_BULLET_RE = r"^\s*[•‣·*-]"
GOPHER_ELLIPSIS_RE = r"(\.\.\.|…)\s*$"
GOPHER_SYMBOL_RE = r"#|\.\.\.|…"
GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000


def _gopher_feature_cols(text_col: str) -> dict[str, "Column"]:
    """The nine Gopher feature columns as fused row-local expressions —
    shared by :func:`gopher_quality` and :func:`gopher_pass_expr` so the
    standalone operator and the clean_corpus gate stay bit-identical."""
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != F.lit(""))
    toks = F.filter(tokens(t), lambda x: x != F.lit(""))
    n_lines = F.size(lines)
    n_tokens = F.size(toks)
    n_bullet = F.size(F.filter(lines, lambda x: x.rlike(GOPHER_BULLET_RE)))
    n_ellipsis = F.size(
        F.filter(lines, lambda x: x.rlike(GOPHER_ELLIPSIS_RE))
    )
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    n_symbol = F.size(
        F.regexp_extract_all(t, F.lit(f"({GOPHER_SYMBOL_RE})"), F.lit(0))
    )
    lower_toks_sql = (
        f"filter(split(trim(lower({text_col})), '\\\\s+'), x -> x != '')"
    )
    n_stop = F.expr(count_in_expr(lower_toks_sql, STOPWORDS))
    n_nonspace = F.length(F.regexp_replace(F.trim(t), r"\s+", ""))

    def ratio(num: Column, den: Column) -> Column:
        return F.when(den > 0, det_round(num / den, 4))

    return {
        "n_lines": n_lines,
        "n_tokens": n_tokens,
        "mean_word_len": ratio(n_nonspace, n_tokens),
        "bullet_ratio": ratio(n_bullet, n_lines),
        "ellipsis_ratio": ratio(n_ellipsis, n_lines),
        "alpha_ratio": ratio(n_alpha, n_tokens),
        "symbol_ratio": ratio(n_symbol, n_tokens),
        "n_stop": n_stop,
    }


def _gopher_pass_from(f: dict[str, "Column"]) -> Column:
    passes = (
        f["n_tokens"].between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
        & f["mean_word_len"].between(3, 10)
        & (f["symbol_ratio"] < 0.1)
        & (f["bullet_ratio"] < 0.9)
        & (f["ellipsis_ratio"] < 0.3)
        & (f["alpha_ratio"] > 0.8)
        & (f["n_stop"] >= 2)
    )
    return F.coalesce(passes, F.lit(False))


def gopher_pass_expr(text_col: str = "text") -> Column:
    """The composite Gopher verdict as ONE fused row-local Column — for
    embedding the gate directly into another scan's projection (the
    clean_corpus early-gate waterfall) without a join or a second scan.
    Bit-identical to gopher_quality's ``passes_gopher`` (same feature
    builders, same rounded ratios)."""
    return _gopher_pass_from(_gopher_feature_cols(text_col))


def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher quality-rule features and verdict (Rae et al.
    2021 §A.1.1): word count in [50, 100k], mean word length in [3, 10],
    symbol-to-word ratio (#, ellipsis) < 0.1, < 90% of lines starting
    with a bullet, < 30% of lines ending in an ellipsis, > 80% of words
    containing an alphabetic character, and at least 2 stopwords — the
    standard web-corpus shape gate that runs BEFORE any model-based
    scoring. Complements ``repetition_stats`` (the duplicate-n-gram half
    of the same paper's rules) and ``_stats_cols``'s coarse
    ``quality_score``.

    Returns (doc_id, n_lines, n_tokens, mean_word_len, bullet_ratio,
    ellipsis_ratio, alpha_ratio, symbol_ratio, n_stop, passes_gopher).
    Ratios are NULL (and the verdict false) when their denominator is 0
    — empty or NULL text never passes.

    100 TB shape: one projection over one corpus scan — every feature is
    a JVM higher-order-function expression on the row's own text (zero
    shuffles, zero UDFs, full codegen); the gate can therefore fuse with
    the parquet scan of any downstream pipeline exactly like
    ``quality_flags``."""
    f = _gopher_feature_cols(text_col)
    return docs.select(
        "doc_id",
        *[c.alias(k) for k, c in f.items()],
        _gopher_pass_from(f).alias("passes_gopher"),
    )


# ---------------------------------------------------------------------------
# Zipf fit — corpus-level token-frequency power-law diagnostics
# ---------------------------------------------------------------------------


def zipf_fit(
    docs: DataFrame, text_col: str = "text", top_n: int = 1000
) -> DataFrame:
    """One-row corpus diagnostic: OLS fit of ln(frequency) ~ ln(rank)
    over the ``top_n`` most frequent tokens — natural corpora follow
    Zipf's law with slope ≈ −1; synthetic/templated/spun corpora flatten
    the head (slope → 0) and machine-generated boilerplate steepens it.
    A drifting slope or collapsing ``top_coverage`` between two crawl
    snapshots is a cheap corpus-mixture alarm that needs no reference
    model (pairs with ``token_kl_divergence``, which needs one).

    Returns (n_vocab, c_total, n_fit, top_coverage, zipf_slope,
    zipf_r2): vocabulary size, total token occurrences, points fitted,
    share of occurrences covered by the fitted head, the fitted slope
    and its r². Slope/r² are NULL when fewer than 2 distinct ranks (or a
    constant y) make the fit undefined.

    Determinism across engines: each ln() term is quantized to 1e-9
    fixed-point BIGINTs (the ``_KL_SCALE`` convention) so the sums are
    exact integers regardless of accumulation order; the closed-form
    slope then evaluates an identical double expression on identical
    integers on both engines.

    100 TB shape: one corpus explode into a map-side-combined vocabulary
    aggregate (the same exchange the unigram-LM tier budgets), a
    TakeOrderedAndProject for the top-``top_n`` head (no global sort),
    and a single-partition window + aggregate over ≤ ``top_n`` rows —
    the only data that ever reaches one task is the fixed-size head."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    words = (
        spread_to_cores(docs, "doc_id")
        .select(F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
    )
    vocab = words.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").alias("c_total"), F.count(F.lit(1)).alias("n_vocab")
    )
    top = vocab.orderBy(F.col("cnt").desc(), F.col("term")).limit(top_n)
    ranked = top.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("term"))
        ),
    )
    x = F.log(F.col("rnk").cast("double"))
    y = F.log(F.col("cnt").cast("double"))

    def q(c: Column) -> Column:
        return F.floor(c * F.lit(float(_KL_SCALE)) + F.lit(0.5)).cast(
            "bigint"
        )

    sums = ranked.agg(
        F.count(F.lit(1)).alias("n_fit"),
        F.sum(q(x)).alias("sx"),
        F.sum(q(y)).alias("sy"),
        F.sum(q(x * y)).alias("sxy"),
        F.sum(q(x * x)).alias("sxx"),
        F.sum(q(y * y)).alias("syy"),
        F.sum("cnt").alias("c_top"),
    )
    j = sums.crossJoin(F.broadcast(totals))
    S = F.lit(float(_KL_SCALE))
    n = F.col("n_fit").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    num = n * sxy * S - sx * sy
    den_x = n * sxx * S - sx * sx
    den_y = n * syy * S - sy * sy
    return j.select(
        F.col("n_vocab").cast("bigint").alias("n_vocab"),
        F.col("c_total").cast("bigint").alias("c_total"),
        F.col("n_fit").cast("bigint").alias("n_fit"),
        det_round(F.col("c_top") / F.col("c_total"), 6).alias(
            "top_coverage"
        ),
        F.when(den_x > 0, det_round(num / den_x, 6)).alias("zipf_slope"),
        F.when(
            (den_x > 0) & (den_y > 0),
            det_round((num * num) / (den_x * den_y), 6),
        ).alias("zipf_r2"),
    )


# ---------------------------------------------------------------------------
# Per-document token entropy — lexical-diversity / repetitiveness signal
# ---------------------------------------------------------------------------


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_types, entropy, entropy_ratio): Shannon
    entropy of each document's OWN token distribution, H = −Σ p·ln p
    over the doc's term frequencies, plus the ln(n_types)-normalized
    ratio in [0, 1] (1 = perfectly diverse, → 0 = one token dominates).
    The standard lexical-diversity gate between ``repetition_stats``
    (which only sees exact duplicate lines/words/bigrams) and
    ``unigram_logprob`` (which scores against the CORPUS distribution,
    so a doc repeating one common word still scores near the mean):
    low own-entropy flags keyword stuffing and template spam that both
    neighbors pass. ``entropy_ratio`` is NULL for docs with fewer than
    2 distinct tokens (ln 1 = 0); ``entropy`` is NULL for empty/NULL
    text.

    Cross-engine determinism: each p·ln p contribution is quantized to
    1e-9 fixed-point BIGINT (the ``_KL_SCALE`` convention), so the
    per-doc sum is an exact integer on both engines.

    100 TB shape: one corpus explode into a map-side-combined
    (doc_id, term) count aggregate, then a doc_id window + final
    aggregate sharing one exchange — the same two-exchange budget as
    ``unigram_logprob``, with every key bounded (term grain, doc
    grain). No driver-side state, no UDFs."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    words = (
        spread_to_cores(docs, "doc_id")
        .select("doc_id", F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
    )
    counts = words.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("doc_id")
    p = F.col("c") / F.col("n")
    contrib_fx = F.floor(
        p * F.log(p) * F.lit(_KL_SCALE) + F.lit(0.5)
    ).cast("bigint")
    per_doc = (
        counts.withColumn("n", F.sum("c").over(w))
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(contrib_fx).alias("h_fx"),
        )
    )
    entropy = det_round(
        -(F.col("h_fx").cast("double") / F.lit(float(_KL_SCALE))), 6
    )
    ratio = F.when(
        F.col("n_types") > 1,
        det_round(
            -(F.col("h_fx").cast("double") / F.lit(float(_KL_SCALE)))
            / F.log(F.col("n_types").cast("double")),
            6,
        ),
    )
    scored = per_doc.select(
        "doc_id",
        "n_tokens",
        "n_types",
        entropy.alias("entropy"),
        ratio.alias("entropy_ratio"),
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("n_types"), F.lit(0)).alias("n_types"),
            "entropy",
            "entropy_ratio",
        )
    )
