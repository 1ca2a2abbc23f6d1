"""On-corpus BPE tokenizer training (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
tokenizer-artifact half of a training-data pipeline, as DataFrame algebra.

The published algorithm's scale split is respected exactly:

1. ONE corpus scan builds the word-frequency table (map-side combined;
   vocabulary-bounded output). This is the only corpus-sized pass.
2. Every merge round runs over the VOCAB table only: count adjacent
   symbol pairs weighted by word frequency (one aggregate), pick the most
   frequent pair (a bounded ``.first()`` — the same sanctioned per-round
   driver action as the connected-components convergence check), and
   rewrite each word's symbol array with a left-to-right greedy fold
   (``aggregate`` higher-order function — JVM-side, no UDF). The table is
   eagerly localCheckpoint-ed each round so round N's plan stays
   constant-size (the dedup_clusters discipline).

Determinism: pair counts are exact integer sums; the argmax tie-breaks on
the pair itself, so the merge list is a pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from market_flow_spark.sources.layout import spread_to_cores

END_OF_WORD = "</w>"


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def word_symbol_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, syms): corpus word frequencies with each word split
    into its initial symbol sequence (characters + a terminal
    ``</w>`` marker, the standard word-boundary trick). The one
    corpus-sized pass of BPE training."""
    norm = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    words = (
        spread_to_cores(docs, "doc_id")
        .select(F.explode(F.split(norm, r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    syms = F.expr(
        f"concat(transform(sequence(1, length(word)), "
        f"i -> substr(word, i, 1)), array('{END_OF_WORD}'))"
    )
    return words.select("word", "freq", syms.alias("syms"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.expr(
        "CASE WHEN size(syms) >= 2 THEN "
        "transform(sequence(1, size(syms)-1), "
        "i -> struct(syms[i-1] AS a, syms[i] AS b)) "
        "ELSE cast(array() as array<struct<a:string,b:string>>) END"
    )
    return (
        vocab.select("freq", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("n"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every symbol array with the (a, b) -> ab merge applied
    left-to-right greedily (overlapping runs merge like the reference
    implementation: 'aaa' under (a,a) becomes ['aa','a'])."""
    qa, qb = _sql_quote(a), _sql_quote(b)
    qab = _sql_quote(a + b)
    merged = F.expr(
        f"aggregate(syms, cast(array() as array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {qa} "
        f"AND x = {qb} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({qab})) "
        f"ELSE concat(acc, array(x)) END)"
    )
    return vocab.select("word", "freq", merged.alias("syms"))


def bpe_train(
    docs: DataFrame,
    n_merges: int = 30,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list [(left, right, weighted_count), ...] — the tokenizer
    artifact. Stops early when no pair reaches ``min_pair_freq``.

    Greedy left-to-right merge semantics match the reference
    implementation (pinned against a plain-python replica in
    tests/test_tokenizer.py)."""
    vocab = word_symbol_table(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_freq:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        vocab = _apply_merge(vocab, a, b).localCheckpoint(eager=True)
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "tokens",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Apply a trained merge list to segment each row's text into BPE
    tokens (array<string> in ``out_col``). One row-wise split into
    per-word symbol arrays, then the merge folds applied in training
    order — all higher-order-function projections. The plan is
    checkpoint-truncated every ``checkpoint_every`` merges so expression
    depth stays bounded for long merge lists."""
    norm = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    word_syms = F.expr(
        f"transform(filter(split(trim(lower(coalesce({text_col}, ''))), "
        f"'\\\\s+'), w -> w <> ''), "
        f"w -> concat(transform(sequence(1, length(w)), "
        f"i -> substr(w, i, 1)), array('{END_OF_WORD}')))"
    )
    out = df.withColumn("__wsyms", word_syms)
    del norm
    for i, (a, b, _) in enumerate(merges):
        qa, qb, qab = _sql_quote(a), _sql_quote(b), _sql_quote(a + b)
        out = out.withColumn(
            "__wsyms",
            F.expr(
                f"transform(__wsyms, syms -> "
                f"aggregate(syms, cast(array() as array<string>), "
                f"(acc, x) -> CASE WHEN size(acc) > 0 "
                f"AND element_at(acc, -1) = {qa} AND x = {qb} "
                f"THEN concat(slice(acc, 1, size(acc) - 1), array({qab})) "
                f"ELSE concat(acc, array(x)) END))"
            ),
        )
        if (i + 1) % checkpoint_every == 0 and not out.isStreaming:
            out = out.localCheckpoint(eager=False)
    return out.withColumn(out_col, F.flatten("__wsyms")).drop("__wsyms")
