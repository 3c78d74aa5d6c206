"""Text-analysis operators for a training-data pipeline (SURVEY.md §2.G).

Language-ID (stopword/ascii heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (rolling
hash). All pure `pyspark.sql.functions` — no Python UDFs — so every
expression runs inside whole-stage codegen and scales linearly with
input splits (narrow, shuffle-free per-document transforms; the only
shuffles in this module are explicit groupBys on low-cardinality keys).

Reference grounding: the reference pipeline enriches documents for an
Elasticsearch search index (reference README.md:48,77); these operators
are the document-side enrichment realized, plus the BASELINE.json
north-star LLM-data ops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .hashing import char_hash, round4, shingle_hashes

# Tiny embedded stopword list (public knowledge). The fixture corpus is
# lowercase space-separated words, so membership is a plain array test.
STOPWORDS = ("a", "the", "of", "and", "in", "to", "is")

# BPE-ish pretokenizer: letter runs, digit runs (dialect-portable subset
# of the GPT-2 pattern — no lookaheads, identical in Java and RE2).
BPE_RE = "[a-zA-Z]+|[0-9]+"


def tokens_col(text: Column | str = "text") -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, " ")


def shingles_col(text: Column | str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document (array column).

    Built with sequence+transform so shingling is a narrow JVM-side op;
    at 100 TB this never leaves the scan stage.
    """
    w = tokens_col(text)
    # slice+zip_with, NOT element_at inside a transform lambda: a lambda
    # body re-evaluates captured expressions per element, turning
    # shingling into O(tokens²) splits per document. Slices evaluate the
    # token array n times total, then zip_with is one concat per shingle.
    length = F.size(w) - (n - 1)
    parts = [F.slice(w, k + 1, length) for k in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat_ws(" ", a, b))
    # guard short docs (slice with non-positive length errors)
    return F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality/statistics row (narrow, codegen-only).

    Columns: token counts (whitespace + BPE-ish), type-token ratio,
    stopword ratio, alpha ratio, average token length, a composite
    quality score, and a heuristic language guess.
    """
    w = tokens_col()
    n_tok = F.size(w)
    n_types = F.size(F.array_distinct(w))
    n_stop = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS)))
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    n_chars = F.length("text")
    stop_ratio = n_stop / n_tok
    ttr = n_types / n_tok
    alpha_ratio = n_alpha / n_chars
    avg_tok_len = (n_chars - (n_tok - 1)) / n_tok  # chars minus separators
    # Composite quality: stopword presence + lexical diversity + alphaness.
    quality = round4(
        F.least(stop_ratio * 4, F.lit(1.0)) * 0.4 + ttr * 0.3 + alpha_ratio * 0.3
    )
    pred_lang = F.when(stop_ratio >= 0.02, F.lit("en")).otherwise(F.lit("other"))
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{BPE_RE}', 0))").alias("n_bpe_tokens"),
        n_types.alias("n_types"),
        round4(stop_ratio).alias("stop_ratio"),
        round4(ttr).alias("ttr"),
        round4(alpha_ratio).alias("alpha_ratio"),
        round4(avg_tok_len).alias("avg_token_len"),
        quality.alias("quality"),
        pred_lang.alias("pred_lang"),
    )


def lang_confusion(docs: DataFrame) -> DataFrame:
    """Labelled-vs-predicted language confusion counts (groupBy on a
    handful of language codes — partial aggregation makes the shuffle a
    few rows per executor regardless of corpus size)."""
    stats = text_stats(docs).select("doc_id", "pred_lang")
    return (
        docs.select("doc_id", "lang")
        .join(stats, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: full-text rolling hash + min-shingle hash
    (winnowing-style representative). Equal fingerprints => dup cluster.

    The full-text fp is the char-fold rolling hash; the shingle lane
    uses the cheap md5-prefix word hashes (hashing.shingle_hashes)."""
    shh = shingle_hashes(tokens_col())
    return docs.select(
        "doc_id",
        char_hash(F.col("text")).alias("fp"),
        F.array_min(shh).alias("min_shingle_fp"),
        F.size(shh).alias("n_shingles"),
    )


def repetition_stats(docs: DataFrame, n: int = 3) -> DataFrame:
    """Intra-document repetition signal: fraction of n-gram slots
    occupied by repeats (1 - distinct/total shingles). Repetitive
    generations and boilerplate score high — the standard cheap
    quality filter alongside stop-ratio. Narrow per-row arrays, no
    shuffle."""
    w = tokens_col()
    total = F.greatest(F.size(w) - (n - 1), F.lit(0))
    distinct = F.size(shingles_col(n=n))  # shingles_col dedups
    return docs.select(
        "doc_id",
        total.alias("n_shingles"),
        distinct.alias("n_distinct"),
        F.when(total > 0, round4(1 - distinct / total))
        .otherwise(F.lit(0.0))
        .alias("rep_ratio"),
    )


def vocab_topk(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """Corpus vocabulary candidates: top-k tokens by frequency.

    explode -> groupBy(token) with map-side partial aggregation (the
    shuffle carries one row per distinct token per partition, not one
    per occurrence) -> rank window over the aggregated counts (tiny:
    |vocab| rows). Deterministic tie-break (count desc, token asc).
    """
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("rank", "token", "n")
    )


def char_ngram_profiles(docs: DataFrame, n: int = 2, top_k: int = 5) -> DataFrame:
    """Top-k character n-grams per language label — the classic
    n-gram language-ID profile (rank-order profiles per language;
    narrow zip_with construction, one groupBy on (lang, gram))."""
    from pyspark.sql import Window

    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != F.lit(""))
    length = F.size(chars) - (n - 1)
    parts = [F.slice(chars, k + 1, length) for k in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat(a, b))
    counts = (
        docs.select("lang", F.explode(grams).alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("lang", "rank", "gram", "n")
    )
