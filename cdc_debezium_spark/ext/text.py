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
from pyspark.sql import Column, DataFrame, Window

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
    per occurrence) -> orderBy().limit(k), which Spark compiles to
    TakeOrderedAndProject (per-partition top-k + k-row driver merge) —
    NOT a single-partition global window, so the distinct-token table
    can be billions of rows and no task ever sorts all of it. The rank
    window then runs over the k surviving rows only. Deterministic
    tie-break (count desc, token asc).
    """
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "token", "n")
    )


# Redaction patterns (dialect-portable: alternation, classes, bounded
# repeats, and \b behave identically in Java regex and RE2). The PII
# patterns guard real corpora; the lexicon pattern exercises the same
# machinery on this all-letters fixture corpus.
PII_RE = (
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"  # email
    "|([0-9]{1,3}\\.){3}[0-9]{1,3}"  # ipv4
    "|[0-9]{6,}"  # long digit runs (ids, phones)
)
LEXICON_RE = "\\b(" + "|".join(STOPWORDS) + ")\\b"
REDACT = "<x>"


def scrub_text(docs: DataFrame, keep_text: bool = False) -> DataFrame:
    """PII / lexicon redaction: regexp-replace chain per document.

    Narrow codegen pass (regexp_replace + regexp_extract_all are JVM
    builtins) — no shuffle at any corpus size. Emits redaction counts
    and the md5 of the scrubbed text (the manifest row); ``keep_text``
    additionally returns the scrubbed text for tests.
    """
    # patterns go in as lit() columns, NOT through F.expr: Spark SQL
    # string literals treat backslashes as escapes ('\b' = backspace),
    # silently breaking \b word boundaries.
    n_pii = F.size(F.regexp_extract_all("text", F.lit(PII_RE), F.lit(0)))
    n_lex = F.size(F.regexp_extract_all("text", F.lit(LEXICON_RE), F.lit(0)))
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", PII_RE, REDACT), LEXICON_RE, REDACT
    )
    cols = [
        F.col("doc_id"),
        n_pii.alias("n_pii"),
        n_lex.alias("n_redacted"),
        F.md5(scrubbed).alias("scrub_md5"),
        F.length(scrubbed).alias("n_chars_scrubbed"),
    ]
    if keep_text:
        cols.append(scrubbed.alias("scrubbed"))
    return docs.select(*cols)


def chunk_documents(
    docs: DataFrame, size: int = 64, stride: int = 48
) -> DataFrame:
    """Overlapping token-window chunking — the context-window splitter
    every pretraining tokenization pass runs.

    Chunk count and boundaries are pure integer arithmetic; chunk
    bodies are array slices of the one token array (narrow, per-row —
    chunking never shuffles; downstream repartitions by chunk count if
    needed). Chunks cover every token: starts step by `stride`, the
    last window clamps at the document end.
    """
    assert 0 < stride <= size
    w = tokens_col()
    n = F.size(w)
    n_chunks = F.expr(
        f"1 + ((greatest(size(split(text, ' ')) - {size}, 0) + {stride - 1})"
        f" div {stride})"
    )
    base = docs.select("doc_id", w.alias("w"), n_chunks.alias("nc"))
    chunks = base.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_id"),
    ).withColumn("start_tok", F.col("chunk_id") * stride)
    chunk = F.slice(F.col("w"), F.col("start_tok") + 1, size)
    return chunks.select(
        "doc_id",
        "chunk_id",
        "start_tok",
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


def tfidf_topk(docs: DataFrame, top_k: int = 3) -> DataFrame:
    """Top-k salient terms per document by tf·(N/df) — the linear
    idf variant (no transcendental ln, so the score is one multiply
    and one divide on integers-as-doubles: bit-exact cross-engine).

    tf and df come from one exploded groupBy each (map-side partial
    aggregation); N joins in as a broadcast scalar. The rank window
    partitions by doc_id — the corpus-sized shuffle is on doc_id,
    identical to any per-document windowing at scale.
    """
    from pyspark.sql import Window

    tf = (
        docs.select("doc_id", F.explode(tokens_col()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    score = (
        F.col("tf").cast("double") * F.col("n_docs").cast("double")
    ) / F.col("df").cast("double")
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            "doc_id",
            "rank",
            "token",
            "tf",
            "df",
            round4(F.col("score")).alias("score"),
        )
    )


def char_ngram_profiles(docs: DataFrame, n: int = 2, top_k: int = 5) -> DataFrame:
    """Top-k character n-grams per language label — the classic
    n-gram language-ID profile (rank-order profiles per language).

    Gram construction (r16, guide §4.2/§1.2 per-task work): ONE
    codegen `regexp_extract_all` with an overlapping-window lookahead
    — `(?s)(?=(.{n})).` captures the n chars at every position and
    consumes one — instead of splitting the text into a per-CHARACTER
    array and zip_with-concatenating slices: the lambda evaluated
    interpreted per character, the single biggest per-task cost in the
    text family (corpus chars ≫ corpus tokens). Measured at sf1:
    15.2 s -> 4.1 s for the full lane, gram counts byte-identical
    ((?s) keeps newline chars matching, mirroring the split-based
    grams and the oracle's string_split)."""
    from pyspark.sql import Window

    grams = F.expr(
        f"regexp_extract_all(text, '(?s)(?=(.{{{n}}})).', 1)"
    )
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


def char_entropy(docs: DataFrame) -> DataFrame:
    """Per-document character-distribution entropy (bits/char) — the
    classic gibberish/low-diversity signal alongside text_stats and
    repetition_stats: natural prose sits ~4 bits, single-char spam near
    0, uniform noise near log2(alphabet).

    Shape: one (doc_id, char) count shuffle (map-side combine), then a
    per-doc fold over the SORTED (char, n) list — sorted + left-to-right
    so the DuckDB oracle's list_reduce reproduces the float sum
    bit-for-bit (cross-partition float SUM order isn't stable; a
    bounded per-doc fold is). Alphabet size bounds the list at ~100
    entries regardless of corpus size. Entropy rounds to 4dp to absorb
    libm log2 ulp skew.
    """
    ch = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", ""), lambda c: c != F.lit(""))).alias(
            "c"
        ),
    )
    counts = ch.groupBy("doc_id", "c").count()
    per_doc = counts.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("c").alias("ch"), F.col("count").alias("n")))
        ).alias("cs")
    )
    with_total = per_doc.select(
        "doc_id",
        "cs",
        F.aggregate(
            "cs", F.lit(0).cast("long"), lambda acc, s: acc + s["n"]
        ).alias("total"),
    )
    p = lambda s: s["n"].cast("double") / F.col("total").cast("double")  # noqa: E731
    ent = -F.aggregate(
        "cs",
        F.lit(0.0),
        lambda acc, s: acc + p(s) * F.log2(p(s)),
    )
    return with_total.select(
        "doc_id",
        F.col("total").alias("n_chars_counted"),
        F.size("cs").alias("n_distinct_chars"),
        round4(ent).alias("entropy"),
    )


BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """BPE-style pre-tokenization counts: letter runs, digit runs, and
    punctuation runs (the GPT-2 pre-tokenizer shape, minus the unicode
    classes this ASCII corpus doesn't need). A tokenizer-budget
    estimator that runs as one codegen regexp pass — no vocab, no UDF.
    The pattern stays in basic POSIX classes so Java and RE2 regex
    engines agree token-for-token.
    """
    toks = F.regexp_extract_all("text", F.lit(BPE_PAT), F.lit(0))
    ws = F.size(F.split("text", " "))
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        F.size(toks).alias("n_bpe_tokens"),
        round4(
            F.length("text").cast("double") / F.size(toks).cast("double")
        ).alias("chars_per_bpe_token"),
    )


def quality_rules(docs: DataFrame) -> DataFrame:
    """Gopher-style per-document quality rules, one boolean per rule
    plus the composite keep flag.

    Every rule compares INTEGERS (cross-multiplied ratios), so there
    is no float anywhere and the flags are engine-exact:
      r_len      20 <= n_words <= 1000
      r_wordlen  mean word length in [3, 10]  (3n <= sumlen <= 10n)
      r_stop     at least 2 stopword hits
      r_ttr      type-token ratio > 0.2        (5 * n_types > n_words)
    One narrow codegen pass; the keep flag is the AND. The per-rule
    breakdown (not just the verdict) is what a curation run reports —
    it tells you WHICH rule is responsible for the reject rate.
    """
    w = tokens_col()
    n_words = F.size(w)
    sum_wordlen = F.aggregate(
        F.transform(w, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    n_stop = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS)))
    n_types = F.size(F.array_distinct(w))
    r_len = (n_words >= 20) & (n_words <= 1000)
    r_wordlen = (F.lit(3) * n_words <= sum_wordlen) & (
        sum_wordlen <= F.lit(10) * n_words
    )
    r_stop = n_stop >= 2
    r_ttr = F.lit(5) * n_types > n_words
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        r_len.alias("r_len"),
        r_wordlen.alias("r_wordlen"),
        r_stop.alias("r_stop"),
        r_ttr.alias("r_ttr"),
        (r_len & r_wordlen & r_stop & r_ttr).alias("keep"),
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """CCNet-style unigram language-model score per document: the mean
    negative log2-probability of the document's tokens under the
    corpus unigram distribution. Low scores = highly predictable
    (boilerplate/repetition); very high = out-of-distribution noise —
    the classic cheap perplexity proxy for corpus filtering.

    score = log2(N) - (Σ_t tf(d,t)·log2(cnt(t))) / |d|

    Shape: one (doc_id, token) tf shuffle, one token→corpus-count
    shuffle, a broadcast of the 1-row corpus total, then a per-doc
    SORTED left-to-right fold over the (token, tf, cnt) list — the
    entropy-lane determinism pattern: float sums stay bit-identical
    cross-engine; 4dp floor rounding absorbs libm log2 ulp skew. The
    per-doc list is bounded by the doc's distinct-token count. The
    repeated tf subtree dedups at runtime via AQE stage reuse
    (verified r15; a window-sum reformulation measured slower at sf1
    and was reverted).
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(tokens_col(), lambda t: t != F.lit(""))).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    cnt = tf.groupBy("tok").agg(F.sum("tf").alias("cnt"))
    total = cnt.agg(F.sum("cnt").alias("n_total"))
    per_doc = (
        tf.join(cnt, "tok")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("tok", "tf", "cnt"))
            ).alias("ts")
        )
        .crossJoin(F.broadcast(total))
    )
    n_tok = F.aggregate("ts", F.lit(0).cast("long"), lambda a, s: a + s["tf"])
    logsum = F.aggregate(
        "ts",
        F.lit(0.0),
        lambda a, s: a + s["tf"].cast("double") * F.log2(s["cnt"].cast("double")),
    )
    score = F.log2(F.col("n_total").cast("double")) - logsum / n_tok.cast(
        "double"
    )
    return per_doc.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.size("ts").alias("n_types"),
        (F.floor(score * 10000.0 + F.lit(0.5)) / 10000.0).alias("neg_log2p"),
    )


def chunk_dedup_stats(docs: DataFrame, size: int = 64) -> DataFrame:
    """Paragraph/window-level duplicate mass per document: chunk each
    document into NON-overlapping `size`-token windows, hash them, and
    report what fraction of each document's chunks also appear
    elsewhere in the corpus — the C4-style coarse-granularity dedup
    signal between whole-document dedup and exact span dedup.

    Shape (r16, guide §2.5 skew): the chunker is narrow per-row and
    runs ONCE into a single hash(doc_id) repartition that BOTH
    branches share (identical subtree -> AQE reuses the exchange).
    Because hash(doc_id) satisfies the (doc_id, chunk_md5) grouping's
    clustering requirement, the occurrence counts aggregate with NO
    further exchange; the corpus frequency is a partial-agged hash
    aggregate of that collapsed table (a boilerplate chunk's rows
    collapse per partition before its tiny exchange); and the join
    back is keyed on chunk_md5 with ONE frequency row per key — it
    broadcasts while the frequency table fits and degrades to an
    AQE-skew-splittable shuffle join beyond that. While broadcast,
    the probe keeps its hash(doc_id) partitioning, so the final
    per-doc aggregate ALSO needs no exchange: one corpus-scale
    exchange end to end (the r15 window shape had two). The r15 shape
    computed dfc as a WINDOW COUNT over (chunk_md5) instead: window
    partitions cannot be split, so a boilerplate chunk shared by
    10-30 % of a 100 TB corpus serializes into ONE task (r15 verdict
    item 1); skewed-fixture A/B in OPTIMIZATION_r16.md (max/median
    task 8.2x -> 1.1x, wall 11.5 -> 6.8 s on the 60 %-hot fixture).
    Integer-ratio dup fractions hash exactly.
    """
    ch = (
        chunk_documents(docs, size=size, stride=size)
        .select("doc_id", "chunk_md5")
        .repartition("doc_id")
    )
    g = ch.groupBy("doc_id", "chunk_md5").agg(F.count("*").alias("k"))
    freq = g.groupBy("chunk_md5").agg(F.sum("k").alias("dfc"))
    joined = g.join(freq, "chunk_md5")
    n_chunks = F.sum("k")
    dup = F.sum(F.when(F.col("dfc") > 1, F.col("k")).otherwise(0))
    return joined.groupBy("doc_id").agg(
        n_chunks.cast("long").alias("n_chunks"),
        dup.cast("long").alias("n_dup_chunks"),
        (
            F.floor((dup / n_chunks) * 10000.0 + F.lit(0.5)) / 10000.0
        ).alias("dup_frac"),
    )


def oov_stats(docs: DataFrame, vocab_k: int = 200) -> DataFrame:
    """Vocabulary coverage per document: token count, out-of-vocab
    count, and OOV rate against the corpus top-`vocab_k` vocabulary —
    the tokenizer-fit diagnostic a training pipeline runs before
    committing to a vocab size.

    Two shuffles total: the token-count aggregate that builds the
    vocab (map-side partial agg) and the per-doc aggregate. The vocab
    itself is k rows and BROADCASTS to the exploded token stream —
    at 100 TB the token stream is never shuffled, only scanned.
    """
    vocab = vocab_topk(docs, vocab_k).select("token").withColumn(
        "_in_vocab", F.lit(1)
    )
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("token"))
    joined = toks.join(F.broadcast(vocab), "token", "left")
    n_oov = F.sum(
        F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
    ).cast("long")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        n_oov.alias("n_oov"),
        (
            F.floor(
                F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
                / F.count("*")
                * 10000.0
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("oov_rate"),
    )


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """Bigram language-model score per document: the mean negative
    log2 conditional probability -log2 p(w2|w1) of the document's
    bigrams under the corpus bigram distribution — one step up the
    n-gram ladder from unigram_logprob, the KenLM-style cheap
    perplexity proxy (CCNet filters on exactly this statistic).

    p(w2|w1) = cnt(w1 w2) / ctx(w1), where cnt is the corpus bigram
    count and ctx(w1) = Σ_w cnt(w1 w) is the left-context total. Every
    document's own bigrams are part of the corpus counts, so cnt ≥ 1
    and no smoothing term is needed.

    Shape at 100 TB: bigram construction is NARROW (slice + zip_with
    per row — no posexplode self-join); then one (doc_id, bigram) tf
    shuffle, one bigram→corpus-count shuffle, a context rollup over
    the (already tiny relative to the corpus) count table, and hash
    joins keyed on bigram/context — no broadcast assumption, the
    bigram vocabulary is unbounded. The tf subtree appears in three
    branches but AQE stage reuse dedups it at runtime (verified r15:
    the executed plan carries one scan + a ReusedExchange; an
    explicit window-sum reformulation was measured SLOWER at sf0.1
    and sf1 — string-key window sorts cost more than the reused
    hash-agg branches — and reverted). The per-doc fold list is
    bounded by the doc's distinct-bigram count, and the SORTED
    left-to-right fold keeps float sums bit-identical cross-engine
    (entropy-lane pattern); 4dp floor rounding absorbs libm log2 ulp
    skew.
    """
    toks = F.filter(tokens_col(), lambda t: t != F.lit(""))
    base = docs.select("doc_id", toks.alias("ts")).filter(F.size("ts") >= 2)
    heads = F.slice("ts", 1, F.size("ts") - 1)
    tails = F.slice("ts", 2, F.size("ts") - 1)
    bgs = F.zip_with(heads, tails, lambda a, b: F.concat_ws(" ", a, b))
    bg = base.select("doc_id", F.explode(bgs).alias("bg"))
    tf = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("tf"))
    cnt = tf.groupBy("bg").agg(F.sum("tf").alias("cnt"))
    ctx = (
        cnt.withColumn("w1", F.substring_index("bg", " ", 1))
        .groupBy("w1")
        .agg(F.sum("cnt").alias("ctx"))
    )
    per_doc = (
        tf.join(cnt, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(ctx, "w1")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("bg", "tf", "cnt", "ctx"))
            ).alias("bs")
        )
    )
    n_bg = F.aggregate("bs", F.lit(0).cast("long"), lambda a, s: a + s["tf"])
    logsum = F.aggregate(
        "bs",
        F.lit(0.0),
        lambda a, s: a
        + s["tf"].cast("double")
        * (F.log2(s["ctx"].cast("double")) - F.log2(s["cnt"].cast("double"))),
    )
    return per_doc.select(
        "doc_id",
        n_bg.alias("n_bigrams"),
        F.size("bs").alias("n_bigram_types"),
        (F.floor(logsum / n_bg.cast("double") * 10000.0 + F.lit(0.5)) / 10000.0).alias(
            "neg_log2p_bigram"
        ),
    )


# Logistic quality-classifier weights (fastText/CCNet-style linear
# model over interpretable features; the values stand in for trained
# weights — a real deployment broadcasts its trained coefficient row
# the same way these constants compile into the plan).
CLASSIFIER_WEIGHTS = {
    "bias": -2.0,
    "log_words": 0.5,     # longer docs mildly favored (log-scaled)
    "mean_wordlen": -0.15,  # very long average words → code/noise
    "stop_ratio": 3.0,    # natural-language indicator
    "ttr": 1.0,           # lexical diversity
}


def quality_classifier(docs: DataFrame) -> DataFrame:
    """Model-based quality score per document: a logistic regression
    over the same interpretable features the Gopher rules threshold
    (quality_rules), scored in one narrow codegen pass — the
    classifier-filtering stage of a curation pipeline (CCNet / GPT-3
    WebText-similarity filtering), with the trained weights replaced
    by fixed documented constants.

    score = sigmoid(b + w·[ln(1+n), sumlen/n, stop/n, types/n])

    Shape at 100 TB: zero shuffles, zero Python — the weight vector
    compiles into the plan (the broadcast-model idiom at its limit)
    and every feature reuses the quality_rules integer counters. The
    linear term is written as a fixed left-to-right chain so both
    engines evaluate the identical IEEE expression; 4dp floor absorbs
    libm exp ulp skew, and the keep flag compares the ROUNDED score so
    it is engine-exact.
    """
    w = tokens_col()
    n_words = F.size(w)
    sum_wordlen = F.aggregate(
        F.transform(w, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    n_stop = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS)))
    n_types = F.size(F.array_distinct(w))
    nd = n_words.cast("double")
    wt = CLASSIFIER_WEIGHTS
    z = (
        F.lit(wt["bias"])
        + F.lit(wt["log_words"]) * F.log(F.lit(1.0) + nd)
        + F.lit(wt["mean_wordlen"]) * (sum_wordlen.cast("double") / nd)
        + F.lit(wt["stop_ratio"]) * (n_stop.cast("double") / nd)
        + F.lit(wt["ttr"]) * (n_types.cast("double") / nd)
    )
    score = F.floor(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) * 10000.0 + F.lit(0.5)
    ) / 10000.0
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        score.alias("score"),
        (score > 0.5).alias("keep"),
    )


def bm25_scores(docs: DataFrame, query_k: int = 5) -> DataFrame:
    """BM25 relevance of every document that hits at least one of the
    corpus's top-df query terms (k1=1.2, b=0.75; documents containing
    none of the query terms score 0 and are omitted — downstream
    retrieval_fusion treats absence as rank-∞) — the lexical half of a retrieval /
    hard-negative-mining stage in a curation pipeline; the vector half
    is ext_similarity_topk, and fusing the two rankings is a plain
    join on doc_id.

    Shape at 100 TB: one (doc_id, token) tf shuffle; doc lengths
    derive from that SAME tf frame (AQE stage reuse dedups the
    repeated tf subtree at runtime); the query-term table is k rows
    and BROADCASTS; corpus N/avgdl is a NARROW broadcast 1-row
    aggregate (r15: count + Σ size(token array) per doc row — no
    longer re-derived through the tf chain; n_docs is exact because
    split() yields ≥1 element for every non-null text). The global
    top-df selection is TakeOrderedAndProject over the token-count
    table, not the corpus. r15 note: carrying dl = size(split(text))
    THROUGH the explode was measured 5x slower at sf1 — the collapsed
    projection recomputes the split per token row — so dl stays an
    aggregate of the tf frame; the doc_id join is the honest cost.
    Per-doc scoring is a SORTED fold over ≤ query_k structs —
    engine-exact floats, 4dp floor.
    """
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("dfreq"))
    # count/sum only non-null text (r15 ADVICE): the oracle derives
    # stats FROM the tf chain, where a NULL-text doc contributes no
    # rows — but size(split(NULL)) is -1 under legacy sizeOfNull and
    # count(*) would still count the doc, silently skewing N and Σdl
    # on any corpus with null text (gate fixtures are non-null, so
    # values are unchanged there).
    stats = docs.agg(
        F.count("text").alias("n_docs"),
        F.sum(
            F.when(F.col("text").isNotNull(), F.size(tokens_col())).otherwise(0)
        ).cast("long").alias("sum_dl"),
    )
    # TakeOrderedAndProject, not a single-partition window: the
    # distinct-token table is corpus-scale at 100 TB.
    qterms = (
        dfreq.orderBy(F.desc("dfreq"), F.asc("token"))
        .limit(query_k)
        .select("token", "dfreq")
    )
    per = (
        tf.join(F.broadcast(qterms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    g = per.groupBy("doc_id", "dl", "n_docs", "sum_dl").agg(
        F.sort_array(F.collect_list(F.struct("token", "tf", "dfreq"))).alias("qs")
    )
    ndd = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / ndd
    dld = F.col("dl").cast("double")
    score = F.aggregate(
        "qs",
        F.lit(0.0),
        lambda a, s: a
        + F.log(
            (ndd - s["dfreq"].cast("double") + 0.5)
            / (s["dfreq"].cast("double") + 0.5)
            + 1.0
        )
        * (s["tf"].cast("double") * 2.2)
        / (s["tf"].cast("double") + 1.2 * (0.25 + 0.75 * (dld / avgdl))),
    )
    return g.select(
        "doc_id",
        F.size("qs").alias("n_hits"),
        F.col("dl").alias("dl"),
        (F.floor(score * 10000.0 + F.lit(0.5)) / 10000.0).alias("bm25"),
    )


def source_quality_prior(docs: DataFrame, m: float = 20.0) -> DataFrame:
    """Host/source-level quality prior with empirical-Bayes shrinkage:
    each source's Gopher-rule keep rate pulled toward the corpus rate
    with pseudo-count m — the CommonCrawl-style host filter that stays
    sane for sources with 3 documents (pure rate would be 0/1-noisy).

    shrunk = (keeps + m·global_rate) / (n + m)

    Shape: the rule flags are integer-exact narrow expressions, ONE
    source aggregate, a broadcast 1-row corpus aggregate — at 100 TB
    the per-source table is tiny relative to the corpus, and nothing
    shuffles the documents twice. Output is per-source (hosts, not
    docs), so the frame is low-cardinality by construction.
    """
    flags = quality_rules(docs).select("doc_id", F.col("keep").cast("long").alias("k"))
    src = docs.select("doc_id", "source").join(flags, "doc_id")
    per = src.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("k").alias("n_keep")
    )
    tot = per.agg(
        F.sum("n_docs").alias("tot_docs"), F.sum("n_keep").alias("tot_keep")
    )
    g = per.crossJoin(F.broadcast(tot))
    grate = F.col("tot_keep").cast("double") / F.col("tot_docs").cast("double")
    shrunk = (F.col("n_keep").cast("double") + F.lit(m) * grate) / (
        F.col("n_docs").cast("double") + F.lit(m)
    )
    raw = F.col("n_keep").cast("double") / F.col("n_docs").cast("double")
    return g.select(
        "source",
        "n_docs",
        "n_keep",
        (F.floor(raw * 10000.0 + F.lit(0.5)) / 10000.0).alias("raw_rate"),
        (F.floor(shrunk * 10000.0 + F.lit(0.5)) / 10000.0).alias("shrunk_rate"),
    )


def retrieval_fusion(docs: DataFrame, emb: DataFrame, k: int = 50) -> DataFrame:
    """Reciprocal-rank fusion of the lexical (BM25) and vector
    (cosine top-k against query vector 0) rankings — the standard
    hybrid-retrieval merge (RRF, Cormack et al.): documents surfacing
    in either list score 1/(60+rank) per list, summed.

    Shape at 100 TB: both source rankings reduce to k-row frames
    BEFORE the fusion join (TakeOrdered for the lexical side, the
    brute-force/IVF top-k for the vector side), so the full-outer
    fusion join touches 2k rows regardless of corpus size. Ranks are
    integers and the RRF sum is two fixed-order divisions — engine-
    exact, 4dp floor.
    """
    from pyspark.sql import Window

    from .similarity import brute_force_topk

    lex_top = bm25_scores(docs, 5).orderBy(
        F.desc("bm25"), F.asc("doc_id")
    ).limit(k)
    wl = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = lex_top.withColumn(
        "lex_rank", F.row_number().over(wl).cast("long")
    ).select("doc_id", "lex_rank")
    vec = (
        brute_force_topk(emb, n_queries=1, k=k)
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").cast("long").alias("vec_rank"),
        )
    )
    fused = lex.join(vec, "doc_id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(60.0) + F.col("lex_rank").cast("double")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(60.0) + F.col("vec_rank").cast("double")), F.lit(0.0)
    )
    return fused.select(
        "doc_id",
        "lex_rank",
        "vec_rank",
        (F.floor(rrf * 10000.0 + F.lit(0.5)) / 10000.0).alias("rrf"),
    )


def collocations(docs: DataFrame, min_count: int = 5, top_k: int = 20) -> DataFrame:
    """Top-k collocations by pointwise mutual information — the
    phrase-mining statistic behind tokenizer merge rules and
    word2vec-style phrase detection (public: Mikolov et al. phrases).

    PMI(w1,w2) = ln( c12 · N / (left(w1) · right(w2)) ) over adjacent
    token pairs, with a min-count floor to kill noise pairs.

    Determinism: ranking uses the ROUNDED 4dp PMI with the bigram as
    tie-break, so cross-engine ulp skew cannot reorder the list; the
    selection is orderBy().limit() → TakeOrderedAndProject. Shape: the
    same narrow bigram build + count tables as bigram_logprob; the
    left/right marginals roll up from the count table, not the corpus,
    and the repeated cnt subtree dedups at runtime via AQE stage
    reuse (verified r15; a window-sum reformulation measured 1.5x
    slower at sf1 and was reverted).
    """
    toks = F.filter(tokens_col(), lambda t: t != F.lit(""))
    base = docs.select(toks.alias("ts")).filter(F.size("ts") >= 2)
    heads = F.slice("ts", 1, F.size("ts") - 1)
    tails = F.slice("ts", 2, F.size("ts") - 1)
    bgs = F.zip_with(heads, tails, lambda a, b: F.concat_ws(" ", a, b))
    cnt = (
        base.select(F.explode(bgs).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("c12"))
    )
    left = (
        cnt.withColumn("w1", F.substring_index("bg", " ", 1))
        .groupBy("w1")
        .agg(F.sum("c12").alias("cl"))
    )
    right = (
        cnt.withColumn("w2", F.substring_index("bg", " ", -1))
        .groupBy("w2")
        .agg(F.sum("c12").alias("cr"))
    )
    tot = cnt.agg(F.sum("c12").alias("n_total"))
    j = (
        cnt.filter(F.col("c12") >= min_count)
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .withColumn("w2", F.substring_index("bg", " ", -1))
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
    )
    pmi = F.log(
        F.col("c12").cast("double")
        * F.col("n_total").cast("double")
        / (F.col("cl").cast("double") * F.col("cr").cast("double"))
    )
    scored = j.select(
        "bg",
        "c12",
        (F.floor(pmi * 10000.0 + F.lit(0.5)) / 10000.0).alias("pmi"),
    )
    top = scored.orderBy(F.desc("pmi"), F.asc("bg")).limit(top_k)
    w = Window.orderBy(F.desc("pmi"), F.asc("bg"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "bg", "c12", "pmi"
    )


def kn_bigram_logprob(docs: DataFrame, discount: float = 0.75) -> DataFrame:
    """Interpolated Kneser-Ney bigram score per document — the
    standard smoothed n-gram LM (Kneser & Ney 1995; the KenLM
    default) one step up from the unsmoothed bigram lane:

      p(w2|w1) = (c(w1w2) − D)/ctx(w1)
                 + (D·N1+(w1,·)/ctx(w1)) · (N1+(·,w2)/B)

    with discount D, N1+(w1,·) = distinct continuations of w1,
    N1+(·,w2) = distinct left-contexts of w2 (the continuation
    probability — the part that makes KN rank "Francisco" low even
    though "San Francisco" is frequent), and B = distinct bigram
    types. Every in-corpus bigram has c ≥ 1 > D, so the discounted
    term stays positive and the score is well-defined.

    Shape at 100 TB: identical to bigram_logprob plus two more
    aggregates DERIVED FROM THE COUNT TABLE (not the corpus): the
    forward/backward type counts group the bigram-count rows by
    head/tail token. Everything joins by bigram/token hash keys with
    no broadcast assumption; B is a broadcast 1-row aggregate; the
    per-doc fold is sorted and engine-exact, 4dp floor. The repeated
    tf/cnt subtrees dedup at runtime via AQE stage reuse (verified
    r15; a window-sum reformulation measured 1.4-1.5x SLOWER at
    sf0.1/sf1 and was reverted — string-key window sorts cost more
    than the reused hash-agg branches).
    """
    toks = F.filter(tokens_col(), lambda t: t != F.lit(""))
    base = docs.select("doc_id", toks.alias("ts")).filter(F.size("ts") >= 2)
    heads = F.slice("ts", 1, F.size("ts") - 1)
    tails = F.slice("ts", 2, F.size("ts") - 1)
    bgs = F.zip_with(heads, tails, lambda a, b: F.concat_ws(" ", a, b))
    bg = base.select("doc_id", F.explode(bgs).alias("bg"))
    tf = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("tf"))
    cnt = tf.groupBy("bg").agg(F.sum("tf").alias("cnt"))
    ctx = (
        cnt.withColumn("w1", F.substring_index("bg", " ", 1))
        .groupBy("w1")
        .agg(F.sum("cnt").alias("ctx"), F.count("*").alias("n1f"))
    )
    bwd = (
        cnt.withColumn("w2", F.substring_index("bg", " ", -1))
        .groupBy("w2")
        .agg(F.count("*").alias("n1b"))
    )
    btypes = cnt.agg(F.count("*").alias("b_types"))
    per_doc = (
        tf.join(cnt, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .withColumn("w2", F.substring_index("bg", " ", -1))
        .join(ctx, "w1")
        .join(bwd, "w2")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("bg", "tf", "cnt", "ctx", "n1f", "n1b")
                )
            ).alias("bs")
        )
        .crossJoin(F.broadcast(btypes))
    )
    d = F.lit(discount)
    b_tot = F.col("b_types").cast("double")

    def p_kn(s):
        return (s["cnt"].cast("double") - d) / s["ctx"].cast("double") + (
            (d * s["n1f"].cast("double")) / s["ctx"].cast("double")
        ) * (s["n1b"].cast("double") / b_tot)

    n_bg = F.aggregate("bs", F.lit(0).cast("long"), lambda a, s: a + s["tf"])
    logsum = F.aggregate(
        "bs",
        F.lit(0.0),
        lambda a, s: a + s["tf"].cast("double") * (-F.log2(p_kn(s))),
    )
    return per_doc.select(
        "doc_id",
        n_bg.alias("n_bigrams"),
        (F.floor(logsum / n_bg.cast("double") * 10000.0 + F.lit(0.5)) / 10000.0).alias(
            "neg_log2p_kn"
        ),
    )


def bpe_train(docs: DataFrame, n_merges: int = 5) -> DataFrame:
    """Train a BPE tokenizer: learn the `n_merges` highest-count merge
    rules over the corpus (rank, left, right, n at merge time) — the
    full iterative algorithm, not just one pair-count pass
    (ext_text_bpe_pairs is iteration one's statistic).

    Scale shape is the one every industrial BPE trainer uses: merges
    act WITHIN words, so after one corpus-wide shuffle to the
    word-frequency table every iteration runs over the vocab-sized
    frame only — a pair-count aggregate (map-side combined, output
    bounded by symbol-vocab²) plus a per-word merge projection.
    Per-iteration driver traffic is ONE row (the winning pair), the
    same bounded pattern as Lloyd centroids; lineage is truncated per
    round with localCheckpoint like the pagerank loop.

    Words are held as marker-wrapped symbol strings
    (``\\x02sym\\x03`` concatenated), so applying a merge is a plain
    left-to-right ``replace`` of ``\\x02l\\x03\\x02r\\x03`` with
    ``\\x02lr\\x03`` — markers make cross-symbol false matches
    impossible and the same replace runs verbatim in the DuckDB
    oracle. Ties break on (count desc, left asc, right asc) so the
    learned table is engine-exact. Greedy-left non-overlapping
    replacement matches the reference BPE trainer's merge semantics
    ("a a a" + (a,a) -> "aa a").
    """
    spark = docs.sparkSession
    words = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != F.lit(""))
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("wc"))
    )
    wrap = F.expr(
        "concat_ws('', transform(sequence(1, length(tok)), "
        "i -> concat('\x02', substring(tok, i, 1), '\x03')))"
    )
    cur = words.select(wrap.alias("ws"), "wc").localCheckpoint()
    syms = F.expr(
        "split(substring(ws, 2, length(ws) - 2), '\x03\x02', -1)"
    )
    merges = []
    for k in range(n_merges):
        pairs = (
            cur.select(F.col("wc"), syms.alias("s"))
            .where(F.size("s") >= 2)
            .select(
                "wc",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1), "
                        "i -> struct(s[i-1] AS l, s[i] AS r))"
                    )
                ).alias("p"),
            )
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .first()
        )
        if top is None:
            break
        merges.append((k + 1, top["l"], top["r"], int(top["n"])))
        pat = "\x02" + top["l"] + "\x03\x02" + top["r"] + "\x03"
        rep = "\x02" + top["l"] + top["r"] + "\x03"
        cur = cur.select(
            F.replace(F.col("ws"), F.lit(pat), F.lit(rep)).alias("ws"), "wc"
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, n bigint"
    )


def bpe_encode(docs: DataFrame, merges: DataFrame | None = None,
               n_merges: int = 5) -> DataFrame:
    """Apply a learned BPE merge table: per-document token counts
    under the trained tokenizer (doc_id, n_words, n_bpe, chars_per_bpe)
    — the statistic that decides packing/budgeting downstream.

    Encoding never touches the corpus per merge: the merge chain is
    applied to the WORD table (vocab-sized, same marker-wrapped
    replaces as bpe_train, driver traffic = the n_merges learned pairs
    — bounded like broadcast literals), giving each distinct word its
    encoded length; documents then join word->length and aggregate.
    The join is vocab-vs-corpus — AQE broadcasts the encoded vocab at
    any realistic vocabulary size.
    """
    if merges is None:
        merges = bpe_train(docs, n_merges=n_merges)
    rules = [(r["lhs"], r["rhs"]) for r in merges.orderBy("rank").collect()]
    words = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != F.lit(""))
            ).alias("tok")
        )
        .distinct()
    )
    ws = F.expr(
        "concat_ws('', transform(sequence(1, length(tok)), "
        "i -> concat('\x02', substring(tok, i, 1), '\x03')))"
    )
    for l, r in rules:
        ws = F.replace(
            ws,
            F.lit("\x02" + l + "\x03\x02" + r + "\x03"),
            F.lit("\x02" + l + r + "\x03"),
        )
    # encoded length = number of symbol markers left
    enc = words.select(
        "tok",
        F.size(F.split(ws, "\x03\x02", -1)).alias("n_sym"),
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        ).alias("tok"),
    )
    return (
        toks.join(enc, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").alias("n_bpe"),
            round4(
                F.sum(F.length("tok")) / F.sum("n_sym")
            ).alias("chars_per_bpe"),
        )
    )
