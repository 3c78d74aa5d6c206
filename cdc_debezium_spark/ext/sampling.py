"""Corpus sampling & sequence packing for a training-data pipeline
(SURVEY.md §2.G extensions, round 2).

Two operators every LLM data pipeline runs at corpus scale:

  hash_sample    — deterministic held-out carving: a document belongs
                   to the p% sample iff hash(key) mod 100 < p. No
                   shuffle, no RNG state, embarrassingly parallel, and
                   STABLE: the same document lands on the same side of
                   the train/eval split on every run, every engine, and
                   every corpus size — the property random() sampling
                   can't give you. Uses the engine-agnostic word hash
                   so the DuckDB oracle reproduces membership exactly.

  pack_sequences — token-budget packing: documents in deterministic
                   doc_id order are laid end-to-end and cut into packs
                   of `budget` tokens (a document starts in the pack
                   where its first token falls). Pure integer window
                   cumsum — engine-exact. The global ORDER BY is one
                   sort at scale; a 100 TB run packs per shard instead
                   (pack key becomes (shard_id, local_pack)) — same
                   code with the window partitioned by shard, and no
                   global sort at all.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .hashing import word_hash
from .text import tokens_col


def hash_sample(docs: DataFrame, pct: int = 10) -> DataFrame:
    """The deterministic `pct`% sample of the corpus, by text hash."""
    return (
        docs.select("doc_id", word_hash(F.col("text")).alias("h"))
        .where(F.col("h") % 100 < pct)
        .select("doc_id", (F.col("h") % 100).alias("bucket"))
    )


def stratified_hash_sample(
    docs: DataFrame, rates: dict[str, int], default_pct: int = 10
) -> DataFrame:
    """Per-stratum deterministic sampling: language `lang` keeps
    `rates[lang]`% of its documents (hash-stable membership, as in
    hash_sample). The rate table rides a broadcast join — rebalancing a
    corpus mix (e.g. upsampling low-resource languages) without a
    shuffle of the corpus itself.
    """
    spark = docs.sparkSession
    rate_df = spark.createDataFrame(
        list(rates.items()), "lang string, pct int"
    )
    return (
        docs.select("doc_id", "lang", word_hash(F.col("text")).alias("h"))
        .join(F.broadcast(rate_df), "lang", "left")
        .where(F.col("h") % 100 < F.coalesce(F.col("pct"), F.lit(default_pct)))
        .select("doc_id", "lang", (F.col("h") % 100).alias("bucket"))
    )


def pack_sequences(
    docs: DataFrame, budget: int = 2048, n_shards: int | None = None
) -> DataFrame:
    """Assign each document to a token-budget pack; one row per pack.

    pack_id = floor(first_token_offset / budget) over doc_id order.
    Emits per-pack shape stats (doc count, token total, id range) —
    the manifest a downstream tokenizer shards on.

    ``n_shards`` switches to the scale formulation: documents shard by
    doc_id % n_shards and the cumsum window PARTITIONS by shard, so
    there is no global sort — each shard packs independently in
    parallel (pack key becomes (shard, pack_id)). The global default
    exists for exact single-sequence layouts and the oracle.
    """
    toks = docs.select("doc_id", F.size(tokens_col()).alias("n_tokens"))
    if n_shards is None:
        shard = F.lit(0)
    else:
        shard = F.col("doc_id") % n_shards
    toks = toks.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = toks.select(
        "doc_id",
        "n_tokens",
        "shard",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget
        ).alias("pack_id"),
    )
    out = (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
    if n_shards is None:
        return out.drop("shard")
    return out


def mixture_sample(
    docs: DataFrame, alpha: float = 0.5, budget_chars: int = 200_000
) -> DataFrame:
    """Temperature-weighted corpus mixing: sample each source at the
    rate that realizes a ``chars^alpha``-proportional mix inside a
    total character budget (alpha<1 upsamples small sources relative
    to their share — the standard multi-source LLM pretraining mix).

    rate_s = min(1, budget * (chars_s^alpha / Σ chars^alpha) / chars_s)

    Membership is the deterministic hash threshold (hash_sample's
    property: stable across runs, engines, corpus growth). The weight
    table is one tiny per-source aggregate; rates ride a broadcast
    join back onto the corpus — no corpus shuffle, no RNG state.

    Cross-engine determinism: per-source char sums are exact BIGINTs;
    the irrational ``pow`` output is rounded into DECIMAL(18,6) (1-ulp
    libm noise absorbed), the weight-sum is an exact decimal add, and
    the final rate is a fixed left-to-right double expression — so the
    DuckDB oracle reproduces membership bit-for-bit.
    """
    per_src = docs.groupBy("source").agg(
        F.sum("n_chars").cast("double").alias("chars")
    )
    w = per_src.select(
        "source",
        "chars",
        F.pow(F.col("chars"), F.lit(float(alpha))).cast("decimal(18,6)").alias("wt_dec"),
    )
    tot = w.agg(F.sum("wt_dec").alias("tot_dec"))
    rates = w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.lit(float(budget_chars))
            * (F.col("wt_dec").cast("double") / F.col("tot_dec").cast("double"))
            / F.col("chars"),
        ).alias("rate"),
    )
    return (
        docs.select("doc_id", "source", word_hash(F.col("text")).alias("h"))
        .join(F.broadcast(rates), "source")
        .where((F.col("h") % 10000) / F.lit(10000.0) < F.col("rate"))
        .select("doc_id", "source")
    )


def importance_sample(
    docs: DataFrame, base_bp: int = 2000, max_tokens: int = 100
) -> DataFrame:
    """Quality-weighted deterministic sampling: a document's keep
    probability scales with a quality weight (here token count capped
    at `max_tokens` — longer docs up to the cap are likelier kept),
    all in INTEGER basis points so membership is engine-exact.

    keep iff hash(text) % 10000 < base_bp * min(n_tokens, max_tokens)
                                   / max_tokens

    The importance-sampling primitive every curation pipeline needs
    (sample proportional to a score, deterministically): same
    hash-threshold shape as hash_sample — one narrow pass, membership
    stable under corpus growth, weights swap in per-doc without
    touching the mechanism. The threshold is integer arithmetic
    (bp * w // max_tokens), never a float rate.
    """
    w = F.least(
        F.size(F.filter(F.split("text", " "), lambda t: t != F.lit(""))),
        F.lit(max_tokens),
    )
    return (
        docs.select(
            "doc_id",
            word_hash(F.col("text")).alias("h"),
            w.alias("w"),
            F.expr(f"({base_bp} * least(size(filter(split(text, ' '), "
                   f"t -> t != '')), {max_tokens})) div {max_tokens}")
            .alias("thr"),
        )
        .where(F.col("h") % 10000 < F.col("thr"))
        .select("doc_id", "w", "thr", (F.col("h") % 10000).alias("bucket"))
    )


def mixture_token_budget(
    docs: DataFrame, alpha: float = 0.5, budget_frac: float = 0.5
) -> DataFrame:
    """α-temperature token-budget allocation per source — the
    multilingual-LM mixing rule (XLM-R / mT5, public): target share
    p_s ∝ T_s^α flattens the corpus distribution (α<1 upweights small
    sources), then a global token budget B = budget_frac·ΣT is split
    as B·p_s and converted to a per-source sampling rate capped at 1
    (no oversampling without repetition). Emits the allocation plan a
    mixture_sample run would execute.

    Shape at 100 TB: one source aggregate (map-side combine), a
    broadcast 1-row total, pure arithmetic — the documents are scanned
    once and never reshuffled. Determinism: the normalizer Σ T_s^α is
    a SORTED fold over the per-source list (hash-agg float-sum order
    is nondeterministic), and α=0.5 uses sqrt (correctly rounded IEEE,
    bit-identical cross-engine) instead of libm pow; 4dp floor.
    """
    powc = (
        (lambda c: F.sqrt(c)) if alpha == 0.5 else (lambda c: F.pow(c, F.lit(alpha)))
    )
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    tot = per.agg(
        F.sort_array(F.collect_list(F.struct("source", "n_tokens"))).alias("ss"),
        F.sum("n_tokens").alias("t_all"),
    )
    z = F.aggregate(
        "ss", F.lit(0.0), lambda a, s: a + powc(s["n_tokens"].cast("double"))
    )
    g = per.crossJoin(F.broadcast(tot.select(z.alias("z"), F.col("t_all"))))
    p = powc(F.col("n_tokens").cast("double")) / F.col("z")
    desired = F.lit(budget_frac) * F.col("t_all").cast("double") * p
    rate = F.least(F.lit(1.0), desired / F.col("n_tokens").cast("double"))
    r4 = lambda c: F.floor(c * 10000.0 + F.lit(0.5)) / 10000.0  # noqa: E731
    return g.select(
        "source",
        "n_docs",
        "n_tokens",
        r4(p).alias("target_share"),
        F.floor(desired).cast("long").alias("desired_tokens"),
        r4(rate).alias("sample_rate"),
    )


def dsir_weights(docs: DataFrame, target_lang: str = "en") -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023, arXiv:2302.03169 — public): score
    every document by how much more likely its tokens are under a
    TARGET distribution (here: the `target_lang` slice's unigram LM,
    add-one smoothed) than under the RAW corpus distribution; keep
    documents whose mean log ratio is non-negative. This is the
    published importance-resampling recipe for steering a pretraining
    mix toward a target domain using only n-gram statistics.

      log_ratio(d) = (Σ_t tf·(log2(cnt_t(t)+1) − log2(cnt_raw(t)))) / |d|
                     + log2(n_raw) − log2(n_target + V)

    Shape at 100 TB (r16, guide §2.5 skew): ONE corpus-scale exchange
    — the exploded token stream hash(doc_id)-repartitioned. That
    partitioning satisfies the (doc_id, tok) grouping's clustering
    requirement, so the tf aggregate needs no further exchange; tf is
    persisted (its two consumers prune different columns, so exchange
    reuse alone cannot deduplicate the corpus pass — same
    multi-consumer persist contract as dedup._capped_pair_counts);
    the raw/target count table is a partial-agged hash aggregate of
    the collapsed tf (a stop-word's rows collapse per partition
    before its tiny exchange) joined back on the token — broadcast
    while the vocabulary fits, AQE-skew-splittable shuffle join
    beyond. While broadcast, the probe keeps hash(doc_id), so the
    per-doc fold aggregate ALSO needs no exchange. The r15 shape
    computed the counts as WINDOW SUMS over the token partition: a
    window partition cannot be split and lands every tf row of a hot
    token in ONE task — at 100 TB a guaranteed single-task straggler
    on exactly the stop-word keys (r15 verdict item 1); 60 %-hot
    fixture A/B in OPTIMIZATION_r16.md (straggler task 11.6 s ->
    0.6 s), real-corpus sf1 4.5 -> 2.5 s. n_raw / n_t / vocab all
    come from ONE 1-row aggregate over the tiny count table — exactly
    the oracle's `tot` CTE, no extra corpus passes, and null-text
    rows contribute nothing (the r15 narrow per-row sums went through
    size(), whose legacy -1-on-NULL would have skewed the totals —
    r15 ADVICE). Per-doc scoring is a SORTED left-to-right fold over
    the doc's distinct tokens — engine-exact floats, 4dp floor.
    """
    ftoks = F.filter(tokens_col(), lambda t: t != F.lit(""))
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(ftoks).alias("tok"),
    ).repartition("doc_id")
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count("*").alias("tf"),
        F.max((F.col("lang") == target_lang).cast("int")).alias("is_t"),
    ).persist()
    cnt = tf.groupBy("tok").agg(
        F.sum("tf").alias("cnt_raw"),
        F.coalesce(
            F.sum(F.when(F.col("is_t") == 1, F.col("tf"))),
            F.lit(0).cast("long"),
        ).alias("cnt_t"),
    )
    counted = tf.join(cnt, "tok")
    totals = cnt.agg(
        F.sum("cnt_raw").cast("long").alias("n_raw"),
        F.sum("cnt_t").cast("long").alias("n_t"),
        F.count("*").alias("vocab"),
    )
    per_doc = (
        counted.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("tok", "tf", "cnt_t", "cnt_raw"))
            ).alias("ts")
        )
        .crossJoin(F.broadcast(totals))
    )
    n_tok = F.aggregate("ts", F.lit(0).cast("long"), lambda a, s: a + s["tf"])
    fold = F.aggregate(
        "ts",
        F.lit(0.0),
        lambda a, s: a
        + s["tf"].cast("double")
        * (
            F.log2(s["cnt_t"].cast("double") + 1.0)
            - F.log2(s["cnt_raw"].cast("double"))
        ),
    )
    ratio = (
        fold / n_tok.cast("double")
        + F.log2(F.col("n_raw").cast("double"))
        - F.log2(F.col("n_t").cast("double") + F.col("vocab").cast("double"))
    )
    r = F.floor(ratio * 10000.0 + 0.5) / 10000.0
    return per_doc.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        r.alias("log_ratio"),
        (r >= 0.0).alias("keep"),
    )
