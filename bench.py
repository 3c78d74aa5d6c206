#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "headline_suite_wall", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is materialized with the noop sink (full execution on
executors, zero driver collect) so the timing measures the Spark plan,
not result transfer.

Load robustness (judge r6 item 3): the recorded steady number is the
MEDIAN OF 3 steady passes (after one untimed-ly separate cold pass,
kept as `queries_cold`), and the 1-minute load average is recorded at
start and end — BENCH_r06 carried a 4.7x phantom regression on an
untouched code path because a single pass ran under load.

Suite split (judge r8 item 2): HEADLINE is production lanes only;
dual-pipeline recall/truth lanes live in DIAGNOSTICS, timed with the
same protocol but emitted as a separate `diagnostics` section of
bench_detail.json and excluded from headline_suite_wall.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cdc_debezium_spark import registry  # noqa: E402
from cdc_debezium_spark.session import get_spark  # noqa: E402

# Headline set: the CDC spine plus the heaviest relational/extension
# operators — the ones whose plans must survive a 100 TB scale-up.
HEADLINE = [
    "cdc_latest_state",      # B6  window rn=1 materialization
    "cdc_scd2_history",      # B7  lead() interval audit
    "cdc_as_of_snapshot",    # B8  replay to a past instant
    "dedup_exact",           # C22 at-least-once absorption
    "join_large",            # C5  large x large sort-merge
    "join_as_of",            # C9  event-time as-of enrichment
    "agg_groupby",           # C11 hash agg w/ partial aggregation
    "agg_rollup",            # C13 multi-granularity DW agg
    "window_running",        # C17 frame aggregates
    "topk_per_group",        # C19 rank + filter
    "udf_grouped_processor", # §2.F applyInPandas processor
    "agg_sliding_window",    # E4  sliding event-time windows
    "ext_dedup_minhash",     # §2.G near-dup detection
    "ext_dedup_spans",       # §2.G substring-span dedup (linear shuffles)
    "ext_dedup_embedding_ann",  # §2.G IVF-bucketed near-dup (replaces
                                # the O(n²) blocked scan in the headline)
    "ext_similarity_topk",   # §2.G brute-force ANN baseline
    "ext_similarity_ivf_trained",  # §2.G k-means IVF ANN (trained cells)
    "ext_similarity_ivf_prod",     # §2.G production k-means lane (r3)
    "ext_embedding_pq",      # §2.G PQ encoding manifest (r3)
    "ext_text_stats",        # §2.G text quality/language analysis
    "ext_text_oov_rate",     # §2.G vocab coverage (broadcast over tokens, r4)
    "ext_text_bigram_logprob",  # §2.G bigram-LM perplexity proxy (r4)
    "ext_retrieval_bm25",    # §2.G lexical retrieval scoring (r4)
    "ext_multimodal_real_header",  # §2.G real PNG/WAV header decode (r4)
    "cdc_mysql_envelope",    # A2  full MySQL wire roundtrip (r5)
    "agg_approx_quantile_prod",  # sketch-only quantile plan (r5)
    "ext_text_kn_logprob",   # §2.G Kneser-Ney smoothed LM scoring (r5)
    "ext_eval_overlap_report",  # §2.G train/eval n-gram overlap (r5)
    "ext_similarity_rp_lsh",  # §2.G sign-random-projection LSH ANN (r6)
    "tpch_q5",               # flagship 6-table snowflake join
    "tpch_q6",               # flagship scan-filter-agg (I/O-bound shape)
    "tpch_q18",              # flagship HAVING semi-join
]

# Diagnostics suite (r8 verdict item 2): dual-pipeline truth/recall
# lanes run a detector AND an exact-truth leg AND the recall join —
# by design ~5x the production lane they grade, so keeping them in
# the headline buries real regressions in their noise. They are timed
# separately and emitted as a distinct section of bench_detail.json;
# they never count toward headline_suite_wall. Skip entirely with
# SPARK_GRAFT_DIAGNOSTICS=0 for fast iteration.
DIAGNOSTICS = [
    "ext_dedup_minhash_recall",   # LSH recall vs exact ngram truth (r6)
    "ext_similarity_ivf_recall",  # IVF recall vs exact brute truth (r7)
    "ext_similarity_rp_lsh_recall",  # RP-LSH recall vs exact truth (r6)
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _run_suite(spark, sf_dir: str, keys: list[str], tag: str):
    """cold pass + median-of-3 steady passes per key.

    Returns (timings, cold, spread, paid_pair_cache, paid_chunk_fixture).
    A key is marked in paid_pair_cache when one of its passes
    materialized the shared survivor-pair cache
    (queries_ext.PAIR_CACHE_EVENTS grew), and in paid_chunk_fixture
    when it materialized the shared streaming chunk fixture
    (replay.CHUNK_CACHE_EVENTS grew) — those medians include the
    shared cost and are not comparable with runs where another lane
    already paid it (r8 ADVICE; r9 ADVICE extended to both caches,
    matching sweep_scale.py)."""
    from cdc_debezium_spark import queries_ext
    from cdc_debezium_spark.streaming import replay

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread: dict[str, float] = {}
    paid: list[str] = []
    paid_chunk: list[str] = []
    for key in keys:
        fn = registry.QUERIES.get(key)
        if fn is None:
            continue
        # One cold run per query (JIT/codegen compile), then THREE
        # timed steady-state runs with caches cleared between; the
        # recorded number is the median, so one co-scheduled burst of
        # machine load can't fabricate a per-query regression.
        events_before = len(queries_ext.PAIR_CACHE_EVENTS)
        chunks_before = len(replay.CHUNK_CACHE_EVENTS)
        t0 = time.perf_counter()
        _materialize(fn(spark, sf_dir))
        cold[key] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        passes = []
        for _ in range(3):
            t0 = time.perf_counter()
            _materialize(fn(spark, sf_dir))
            passes.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        if len(queries_ext.PAIR_CACHE_EVENTS) > events_before:
            paid.append(key)
        if len(replay.CHUNK_CACHE_EVENTS) > chunks_before:
            paid_chunk.append(key)
        passes.sort()
        dt = round(passes[1], 3)
        timings[key] = dt
        spread[key] = round(passes[2] - passes[0], 3)
        print(
            f"# [{tag}] {key}: {dt:.3f}s median (min {passes[0]:.3f} "
            f"max {passes[2]:.3f} cold {cold[key]:.3f})",
            file=sys.stderr,
        )
    return timings, cold, spread, paid, paid_chunk


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark(app_name="cdc-debezium-spark-bench")
    registry.load_all()

    # JVM/codegen warmup outside the timed region.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    load_start = round(os.getloadavg()[0], 2)
    timings, cold, spread, paid, paid_chunk = _run_suite(
        spark, sf_dir, HEADLINE, "headline"
    )
    total = round(sum(timings.values()), 3)

    diag: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_DIAGNOSTICS", "1") != "0":
        d_t, d_c, d_s, d_p, d_pc = _run_suite(spark, sf_dir, DIAGNOSTICS, "diag")
        diag = {
            "queries": d_t,
            "queries_cold": d_c,
            "queries_spread": d_s,
            "paid_pair_cache": d_p,
            "paid_chunk_fixture": d_pc,
            "wall": round(sum(d_t.values()), 3),
        }

    # Emission contract (r7 verdict item 2): the driver captures only a
    # bounded TAIL of stdout, and BENCH_r07 lost its headline when the
    # single line (medians + cold + spread + loadavg x 34 queries)
    # outgrew that capture. The compact headline object is therefore
    # printed as the FINAL stdout line; the per-query cold/spread/load
    # detail goes to an EARLIER stdout line and to a committed detail
    # file (bench_detail.json) for the judge.
    detail = {
        "metric": "headline_suite_detail",
        "queries": timings,
        "queries_cold": cold,
        "queries_spread": spread,
        "paid_pair_cache": paid,
        "paid_chunk_fixture": paid_chunk,
        "diagnostics": diag,
        "loadavg_1m": {
            "start": load_start,
            "end": round(os.getloadavg()[0], 2),
        },
        "sf": sf,
    }
    cpus = os.environ.get(
        "SPARK_GRAFT_CPUS", str(spark.sparkContext.defaultParallelism)
    )
    detail["cpus"] = int(cpus)
    # r15 verdict item 3: each run also writes a per-core-count detail
    # file so the 8-core scaling leg no longer clobbers the 32-core
    # per-query medians (bench_detail.json stays the latest-run copy —
    # unchanged contract; this is additive only).
    for name in ("bench_detail.json", f"bench_detail_c{cpus}.json"):
        try:
            with open(os.path.join(_REPO, name), "w") as f:
                json.dump(detail, f, indent=1)
                f.write("\n")
        except OSError:
            pass  # read-only checkout: the stdout copy below still lands
    print(json.dumps(detail))
    # The FINAL line stays under ~200 bytes — r7's loss was a tail
    # capture of unknown (small) size, so even the 34-entry median map
    # (~1 KB) is a truncation risk. Medians live in the detail file
    # (committed) and the detail stdout line above.
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries_n": len(timings),
                "detail": "bench_detail.json",
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
