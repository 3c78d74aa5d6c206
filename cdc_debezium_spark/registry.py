"""Query registry: the driver-contract surface.

Every implemented operator from SURVEY.md §2 registers here as
  key -> (spark, sf_dir) -> DataFrame          (QUERIES)
  key -> ANSI SQL string for the DuckDB oracle (ORACLES)

Column names are aliased identically on both sides — the driver's
compare sorts columns by name then value-hashes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None):
    """Register a driver-visible query (and its DuckDB oracle)."""

    def deco(fn):
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


# Round whose committed CORRECTNESS files informed the current
# _PRIORITY layout. tests/test_registry_staleness.py recomputes the
# staleness cohorts from CORRECTNESS_r01.._PRIORITY_BUILT_FROM and
# fails if the layout stops leading with the oldest debt, or if this
# marker falls >1 round behind the newest committed file (the rebuild
# ratchet).
_PRIORITY_BUILT_FROM = 8

# Key-tiering policy (staleness is a policy, not an accident):
#   hot  — CDC spine, streaming-runtime roundtrips, executed sink
#          protocols: must have a driver row every 1-2 rounds; when not
#          leading _PRIORITY they still enter via the non-ext tail.
#   warm — operator families (relational/scalar/events/ext dedup+sim):
#          rotate so no key exceeds ~3 rounds without a driver row.
#   cold — mature diagnostics/recall reports: allow up to 5 rounds,
#          backed each round by the committed full-registry sf0.01
#          mirror (SURVEY §7.7g).
# tests/test_registry_staleness.py recomputes staleness from the
# committed CORRECTNESS_r0*.json files and enforces the rotation:
# _PRIORITY must lead with every never-sampled key, then the stalest
# cohort, so any count-budgeted driver prefix retires the oldest debt.
#
# Round-9 layout (from CORRECTNESS_r01..r08): new round-9 keys lead
# (never driver-sampled — the breadth guard requires them in the lead
# block), then the 24-key r3-stale residue the r8 verdict named
# ("What's wrong" #1), then the full 50-key r4 cohort ordered so the
# TPC-H flagships (q1/q7/q8/q9) and sink/SMT spine fall inside a
# 50-key driver budget (new + 24 + ~25). The r5/r6/r7/r8 cohorts
# follow via load_all()'s tail ordering. Target after this round:
# max driver staleness <= r5 across all 274+ keys.
_PRIORITY = [
    # --- never driver-sampled (new in round 9) ---
    "avro_schema_evolution_roundtrip",
    "cdc_scd2_stream_delta_roundtrip",
    "cdc_stream_latest_state_delta_roundtrip",
    "ext_dedup_embedding_ann_trained",
    # --- r3-stale residue (24): last driver row in CORRECTNESS_r03 ---
    "tpch_q4",
    "tpch_q22",
    "agg_approx_quantile",
    "agg_approx_topk",
    "agg_theta_sketch_distinct",
    "cdc_compaction_stats",
    "cdc_schema_drift_stats",
    "cdc_snapshot_diff",
    "events_active_sessions_sweep",
    "events_cohort_retention",
    "events_funnel",
    "events_gapfill_locf",
    "events_ohlc_downsample",
    "events_rate_anomaly",
    "events_rolling_active_users",
    "ext_corpus_pipeline",
    "ext_dedup_containment",
    "ext_embedding_pq",
    "ext_multimodal_shards",
    "ext_sample_importance",
    "ext_similarity_ivfpq",
    "ext_text_bpe_pairs",
    "ext_text_chunk_dedup",
    "ext_text_dedup_report",
    # --- r4 cohort (50): flagships first so they make the budget cut ---
    "tpch_q1",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "avro_roundtrip",
    "cdc_outbox_router",
    "cdc_incremental_snapshot",
    "cdc_mask_columns",
    "cdc_order_audit",
    "cdc_transaction_metadata",
    "cdc_dlq_split",
    "join_skew_salted",
    "join_shuffle_hash",
    "agg_percentiles_exact",
    "agg_argminmax",
    "agg_histogram",
    "agg_weighted",
    "window_ntile",
    "scalar_bitwise",
    "layout_zorder",
    "ext_dedup_exact_normalized",
    "ext_dedup_embedding_ann",
    "ext_similarity_ivf_prod",
    "ext_pack_sequences_sharded",
    "ext_retrieval_bm25",
    # --- r4 cohort continues (outside a 50-key budget, retired if the
    #     driver samples deeper; otherwise they lead round 10) ---
    "events_distribution_drift",
    "events_metric_correlation",
    "events_series_sax",
    "events_series_similarity",
    "events_transition_matrix",
    "events_user_lifetime",
    "ext_dedup_cluster_sizes",
    "ext_dedup_levenshtein",
    "ext_mixture_token_budget",
    "ext_multimodal_audio_stats",
    "ext_multimodal_features",
    "ext_multimodal_real_header",
    "ext_multimodal_resize",
    "ext_multimodal_scan",
    "ext_multimodal_video_frames",
    "ext_pack_length_buckets",
    "ext_pack_sequences",
    "ext_quality_classifier",
    "ext_retrieval_fusion",
    "ext_sample_topk_hash",
    "ext_source_quality_prior",
    "ext_text_bigram_logprob",
    "ext_text_collocations",
    "ext_text_oov_rate",
    "ext_text_unigram_logprob",
]


def load_all() -> None:
    """Import every query module, then order the registry so any
    count- or time-budgeted prefix the driver checks covers the keys
    that most need an external signal this round (see _PRIORITY)."""
    from . import queries_ext  # noqa: F401
    from . import queries_cdc  # noqa: F401
    from . import queries_events  # noqa: F401
    from . import queries_relational  # noqa: F401
    from . import queries_scalar  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_tpch  # noqa: F401

    # bench-flagship TPC-H shapes first within the block, so any
    # count-budgeted cut falls on the least load-bearing keys
    tpch_pref = ["tpch_q3", "tpch_q5", "tpch_q10", "tpch_q18", "tpch_q6"]
    tpch = [k for k in tpch_pref if k in QUERIES] + sorted(
        k for k in QUERIES if k.startswith("tpch_") and k not in tpch_pref
    )
    order = (
        [k for k in _PRIORITY if k in QUERIES]
        + [k for k in tpch if k not in _PRIORITY]
        + [k for k in QUERIES if k.startswith("ext_") and k not in _PRIORITY]
        + [
            k
            for k in QUERIES
            if not k.startswith(("ext_", "tpch_")) and k not in _PRIORITY
        ]
    )
    for d in (QUERIES, ORACLES):
        ordered = {k: d[k] for k in order if k in d}
        d.clear()
        d.update(ordered)
