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


# Must-check-first order for a count-budgeted driver sample. Round-4
# layout (per the r3 verdict's "Next round" #1): tpch_q7/q8/q9 are the
# ONLY keys with no driver row in any round — they lead, followed by
# any new r4 keys, then keys whose plans changed this round and so need
# a fresh external sample; the long-green keys from r1-r3 follow via
# load_all()'s ordering.
_PRIORITY = [
    # never driver-sampled in r1-r3 (locally oracle-green) — sample first
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    # new r4 keys with no driver row yet
    "events_user_lifetime",
    "tpch_q1",
    "agg_argminmax",
    "agg_weighted",
    "window_ntile",
    "ext_dedup_cluster_sizes",
    "ext_pack_length_buckets",
    "ext_text_collocations",
    "events_series_sax",
    "events_distribution_drift",
    "events_series_similarity",
    "ext_sample_topk_hash",
    "cdc_dlq_split",
    "join_shuffle_hash",
    "agg_percentiles_exact",
    "ext_dedup_exact_normalized",
    "scalar_bitwise",
    "cdc_order_audit",
    "ext_mixture_token_budget",
    "agg_histogram",
    "ext_retrieval_fusion",
    "ext_retrieval_bm25",
    "ext_source_quality_prior",
    "cdc_incremental_snapshot",
    "cdc_transaction_metadata",
    "cdc_outbox_router",
    "cdc_mask_columns",
    "ext_text_bigram_logprob",
    "ext_quality_classifier",
    "ext_multimodal_real_header",
    "avro_roundtrip",
    "ext_text_oov_rate",
    "events_metric_correlation",
    "events_transition_matrix",
    "join_skew_salted",
    "ext_multimodal_resize",
    "ext_multimodal_audio_stats",
    "ext_multimodal_video_frames",
    "layout_zorder",
    # plans changed in r4 (skew-guard single-pass rework) — resample
    "ext_dedup_embedding_ann",
    # r3 keys whose latest row is green but only sampled once
    "ext_pack_sequences",
    "ext_pack_sequences_sharded",
    "ext_multimodal_scan",
    "ext_multimodal_features",
    "ext_similarity_ivf_prod",
    "ext_text_unigram_logprob",
    "ext_dedup_levenshtein",
    "events_cohort_retention",
    "events_funnel",
    "agg_approx_quantile",
    "agg_approx_topk",
    "agg_theta_sketch_distinct",
    "cdc_agg_view",
    "cdc_schema_drift_stats",
    "cdc_snapshot_diff",
    "events_rate_anomaly",
    "ext_embedding_pq",
    "ext_similarity_ivfpq",
    "ext_text_bpe_pairs",
    "ext_dedup_containment",
    "ext_sample_importance",
    "udaf_grouped_agg",
    "ext_corpus_pipeline",
    "ext_text_dedup_report",
    "ext_multimodal_shards",
    "events_rolling_active_users",
    "agg_grouping_sets",
    "ext_text_chunk_dedup",
    "cdc_compaction_stats",
    "events_ohlc_downsample",
    "events_active_sessions_sweep",
    "events_gapfill_locf",
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
