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
_PRIORITY_BUILT_FROM = 9

# Keys whose registered implementation changed materially AFTER their
# last driver sample — the prior CORRECTNESS rows attest retired code,
# so the rotation (and the staleness guard) treats them as
# never-sampled until the driver re-checks them. r10: the streaming
# production lanes swapped from copy-on-write to the merge-on-read
# sinks (r9 verdict item 1), and the ngram/containment candidate
# phase was restructured for decade-scale shuffle mass (packed
# doc-stats carried through the self-join; r9 verdict item 4).
_RESAMPLE_FORCED = {
    "cdc_stream_latest_state_roundtrip",
    "cdc_scd2_stream_roundtrip",
    "ext_dedup_ngram",
    "ext_dedup_containment",
}

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
# Round-10 layout (from CORRECTNESS_r01..r09): never-driver-sampled
# keys lead — the two renamed copy-on-write diagnostics plus the two
# canonical streaming lanes whose implementation swapped to the
# merge-on-read sinks this round (_RESAMPLE_FORCED: their r7 rows
# attest the retired copy-on-write code). Then the full 28-key
# r4-stale cohort the r9 verdict named (5 rounds without a driver
# row), then the r5 cohort ordered hot-tier-first (CDC spine, wire
# envelopes, bench-headline lanes) so a 50-key driver budget covers
# lead + r4 + the hottest ~18 of r5. Target after this round: max
# driver staleness <= r6 across all keys.
_PRIORITY = [
    # --- never driver-sampled under the current implementation ---
    "udf_session_timeout_roundtrip",
    "cdc_stream_latest_state_cow_roundtrip",
    "cdc_scd2_stream_cow_roundtrip",
    "cdc_stream_latest_state_roundtrip",
    "cdc_scd2_stream_roundtrip",
    "ext_dedup_ngram",
    "ext_dedup_containment",
    # --- r4-stale cohort (28): last driver row in CORRECTNESS_r04 ---
    "ext_multimodal_scan",
    "ext_multimodal_features",
    "ext_multimodal_real_header",
    "ext_multimodal_resize",
    "ext_multimodal_audio_stats",
    "ext_multimodal_video_frames",
    "ext_similarity_ivf_prod",
    "ext_pack_sequences",
    "ext_pack_sequences_sharded",
    "ext_pack_length_buckets",
    "ext_mixture_token_budget",
    "ext_quality_classifier",
    "ext_retrieval_bm25",
    "ext_retrieval_fusion",
    "ext_sample_topk_hash",
    "ext_source_quality_prior",
    "ext_text_bigram_logprob",
    "ext_text_unigram_logprob",
    "ext_text_collocations",
    "ext_text_oov_rate",
    "ext_dedup_cluster_sizes",
    "ext_dedup_levenshtein",
    "events_distribution_drift",
    "events_metric_correlation",
    "events_series_sax",
    "events_series_similarity",
    "events_transition_matrix",
    "events_user_lifetime",
    # --- r5 cohort (50), hot-tier first: CDC spine + wire envelopes +
    #     bench-headline lanes make the 50-key budget cut ---
    "cdc_latest_state",
    "cdc_scd2_history",
    "cdc_as_of_snapshot",
    "cdc_unwrap",
    "cdc_delete_rewrite",
    "cdc_mysql_envelope",
    "cdc_mongo_envelope",
    "scan_events",
    "snapshot_union_stream",
    "filter_table_include",
    "json_roundtrip",
    "route_regex",
    "dedup_exact",
    "join_large",
    "join_as_of",
    "agg_groupby",
    "agg_rollup",
    "window_running",
    # --- r5 cohort continues (outside a 50-key budget; they lead the
    #     r11 rebuild if the driver doesn't sample deeper) ---
    "topk_per_group",
    "udf_grouped_processor",
    "window_rank",
    "join_inner",
    "join_broadcast",
    "agg_approx_quantile_prod",
    "agg_cms_partial_merge",
    "agg_hll_partial_merge",
    "agg_theta_sketch_prod",
    "agg_mode",
    "agg_string_agg",
    "cdc_gdpr_erasure",
    "cdc_referential_audit",
    "cdc_table_changes",
    "events_cusum",
    "events_ewma",
    "events_funnel_windowed",
    "events_gapfill_interp",
    "events_trend_ols",
    "ext_eval_overlap_report",
    "ext_graph_pagerank",
    "ext_multimodal_dhash",
    "ext_sample_dsir",
    "ext_similarity_mrl_rerank",
    "ext_text_bpe_encode",
    "ext_text_bpe_train",
    "ext_text_feature_hashing",
    "ext_text_kn_logprob",
    "join_interval_overlap",
    "scalar_interval",
    "scalar_url",
    "window_range_frame",
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
