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


# Must-check-first order for a count-budgeted driver sample. Round-5
# layout (per the r4 verdict's "Next round" #2): every key's latest
# driver row is green, so staleness is the axis — 91 keys were last
# driver-sampled in r1/r2. New r5 keys (never externally sampled)
# lead, then the 47 keys whose last driver row is round 1 (flagship
# CDC kernels first), then the 44 round-2-stale keys; r3/r4-fresh keys
# follow via load_all()'s ordering.
_PRIORITY = [
    # new r5 keys — never driver-sampled
    "cdc_table_changes",
    "cdc_gdpr_erasure",
    "ext_text_bpe_train",
    "ext_text_bpe_encode",
    "join_interval_overlap",
    "agg_cms_partial_merge",
    "events_ewma",
    "events_cusum",
    "events_gapfill_interp",
    "cdc_referential_audit",
    "ext_similarity_mrl_rerank",
    "events_trend_ols",
    "agg_mode",
    "window_range_frame",
    "ext_text_feature_hashing",
    "agg_string_agg",
    "cdc_mysql_envelope",
    "cdc_mongo_envelope",
    "agg_theta_sketch_prod",
    "agg_approx_quantile_prod",
    "ext_eval_overlap_report",
    "ext_sample_dsir",
    "agg_hll_partial_merge",
    "ext_text_kn_logprob",
    "ext_graph_pagerank",
    "events_funnel_windowed",
    "scalar_url",
    "scalar_interval",
    "ext_multimodal_dhash",
    # last driver row: round 1 — flagship kernels first
    "cdc_latest_state",
    "cdc_unwrap",
    "cdc_delete_rewrite",
    "cdc_scd2_history",
    "cdc_as_of_snapshot",
    "dedup_exact",
    "agg_groupby",
    "agg_rollup",
    "join_inner",
    "join_broadcast",
    "join_large",
    "join_as_of",
    "window_rank",
    "window_running",
    "topk_per_group",
    "udf_grouped_processor",
    "scan_events",
    "snapshot_union_stream",
    "route_regex",
    "json_roundtrip",
    "filter_table_include",
    "agg_sliding_window",
    "agg_tumbling_window",
    "agg_session_window",
    "agg_distinct",
    "agg_stats",
    "explode_array",
    "filter_predicates",
    "join_outer",
    "join_range",
    "join_semi_anti",
    "pivot_status",
    "project_basic",
    "scalar_array_map",
    "scalar_conditional",
    "scalar_datetime",
    "scalar_hash",
    "scalar_json",
    "scalar_math",
    "scalar_string",
    "set_intersect_except",
    "set_union",
    "sort_orderby",
    "sql_pricing_summary",
    "udf_cogroup_processor",
    "udtf_tokenize",
    "window_lag_lead",
    # last driver row: round 2
    "agg_approx_distinct",
    "agg_cube",
    "cdc_pipeline_metrics",
    "doc_nested_roundtrip",
    "ext_cluster_profile",
    "ext_corpus_clean",
    "ext_decontaminate",
    "ext_dedup_canonical",
    "ext_dedup_clusters",
    "ext_dedup_embedding",
    "ext_dedup_embedding_blocked",
    "ext_dedup_exact",
    "ext_dedup_minhash",
    "ext_dedup_minhash_incremental",
    "ext_dedup_ngram",
    "ext_dedup_simhash",
    "ext_dedup_simhash_pairs",
    "ext_dedup_spans",
    "ext_embedding_quantize",
    "ext_multimodal_frames",
    "ext_multimodal_patches",
    "ext_sample_cluster_balanced",
    "ext_sample_hash",
    "ext_sample_mixture",
    "ext_sample_stratified",
    "ext_similarity_ivf",
    "ext_similarity_ivf_trained",
    "ext_similarity_range",
    "ext_similarity_topk",
    "ext_text_bpe_tokens",
    "ext_text_charngrams",
    "ext_text_chunks",
    "ext_text_entropy",
    "ext_text_fingerprint",
    "ext_text_langid",
    "ext_text_quality_rules",
    "ext_text_repetition",
    "ext_text_scrub",
    "ext_text_stats",
    "ext_text_tfidf",
    "ext_text_vocab",
    "json_map_explode",
    "type_coercion",
    "window_distribution",
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
