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
_PRIORITY_BUILT_FROM = 10

# Keys whose registered implementation changed materially AFTER their
# last driver sample — the prior CORRECTNESS rows attest retired code,
# so the rotation (and the staleness guard) treats them as
# never-sampled until the driver re-checks them. r11: the
# EventTimeTimeout lane's oracle moved to the stream's ms-granularity
# firing rule, the ngram/containment pack expression grew the
# overflow guard, and the three remaining state-collect gate lanes
# converged on the scratch-dir + lazy-reader materialization
# (r10 verdict item 4).
_RESAMPLE_FORCED = {
    "udf_session_timeout_roundtrip",
    "ext_dedup_ngram",
    "ext_dedup_containment",
    "cdc_stream_latest_state_roundtrip",
    "cdc_checkpoint_resume_roundtrip",
    "cdc_stream_latest_state_cow_roundtrip",
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
# Round-11 layout (from CORRECTNESS_r01..r10): the never-sampled
# block leads — the new cdc_webhook_fanout_roundtrip plus the six
# _RESAMPLE_FORCED keys (code/oracle changed this round after
# their r10 samples) — then the FULL 35-key r5-stale cohort the r10
# verdict named (6 rounds without a driver row) ordered
# hot-tier-first, then enough of the r6 cohort (hot-tier first:
# executed-protocol + streaming-agg + bench-headline lanes) to fill a
# 50-key driver budget. Target after this round: max driver staleness
# <= r6, i.e. the entire r5 cohort retired.
_PRIORITY = [
    # --- never driver-sampled under the current implementation ---
    "join_skew_salted_hot",  # new in r11 (targeted hot-key salting)
    "ext_stream_dedup_minhash_roundtrip",  # new in r11 (streaming ingest dedup)
    "ext_stream_dedup_embedding_roundtrip",  # new in r11 (streaming ANN ingest)
    "cdc_webhook_fanout_roundtrip",  # new in r11
    "udf_session_timeout_roundtrip",
    "ext_dedup_ngram",
    "ext_dedup_containment",
    "cdc_stream_latest_state_roundtrip",
    "cdc_checkpoint_resume_roundtrip",
    "cdc_stream_latest_state_cow_roundtrip",
    # --- r5-stale cohort (35): last driver row in CORRECTNESS_r05,
    #     hot-tier (CDC spine, sketch-prod, bench-headline) first ---
    "cdc_table_changes",
    "cdc_gdpr_erasure",
    "cdc_referential_audit",
    "join_inner",
    "join_broadcast",
    "agg_groupby",
    "agg_rollup",
    "window_rank",
    "window_running",
    "topk_per_group",
    "udf_grouped_processor",
    "agg_approx_quantile_prod",
    "agg_cms_partial_merge",
    "agg_hll_partial_merge",
    "agg_theta_sketch_prod",
    "agg_mode",
    "agg_string_agg",
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
    # --- r6 cohort, hot-tier first: these 9 fill the 50-key budget ---
    "avro_registry_roundtrip",
    "cdc_connect_config_pipeline",
    "cdc_pipeline_metrics",
    "agg_tumbling_window",
    "agg_session_window",
    "agg_sliding_window",
    "sql_pricing_summary",
    "ext_dedup_minhash",
    "ext_similarity_rp_lsh",
    # --- r6 cohort continues (outside a 50-key budget; they lead the
    #     r12 rebuild if the driver doesn't sample deeper) ---
    "doc_nested_roundtrip",
    "events_lateness_audit",
    "agg_approx_distinct",
    "agg_cube",
    "agg_distinct",
    "agg_stats",
    "explode_array",
    "ext_cluster_profile",
    "ext_corpus_clean",
    "ext_decontaminate",
    "ext_dedup_canonical",
    "ext_dedup_clusters",
    "ext_dedup_embedding",
    "ext_dedup_embedding_blocked",
    "ext_dedup_exact",
    "ext_dedup_graph_degree",
    "ext_dedup_minhash_incremental",
    "ext_dedup_minhash_recall",
    "ext_dedup_simhash",
    "ext_dedup_simhash_pairs",
    "ext_dedup_spans",
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
    "udf_cogroup_processor",
    "udtf_tokenize",
    "window_lag_lead",
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
