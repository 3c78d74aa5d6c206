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
_PRIORITY_BUILT_FROM = 11

# Keys whose registered implementation changed materially AFTER their
# last driver sample — the prior CORRECTNESS rows attest retired code,
# so the rotation (and the staleness guard) treats them as
# never-sampled until the driver re-checks them. r12: the eight
# memory-sink gate lanes converged on the scratch-dir + lazy-reader
# materialization (r11 verdict item 4), the streaming-ANN verify
# kernel moved to the shared bit-exact _neg_cosine_matrix
# accumulation, the minhash ingest fixture writer moved off the
# driver-side toPandas, and the two merge-on-read stream lanes
# switched to the size-threshold compaction policy (r11 verdict
# item 3).
_RESAMPLE_FORCED = {
    "cdc_stream_latest_state_roundtrip",
    "cdc_scd2_stream_roundtrip",
    "agg_tumbling_window_stream_roundtrip",
    "agg_sliding_window_stream_roundtrip",
    "join_stream_static_enrich_roundtrip",
    "join_stream_stream_roundtrip",
    "events_late_data_drop_roundtrip",
    "udf_stateful_processor_roundtrip",
    "udf_session_timeout_roundtrip",
    "ext_stream_dedup_minhash_roundtrip",
    "ext_stream_dedup_embedding_roundtrip",
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
# Round-12 layout (from CORRECTNESS_r01..r11): the never-sampled
# block leads — the eleven _RESAMPLE_FORCED keys (code changed this
# round after their r11/earlier samples) — then the FULL 44-key
# r6-stale cohort the r11 verdict named (6 rounds without a driver
# row), ordered hot-tier-first with the five cold diagnostics/recall
# lanes last so a 50-key driver budget (11 forced + 39 r6) retires
# everything except those five (they lead the r13 rebuild). The r7
# cohort follows as the continuation tail. Target after this round:
# r6 cohort reduced to <= 5 keys, all cold-tier.
_PRIORITY = [
    # --- never driver-sampled under the current implementation
    #     (_RESAMPLE_FORCED — see above) ---
    "cdc_stream_latest_state_roundtrip",
    "cdc_scd2_stream_roundtrip",
    "agg_tumbling_window_stream_roundtrip",
    "agg_sliding_window_stream_roundtrip",
    "join_stream_static_enrich_roundtrip",
    "join_stream_stream_roundtrip",
    "events_late_data_drop_roundtrip",
    "udf_stateful_processor_roundtrip",
    "udf_session_timeout_roundtrip",
    "ext_stream_dedup_minhash_roundtrip",
    "ext_stream_dedup_embedding_roundtrip",
    # --- r6-stale cohort (44): last driver row in CORRECTNESS_r06,
    #     hot-tier (bench-headline, streaming-agg, CDC-adjacent)
    #     first; these 39 fill the 50-key budget ---
    "sql_pricing_summary",
    "ext_dedup_minhash",
    "agg_sliding_window",
    "doc_nested_roundtrip",
    "events_lateness_audit",
    "udf_cogroup_processor",
    "udtf_tokenize",
    "agg_approx_distinct",
    "agg_cube",
    "agg_distinct",
    "agg_stats",
    "filter_predicates",
    "project_basic",
    "join_outer",
    "join_range",
    "join_semi_anti",
    "pivot_status",
    "explode_array",
    "set_intersect_except",
    "set_union",
    "sort_orderby",
    "window_lag_lead",
    "scalar_array_map",
    "scalar_conditional",
    "scalar_datetime",
    "scalar_hash",
    "scalar_json",
    "scalar_math",
    "scalar_string",
    "ext_corpus_clean",
    "ext_decontaminate",
    "ext_dedup_canonical",
    "ext_dedup_clusters",
    "ext_dedup_embedding",
    "ext_dedup_embedding_blocked",
    "ext_dedup_exact",
    "ext_dedup_minhash_incremental",
    "ext_dedup_simhash",
    "ext_similarity_rp_lsh",
    # --- r6 cold-tier diagnostics (outside a 50-key budget; they
    #     lead the r13 rebuild if the driver doesn't sample deeper) ---
    "ext_cluster_profile",
    "ext_dedup_graph_degree",
    "ext_dedup_minhash_recall",
    "ext_dedup_simhash_pairs",
    "ext_dedup_spans",
    # --- r7 cohort continuation, hot-tier (executed sink protocols,
    #     stream roundtrips) first ---
    "cdc_es_bulk_roundtrip",
    "cdc_clickhouse_replacing_roundtrip",
    "cdc_redis_latest_kv_roundtrip",
    "cdc_schema_evolution_roundtrip",
    "agg_session_window_stream_roundtrip",
    "events_stream_progress_audit",
    "join_bloom_prefilter",
    "json_map_explode",
    "type_coercion",
    "window_distribution",
    "agg_count_min_sketch",
    "agg_hll_sketch",
    "agg_kmv_distinct",
    "agg_quantile_sampled",
    "ext_dedup_semantic",
    "ext_embedding_quantize",
    "ext_multimodal_frames",
    "ext_multimodal_patches",
    "ext_sample_cluster_balanced",
    "ext_sample_hash",
    "ext_sample_mixture",
    "ext_sample_stratified",
    "ext_similarity_ivf",
    "ext_similarity_ivf_recall",
    "ext_similarity_ivf_trained",
    "ext_similarity_ivfpq_recall",
    "ext_similarity_range",
    "ext_similarity_rp_lsh_recall",
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
