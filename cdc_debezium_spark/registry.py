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
_PRIORITY_BUILT_FROM = 7

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
# Round-8 layout (from CORRECTNESS_r01..r07): 31 never-driver-sampled
# keys (all late-r7 batches) lead — the r7 verdict ask #1 — then the
# 43-key r3-stale cohort ordered so its verdict-named members and the
# flagship TPC-H shapes fall inside a 50-key budget (31 + 19). The
# r4/r5/r6/r7 cohorts follow via load_all()'s tail ordering.
_PRIORITY = [
    # --- never driver-sampled (31): must ALL get a CORRECTNESS_r08 row ---
    "agg_decimal_exact",
    "agg_theta_set_ops",
    "cdc_content_based_router",
    "cdc_header_enrich",
    "cdc_log_continuity_audit",
    "cdc_logical_table_router",
    "cdc_multi_table_pipeline",
    "cdc_partition_routing",
    "cdc_timezone_convert",
    "cdc_wire_size_audit",
    "events_assoc_rules",
    "events_burst_detection",
    "events_haar_energy",
    "events_holt_winters",
    "events_mad_outliers",
    "events_markov_stationary",
    "ext_dedup_winnowing",
    "ext_dq_expectations",
    "ext_graph_label_propagation",
    "ext_graph_triangles",
    "ext_privacy_k_anon",
    "ext_quality_nb_classifier",
    "ext_similarity_knn_hubness",
    "ext_text_lexical_richness",
    "ext_text_zipf_fit",
    "join_as_of_forward",
    "join_geo_cell",
    "scan_csv_roundtrip",
    "scan_jsonl_roundtrip",
    "scan_orc_roundtrip",
    "xml_wire_roundtrip",
    # --- r3-stale cohort (43): last driver row in CORRECTNESS_r03 ---
    "agg_grouping_sets",
    "udaf_grouped_agg",
    "cdc_agg_view",
    "tpch_q5",
    "tpch_q21",
    "tpch_q3",
    "tpch_q18",
    "tpch_q10",
    "tpch_q6",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q2",
    "tpch_q20",
    "tpch_q22",
    "tpch_q4",
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
