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
_PRIORITY_BUILT_FROM = 14

# Keys whose registered implementation changed materially AFTER their
# last driver sample — the prior CORRECTNESS rows attest retired code,
# so the rotation (and the staleness guard) treats them as
# never-sampled until the driver re-checks them. The nine r13-forced
# keys were all re-sampled green in CORRECTNESS_r14 (verdict §2.G), so
# the set was empty at the r15 rebuild; the r15 OPTIMIZATION rewrites
# below changed these lanes' physical shape (results oracle-identical,
# verified at sf0.01+sf0.001; OPTIMIZATION_r15.md has the evidence):
_RESAMPLE_FORCED: set[str] = {
    # r15 text-family shape changes (window frequency counts, narrow
    # corpus stats, filter-pushdown split membership)
    "ext_retrieval_bm25",
    "ext_retrieval_fusion",
    "ext_text_chunk_dedup",
    "ext_sample_dsir",
    "ext_eval_overlap_report",
    # r15 embedding/LSH shape changes (brute pair scan → blocked
    # two-phase kernel; multi-table LSH candidate join → stacked
    # single join; sweep legs thread-overlapped)
    "ext_dedup_embedding",
    "ext_similarity_rp_lsh",
    "ext_similarity_rp_lsh_recall",
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
# Round-15 layout (from CORRECTNESS_r01..r14): no never-sampled keys
# (every registry key has a driver row and _RESAMPLE_FORCED cleared at
# the r14 re-samples). The oldest debt leads: the 3-key r7 cold
# cohort (recall diagnostics, 8 rounds without a driver row — the r14
# rotation slip the staleness ratchet caught), then the full 50-key r8
# cohort (6 rounds stale: the entire TPC-H suite, cdc_agg_view,
# udaf_grouped_agg, agg_grouping_sets, ...), hot-tier wire/CDC keys and
# the bench-flagship TPC-H shapes first so a 50-key budget cut falls on
# the three mature format-roundtrip scans at the tail. 3 + 50 = 53;
# a 50-key driver sample retires everything but those three scans,
# which lead the r16 rebuild with the r9 cohort.
_PRIORITY = [
    # --- treated as never-sampled: r15 optimization-round shape
    #     changes (_RESAMPLE_FORCED above) ---
    "ext_retrieval_bm25",
    "ext_retrieval_fusion",
    "ext_text_chunk_dedup",
    "ext_sample_dsir",
    "ext_eval_overlap_report",
    "ext_dedup_embedding",
    "ext_similarity_rp_lsh",
    "ext_similarity_rp_lsh_recall",
    # --- r7 cold cohort: last driver row in CORRECTNESS_r07
    #     (ext_similarity_rp_lsh_recall moved to the forced block
    #     above — its implementation changed this round) ---
    "ext_similarity_ivf_recall",
    "ext_similarity_ivfpq_recall",
    # --- r8 cohort (50), hot-tier CDC/wire keys first ---
    "cdc_multi_table_pipeline",
    "cdc_agg_view",
    "cdc_logical_table_router",
    "cdc_content_based_router",
    "cdc_header_enrich",
    "cdc_partition_routing",
    "cdc_timezone_convert",
    "cdc_wire_size_audit",
    "cdc_log_continuity_audit",
    "xml_wire_roundtrip",
    # bench-flagship TPC-H shapes next, then the rest of the suite
    "tpch_q5",
    "tpch_q6",
    "tpch_q18",
    "tpch_q3",
    "tpch_q10",
    "tpch_q2",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    # relational / scalar / events / ext remainder of the r8 cohort
    "udaf_grouped_agg",
    "agg_grouping_sets",
    "agg_decimal_exact",
    "agg_theta_set_ops",
    "join_as_of_forward",
    "join_geo_cell",
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
    # mature format-roundtrip scans close the list so a 50-key
    # budget cut falls here
    "scan_csv_roundtrip",
    "scan_jsonl_roundtrip",
    "scan_orc_roundtrip",
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
