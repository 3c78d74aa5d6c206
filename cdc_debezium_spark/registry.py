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
_PRIORITY_BUILT_FROM = 12

# Keys whose registered implementation changed materially AFTER their
# last driver sample — the prior CORRECTNESS rows attest retired code,
# so the rotation (and the staleness guard) treats them as
# never-sampled until the driver re-checks them. r13: the r12
# `_neg_cosine_matrix` retile's consumer lanes were never in the r12
# driver sample (r12 verdict item 3 names them), and this round moved
# every batch embedding-verify onto the shared two-phase exact-fold
# kernel (`_two_phase_cosine`) and switched the latest-state gate
# lane's compaction policy from ratio to cadence (verdict item 6).
_RESAMPLE_FORCED = {
    # r12 kernel retile, no driver row since (last samples r7-r10)
    "ext_dedup_embedding_ann",
    "ext_dedup_embedding_ann_trained",
    "ext_similarity_ivf_trained",
    "ext_similarity_ivf_prod",
    "ext_similarity_ivfpq",
    "ext_dedup_semantic",
    # r13 two-phase verify unification + compaction-policy change
    "ext_dedup_embedding_blocked",
    "ext_stream_dedup_embedding_roundtrip",
    "cdc_stream_latest_state_roundtrip",
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
# Round-13 layout (from CORRECTNESS_r01..r12): the never-sampled
# block leads — the nine _RESAMPLE_FORCED keys (kernel/verify/policy
# code changed after their last samples) — then the 5-key r6 cold
# cohort (7 rounds without a driver row; r12's budget stopped just
# short of them), then the r7 cohort minus its two forced members
# (39 keys), hot-tier (executed sink protocols, stream roundtrips)
# first and the three recall diagnostics last. A 50-key driver budget
# (9 forced + 5 r6 + 36 r7) retires everything except those three
# diagnostics, which lead the r14 rebuild with the r8 cohort.
_PRIORITY = [
    # --- never driver-sampled under the current implementation
    #     (_RESAMPLE_FORCED — see above) ---
    "ext_dedup_embedding_ann",
    "ext_dedup_embedding_ann_trained",
    "ext_similarity_ivf_trained",
    "ext_similarity_ivf_prod",
    "ext_similarity_ivfpq",
    "ext_dedup_semantic",
    "ext_dedup_embedding_blocked",
    "ext_stream_dedup_embedding_roundtrip",
    "cdc_stream_latest_state_roundtrip",
    # --- r6 cold cohort (5): last driver row in CORRECTNESS_r06,
    #     7 rounds stale — the oldest debt on the books ---
    "ext_cluster_profile",
    "ext_dedup_graph_degree",
    "ext_dedup_minhash_recall",
    "ext_dedup_simhash_pairs",
    "ext_dedup_spans",
    # --- r7 cohort (39 = 41 minus the two forced members),
    #     hot-tier (executed sink protocols, stream roundtrips)
    #     first; the three recall diagnostics close the list so a
    #     50-key budget cut falls on them ---
    "cdc_es_bulk_roundtrip",
    "cdc_clickhouse_replacing_roundtrip",
    "cdc_redis_latest_kv_roundtrip",
    "cdc_schema_evolution_roundtrip",
    "agg_session_window_stream_roundtrip",
    "events_stream_progress_audit",
    "agg_count_min_sketch",
    "agg_hll_sketch",
    "agg_kmv_distinct",
    "agg_quantile_sampled",
    "ext_embedding_quantize",
    "ext_multimodal_frames",
    "ext_multimodal_patches",
    "ext_sample_cluster_balanced",
    "ext_sample_hash",
    "ext_sample_mixture",
    "ext_sample_stratified",
    "ext_similarity_ivf",
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
    "join_bloom_prefilter",
    "json_map_explode",
    "type_coercion",
    "window_distribution",
    "ext_similarity_ivf_recall",
    "ext_similarity_ivfpq_recall",
    "ext_similarity_rp_lsh_recall",
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
