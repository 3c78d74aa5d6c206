#!/usr/bin/env python
"""ANN family at realistic dimension (d=768) — removes the last
documented evidence ceiling (SCALE.md named ceiling #2: the d=64
fixture put the 0.4 cosine threshold at ~3.2σ of random-pair cosine,
so cross-copy tail pairs dominated every decade number; at d=768 the
threshold sits at ~11σ and the truth set is structural near-dups
only, like a real d≥512 corpus).

Three measurements, mirroring the r10 d=64 protocol so the two widths
are directly comparable:

1. RECALL CURVE at sf1_d768 (20k vectors): exact ground truth via
   blocked numpy (pairs with cosine ≥ 0.4), then
   embedding_near_dupes_ann over strided and trained centroids at
   nassign ∈ {1,2,4,8} — pairs, recall, within/cross-copy split, wall.
2. DECADE legs sf1_d768 → sf10_d768 for the batch ANN lanes
   (strided + trained) — wall, output pairs, within/cross split.
3. STREAMING-INGEST parity: the ext_stream_dedup_embedding_roundtrip
   twin at both tiers must reproduce the batch lane's pair set (the
   minhash twin's exact-count equivalence, now demonstrable for ANN
   because the cross-copy tail no longer swamps the drain).

Usage: python scripts/ann_d768.py [sf1_dir] [sf10_dir]
Output: one JSON document on stdout; progress on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cdc_debezium_spark import registry  # noqa: E402
from cdc_debezium_spark.ext import dedup, similarity  # noqa: E402
from cdc_debezium_spark.session import get_spark  # noqa: E402
from cdc_debezium_spark.sources.catalog import load_table  # noqa: E402

COPY_STRIDE = 2000  # base fixture rows; copy = vec_id // stride
THRESHOLD = 0.4


def _truth_pairs(emb_pd) -> tuple[int, int]:
    """Exact (within, cross) pair counts with cosine >= THRESHOLD via
    blocked matmul — ground truth, BLAS precision is ample at 11σ."""
    ids = emb_pd["vec_id"].to_numpy()
    M = np.stack(emb_pd["embedding"].to_numpy()).astype(np.float64)
    n = np.linalg.norm(M, axis=1)
    within = cross = 0
    B = 2048
    for i0 in range(0, len(M), B):
        a = slice(i0, min(i0 + B, len(M)))
        cos = (M[a] @ M.T) / np.outer(n[a], n)
        ia, ib = np.nonzero(cos >= THRESHOLD)
        keep = ids[a][ia] < ids[ib]  # unordered pairs once
        ca = ids[a][ia][keep] // COPY_STRIDE
        cb = ids[ib][keep] // COPY_STRIDE
        within += int((ca == cb).sum())
        cross += int((ca != cb).sum())
    return within, cross


def _split(pairs_df) -> dict:
    """within/cross copy split of a (vec_a, vec_b, ...) pair frame —
    computed Spark-side, only 2 rows reach the driver."""
    import pyspark.sql.functions as F

    rows = (
        pairs_df.groupBy(
            (
                (F.col("vec_a") / COPY_STRIDE).cast("long")
                == (F.col("vec_b") / COPY_STRIDE).cast("long")
            ).alias("within")
        )
        .count()
        .collect()
    )
    d = {bool(r["within"]): int(r["count"]) for r in rows}
    return {"within": d.get(True, 0), "cross": d.get(False, 0)}


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, "scale", "sf1_d768")
    sf10 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(_REPO, "scale", "sf10_d768")
    # one long session runs three k-means trainings plus ~14 ANN legs;
    # retained plan/execution metadata for the packed-literal centroid
    # plans (k x 768 literal doubles each) sits on the driver heap for
    # the session's life, and 8g OOMed once the decade warm moved the
    # big training ahead of the sf10 legs - give the rehearsal driver
    # the headroom a long-lived production driver would have
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(app_name="ann-d768")
    # the d768 tiers are single ~40-400 MB parquet files; the default
    # 128 MB split gives 1-4 scan tasks, serializing the Arrow
    # assignment kernel on a 32-core box. A real 100 TB corpus has
    # thousands of splits — match split count to cores here.
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 << 20))
    registry.load_all()

    out: dict = {"metric": "ann_d768", "dims": 768, "threshold": THRESHOLD}

    # --- 1. ground truth + recall curve at sf1 ---
    emb1 = load_table(spark, sf1, "embeddings")
    n1 = emb1.count()
    print(f"truth scan over {n1} vectors ...", file=sys.stderr)
    t0 = time.time()
    emb1_pd = emb1.select("vec_id", "embedding").toPandas()
    w, c = _truth_pairs(emb1_pd)
    del emb1_pd
    out["sf1"] = {
        "vectors": n1,
        "truth_pairs": w + c,
        "truth_within": w,
        "truth_cross": c,
        "truth_wall_s": round(time.time() - t0, 1),
    }
    print(f"truth: {w} within + {c} cross in {out['sf1']['truth_wall_s']}s",
          file=sys.stderr)

    k_trained = max(16, n1 // 128)
    out["sf1"]["k_trained"] = k_trained
    # cache_key=sf1 (not a ':curve' suffix): the SAME (k, iters, exact)
    # entry the registry lane and the decade warm below resolve, so the
    # whole script trains sf1 exactly once. A third in-session training
    # is not just wasted wall - each k-means iteration's packed-literal
    # centroid plan (k x 768 literals) leaves megabytes of retained
    # plan metadata in the driver JVM, and the accumulated sessions
    # OOMed an 8g heap on the first run of this protocol.
    trained_cents = similarity.kmeans_centroids(
        emb1, k=k_trained, iters=2, exact=False, cache_key=sf1
    )
    curve = {}
    for label, cents in (("strided", None), ("trained", trained_cents)):
        for na in (1, 2, 4, 8):
            spark.catalog.clearCache()
            t0 = time.time()
            pairs = dedup.embedding_near_dupes_ann(
                emb1, THRESHOLD, nassign=na, cents=cents
            )
            sp = _split(pairs)
            wall = round(time.time() - t0, 1)
            total = sp["within"] + sp["cross"]
            curve[f"{label}_nassign{na}"] = {
                "pairs": total,
                "within": sp["within"],
                "cross": sp["cross"],
                "recall": round(total / (w + c), 4) if (w + c) else None,
                "wall_s": wall,
            }
            print(f"curve {label} nassign={na}: {total} pairs "
                  f"(recall {curve[f'{label}_nassign{na}']['recall']}) "
                  f"{wall}s", file=sys.stderr)
    out["sf1"]["curve"] = curve

    # --- 2+3. decade legs: batch lanes + streaming twin at both tiers ---
    keys = [
        "ext_dedup_embedding_ann",
        "ext_dedup_embedding_ann_trained",
        "ext_stream_dedup_embedding_roundtrip",
    ]
    decade: dict = {}
    for sf_dir in (sf1, sf10):
        tier = os.path.basename(sf_dir)
        decade[tier] = {}
        # Production split (r13 verdict item 5): training is OFFLINE.
        # Warm the corpus-fingerprint centroid cache once per tier,
        # timed separately as train_wall_s, so the trained lane below
        # measures the QUERY path — the same persisted-index posture
        # the d=64 ext_similarity_ivf_trained lane already has. At
        # sf10_d768 the previous conflated number (203.4 s) was
        # training-dominated vs 73.3 s strided.
        emb_t = load_table(spark, sf_dir, "embeddings")
        t0 = time.time()
        k_t = max(16, emb_t.count() // 128)
        similarity.kmeans_centroids(
            emb_t, k=k_t, iters=2, exact=False, cache_key=sf_dir
        )
        decade[tier]["train_wall_s"] = round(time.time() - t0, 1)
        print(f"{tier} trained index warm (k={k_t}): "
              f"{decade[tier]['train_wall_s']}s", file=sys.stderr)
        for key in keys:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()  # drop dead plan trees
            t0 = time.time()
            df = registry.QUERIES[key](spark, sf_dir)
            sp = _split(df)
            wall = round(time.time() - t0, 1)
            decade[tier][key] = {
                "wall_s": wall,
                "pairs": sp["within"] + sp["cross"],
                "within": sp["within"],
                "cross": sp["cross"],
            }
            print(f"{tier} {key}: {sp['within'] + sp['cross']} pairs "
                  f"({sp['cross']} cross) {wall}s", file=sys.stderr)
        # streaming twin must land the batch lane's exact pair set
        b = decade[tier]["ext_dedup_embedding_ann"]
        s = decade[tier]["ext_stream_dedup_embedding_roundtrip"]
        decade[tier]["stream_equals_batch_counts"] = (
            b["pairs"] == s["pairs"]
            and b["within"] == s["within"]
            and b["cross"] == s["cross"]
        )
    out["decade"] = decade
    for key in keys:
        w1 = decade[os.path.basename(sf1)][key]["wall_s"]
        w10 = decade[os.path.basename(sf10)][key]["wall_s"]
        if w1 and w10:
            out.setdefault("wall_exponents", {})[key] = round(
                float(np.log10(w10 / w1)), 2
            )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
