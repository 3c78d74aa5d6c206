#!/usr/bin/env python
"""End-to-end PAIR recall/wall frontier for two-level coarse IVF
assignment (r13 verdict item 1).

The r13 measurement (SCALE_ANN_COARSE_r13.json) graded
`assign_cells_coarse` on ASSIGNMENT recall — the fraction of vectors
routed to their true nearest cells (0.54–0.66 at sf100 probe 8–16).
But the metric a dedup user budgets is NEAR-DUP PAIR recall, and the
two differ in both directions: a pair survives coarse routing if
EITHER copy lands in a cell the other shares (so pair recall can beat
assignment recall), and coarse substitution can also co-locate pairs
the exact candidate set missed (verify is exact either way, so every
emitted pair is true). This script measures the end-to-end frontier:

  * truth = the EXACT-assignment ANN lane's pair set
    (embedding_near_dupes_ann, nassign=4 — the r13 verdict's named
    baseline), timed end-to-end;
  * per coarse_probe in {8,16,24,32}: the same lane with
    coarse_probe=p, end-to-end wall, emitted pairs, pair recall vs
    the exact set, and extra true pairs outside it;
  * both tiers (sf10 k=2000, sf100 k=20000) so the crossover rule —
    at what k does two-level win at >= 0.9 pair recall — is measured,
    not extrapolated.

Pair-set comparison is Spark-side (parquet scratch + join counts);
only scalar counts reach the driver.

Usage: python scripts/ann_coarse_pair_recall.py [sf10_dir] [sf100_dir]
Output: one JSON document on stdout; progress on stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cdc_debezium_spark.ext import dedup  # noqa: E402
from cdc_debezium_spark.session import get_spark  # noqa: E402
from cdc_debezium_spark.sources.catalog import load_table  # noqa: E402

THRESHOLD = 0.4
NASSIGN = 4
PROBES = (8, 16, 24, 32)


def main() -> None:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, "scale", "sf10")
    sf100 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(_REPO, "scale", "sf100")
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(app_name="ann-coarse-pair-recall")

    out: dict = {
        "metric": "ann_coarse_pair_recall",
        "nassign": NASSIGN,
        "threshold": THRESHOLD,
    }
    scratch = tempfile.mkdtemp(prefix="coarse_recall_")
    try:
        for sf_dir in (sf10, sf100):
            tier = os.path.basename(sf_dir)
            emb = load_table(spark, sf_dir, "embeddings")
            n = emb.count()
            k = n // 100  # stride-100 cells, the lane default
            rec: dict = {"vectors": n, "k": k, "sweep": {}}
            out[tier] = rec

            exact_dir = os.path.join(scratch, f"{tier}_exact")
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            dedup.embedding_near_dupes_ann(
                emb, THRESHOLD, nassign=NASSIGN
            ).write.mode("overwrite").parquet(exact_dir)
            rec["exact_wall_s"] = round(time.time() - t0, 1)
            exact = spark.read.parquet(exact_dir)
            rec["exact_pairs"] = exact.count()
            print(
                f"{tier} exact: {rec['exact_pairs']} pairs "
                f"{rec['exact_wall_s']}s (k={k})",
                file=sys.stderr,
            )

            for p in PROBES:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                pdir = os.path.join(scratch, f"{tier}_p{p}")
                t0 = time.time()
                dedup.embedding_near_dupes_ann(
                    emb, THRESHOLD, nassign=NASSIGN, coarse_probe=p
                ).write.mode("overwrite").parquet(pdir)
                wall = round(time.time() - t0, 1)
                got = spark.read.parquet(pdir)
                n_got = got.count()
                inter = got.join(exact, ["vec_a", "vec_b"]).count()
                rec["sweep"][str(p)] = {
                    "wall_s": wall,
                    "pairs": n_got,
                    "pair_recall": round(inter / rec["exact_pairs"], 4)
                    if rec["exact_pairs"]
                    else None,
                    "extra_true_pairs": n_got - inter,
                    "speedup_vs_exact": round(rec["exact_wall_s"] / wall, 2)
                    if wall
                    else None,
                }
                print(
                    f"{tier} probe={p}: {n_got} pairs, recall "
                    f"{rec['sweep'][str(p)]['pair_recall']}, {wall}s "
                    f"({rec['sweep'][str(p)]['speedup_vs_exact']}x)",
                    file=sys.stderr,
                )
                shutil.rmtree(pdir, ignore_errors=True)

            # crossover: smallest probe holding >= 0.9 pair recall, and
            # whether two-level beats exact there
            ok = [
                (int(p), v)
                for p, v in rec["sweep"].items()
                if (v["pair_recall"] or 0) >= 0.9
            ]
            if ok:
                p, v = min(ok, key=lambda t: t[0])
                rec["min_probe_at_090"] = p
                rec["wins_at_090"] = v["wall_s"] < rec["exact_wall_s"]
            else:
                rec["min_probe_at_090"] = None
                rec["wins_at_090"] = False
            shutil.rmtree(exact_dir, ignore_errors=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
