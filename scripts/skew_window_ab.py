#!/usr/bin/env python
"""Skewed-fixture A/B for the r15 Zipf-keyed window rewrites
(r15 verdict item 1): dsir_weights token counts and chunk_dedup_stats
chunk frequencies.

Fixture: 8M synthetic docs, 60% of which are the single token
"hotword" (ONE hot tf key and ONE hot chunk_md5 carrying ~4.8M rows =
~60% of all occurrence rows); the rest carry 4 tokens drawn from a 200k-term vocabulary (real
corpora grow vocabulary sublinearly; an all-unique cold vocab would
measure join-table construction, not skew). A
Window.partitionBy over the hot key lands every hot row in ONE task —
windows are not AQE-splittable, so the stage serializes on that task
(the 100 TB straggler/OOM signature). The r16 hash-agg + join shape
collapses hot rows map-side and its join reads are AQE-skew-split.

AQE skew thresholds are lowered proportionally to the fixture
(threshold 8 MB, factor 2 — production tunes absolute bytes; the
window path has no analogous knob, which is the point). We record
per-lane wall (median of 3, noop sink) and the WORST max/median
task-duration ratio across the lane's stages from the REST API.

Usage: run once on the OLD tree (r15 worktree) and once on the NEW
tree; paste both JSON lines into OPTIMIZATION_r16.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_UI", "true")

from pyspark.sql import functions as F  # noqa: E402

from cdc_debezium_spark.ext.sampling import dsir_weights  # noqa: E402
from cdc_debezium_spark.ext.text import chunk_dedup_stats  # noqa: E402
from cdc_debezium_spark.session import get_spark  # noqa: E402

FIXTURE = "/tmp/skew_window_docs.parquet"
N_DOCS = 8_000_000
HOT_FRAC = 0.6


def _rest(ui: str, path: str):
    with urllib.request.urlopen(f"{ui}/api/v1/{path}", timeout=30) as r:
        return json.loads(r.read())


def _worst_stage_skew(ui: str, app_id: str, since: set[int]) -> dict:
    """Worst max/median task duration across stages completed after
    `since` (the lane's own stages only; tiny stages skipped)."""
    stages = [
        s
        for s in _rest(ui, f"applications/{app_id}/stages?status=complete")
        if s["stageId"] not in since and s.get("numCompleteTasks", 0) >= 4
    ]
    worst: dict = {}
    for s in stages:
        sid = s["stageId"]
        try:
            summ = _rest(
                ui,
                f"applications/{app_id}/stages/{sid}/0/taskSummary"
                "?quantiles=0.0,0.5,1.0",
            )
        except Exception:
            continue
        dur = summ.get("duration") or []
        if len(dur) != 3 or dur[2] < 500:
            continue  # sub-half-second stages are noise
        ratio = round(dur[2] / max(dur[1], 1.0), 1)
        if not worst or ratio > worst["max_over_med"]:
            worst = {
                "stage": sid,
                "task_med_ms": dur[1],
                "task_max_ms": dur[2],
                "max_over_med": ratio,
                "n_tasks": s.get("numCompleteTasks"),
            }
    return worst


def main() -> None:
    spark = get_spark(app_name="skew-window-ab")
    # proportional skew-split tuning (stated in the artifact): the
    # fixture's hot partition is ~100 MB where production's would be
    # hundreds of GB; same confs applied to BOTH trees under test.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    ui = "http://localhost:4040"
    app_id = spark.sparkContext.applicationId

    if not os.path.isdir(FIXTURE):
        docs = spark.range(N_DOCS).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < int(HOT_FRAC * 10), F.lit("hotword"))
            .otherwise(
                F.concat_ws(
                    " ",
                    *[
                        F.concat(
                            F.lit(f"u{j}_"),
                            ((F.col("id") * (2 * j + 1)) % 200000).cast(
                                "string"
                            ),
                        )
                        for j in range(4)
                    ],
                )
            )
            .alias("text"),
            F.when(F.col("id") % 2 == 0, F.lit("en"))
            .otherwise(F.lit("de"))
            .alias("lang"),
        )
        docs.write.mode("overwrite").parquet(FIXTURE)

    docs = spark.read.parquet(FIXTURE)
    out = {"fixture": FIXTURE, "n_docs": N_DOCS, "hot_frac": HOT_FRAC}
    for name, fn in [
        ("chunk_dedup_stats", lambda: chunk_dedup_stats(docs, 64)),
        ("dsir_weights", lambda: dsir_weights(docs, "en")),
    ]:
        spark.sparkContext.setJobDescription(f"skew-ab: {name}")
        since = {
            s["stageId"]
            for s in _rest(ui, f"applications/{app_id}/stages?status=complete")
        }
        xs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            xs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        xs.sort()
        out[name] = {"wall_med": xs[1], "walls": xs}
        out[name].update(_worst_stage_skew(ui, app_id, since))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
