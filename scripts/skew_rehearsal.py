#!/usr/bin/env python
"""Skew rehearsal: MEASURE the hot-key join strategies the repo has so
far only plan-pinned (tests/test_plans.py::test_aqe_splits_skewed_join
proves the AQE mechanism engages; operators/relational.salted_join is
oracled for correctness) — naive shuffle join vs AQE skew-split vs
static salting, on a deliberately skewed fact at a real scale.

Workload: sf1 lineitem (~6M rows) with a fraction of rows remapped to
ONE hot order key, equi-joined to the sf1 orders dim (~1.5M rows —
broadcast is DISABLED for the experiment because at 100 TB a
row-linear dim does not broadcast; the shuffle path is the one under
test), then fully aggregated (1 output row) so sink cost is zero.

Per strategy we record wall, and for the join's read stage the
max-vs-median task time and shuffle-read volume from the REST
taskSummary — the direct signature of one reducer eating the hot key.

AQE skew thresholds are lowered (64 MB default → 4 MB, factor 2) so
the splitter engages at rehearsal scale; what production tunes by
absolute bytes we tune proportionally to the fixture. This is stated
in the artifact, not hidden.

Usage: python scripts/skew_rehearsal.py [sf_dir] [hot_frac]
Output: one JSON line -> SCALE.md §Round-11 skew table.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_UI", "true")

from pyspark.sql import functions as F  # noqa: E402

from cdc_debezium_spark.operators.relational import (  # noqa: E402
    detect_hot_keys,
    salted_join,
)
from cdc_debezium_spark.session import get_spark  # noqa: E402


def _rest(ui: str, path: str):
    with urllib.request.urlopen(f"{ui}/api/v1/{path}", timeout=30) as r:
        return json.loads(r.read())


def _join_stage_skew(ui: str, app_id: str, group: str) -> dict:
    """Task-level skew signature of the group's heaviest shuffle-read
    stage: max vs median task wall and shuffle-read bytes."""
    jobs = _rest(ui, f"applications/{app_id}/jobs")
    stage_ids: set[int] = set()
    for j in jobs:
        if j.get("jobGroup") == group:
            stage_ids.update(j.get("stageIds", []))
    stages = [
        s
        for s in _rest(ui, f"applications/{app_id}/stages?status=complete")
        if s["stageId"] in stage_ids
    ]
    if not stages:
        return {}
    hot = max(stages, key=lambda s: s.get("shuffleReadBytes", 0))
    summ = _rest(
        ui,
        f"applications/{app_id}/stages/{hot['stageId']}/"
        f"{hot['attemptId']}/taskSummary?quantiles=0.5,1.0",
    )
    run = summ.get("executorRunTime", [0, 0])
    rd = summ.get("shuffleReadMetrics", {}).get("readBytes", [0, 0])
    return {
        "stage_id": hot["stageId"],
        "n_tasks": hot.get("numCompleteTasks"),
        "med_task_s": round(run[0] / 1e3, 2),
        "max_task_s": round(run[1] / 1e3, 2),
        "med_task_read_mb": round(rd[0] / 1e6, 1),
        "max_task_read_mb": round(rd[1] / 1e6, 1),
        "stage_shuffle_read_mb": round(hot.get("shuffleReadBytes", 0) / 1e6, 1),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, "scale", "sf1")
    hot_frac_denom = int(sys.argv[2]) if len(sys.argv) > 2 else 4  # 1/4 hot
    spark = get_spark(app_name="skew-rehearsal")
    sc = spark.sparkContext
    ui, app_id = sc.uiWebUrl, sc.applicationId

    # The shuffle path is under test: no broadcast, no pre-AQE shortcuts.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Proportional skew thresholds (64 MB prod default -> 4 MB at sf1).
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    )
    # Deterministic hot key: 1/denom of fact rows collapse to key 0.
    fact = li.withColumn(
        "k",
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_quantity", "l_extendedprice"),
                   F.lit(hot_frac_denom)) == 0,
            F.lit(0).cast("long"),
        ).otherwise(F.col("l_orderkey").cast("long")),
    )
    dim = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("long").alias("k"),
        "o_totalprice",
        "o_orderdate",
    )

    def agg(joined):
        return joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice") + F.col("o_totalprice")).alias("s"),
        )

    strategies = {
        "naive_no_skew_split": lambda: agg(
            fact.join(dim, "k")
        ),
        "aqe_skew_split": lambda: agg(fact.join(dim, "k")),
        "salted_static": lambda: agg(salted_join(fact, dim, ["k"], salt=32)),
        # Targeted: detect heavy hitters on a 1% sample (hot keys are
        # oversampled by definition), salt ONLY those — the whole-dim
        # replication cost above is what this mode exists to avoid.
        "salted_hot_targeted": lambda: agg(
            salted_join(
                fact,
                dim,
                ["k"],
                salt=32,
                hot_keys=detect_hot_keys(
                    fact, ["k"], threshold_frac=0.05, sample_frac=0.01
                ),
            )
        ),
    }

    fact_rows = fact.count()
    hot_rows = fact.filter(F.col("k") == 0).count()
    out = {
        "sf_dir": sf_dir,
        "fact_rows": fact_rows,
        "dim_rows": dim.count(),
        "hot_rows": hot_rows,
        "hot_frac": round(hot_rows / fact_rows, 4),
        "strategies": {},
    }

    for name, build in strategies.items():
        # AQE's runtime splitter runs ONLY in its own strategy — the
        # salted rows measure the static rewrite, not AQE's rescue.
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled",
            "true" if name == "aqe_skew_split" else "false",
        )
        spark.catalog.clearCache()
        group = f"skew:{name}"
        sc.setJobGroup(group, group)
        t0 = time.perf_counter()
        row = build().collect()[0]  # 1-row aggregate
        wall = round(time.perf_counter() - t0, 2)
        rec = {"wall_s": wall, "agg_n": row["n"], "agg_s": round(float(row["s"]), 2)}
        rec.update(_join_stage_skew(ui, app_id, group) if ui else {})
        out["strategies"][name] = rec
        print(f"# {name}: {wall:.2f}s {rec}", file=sys.stderr)

    # Correctness guard: row counts exact; double sums within float
    # accumulation-order noise (sum order differs across plans).
    recs = list(out["strategies"].values())
    ns = {s["agg_n"] for s in recs}
    s0 = recs[0]["agg_s"]
    out["strategies_agree"] = len(ns) == 1 and all(
        abs(s["agg_s"] - s0) <= 1e-9 * abs(s0) for s in recs
    )
    print(json.dumps(out))
    spark.stop()
    if not out["strategies_agree"]:
        # fail LOUDLY (r11 ADVICE): a semantics regression in
        # salted_join/detect_hot_keys must not emit a plausible artifact
        print("FATAL: join strategies disagree on (n, sum)", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
