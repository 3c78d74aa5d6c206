#!/usr/bin/env python
"""Targeted decade probe: run a named set of registry keys at two (or
more) fixture scales in ONE fresh session, one cold timed pass per
(key, scale), with per-key shuffle attribution from the Spark UI REST
API (the per-stage attribution protocol the r10 ngram rehearsal used,
now committed as a script).

Differs from sweep_scale.py on purpose: the sweep answers "does every
lane survive this scale"; this probe answers "what are the wall /
shuffle / output EXPONENTS of these specific lanes across a decade" —
the question SCALE.md's rehearsal tables are built from.

Usage:
  python scripts/decade_probe.py key1,key2,... sf_dir1 sf_dir2 ...

Output: one JSON line
  {"keys": [...], "scales": {sf_dir: {key: {"wall_s", "shuffle_write_mb",
   "shuffle_read_mb", "output_rows"}}}}

Per (key, scale): clearCache first (no cross-lane cache rides — every
number is a cold-lineage pass), wall measured over a noop-format write
(forces EVERY column, unlike count(), which lets Catalyst prune
expensive computed columns), shuffle bytes summed over the stages of
the jobs tagged with this probe's job group, output rows observed on
the SAME execution via df.observe/CollectMetrics — each lane executes
exactly ONCE per scale (r11 ADVICE: the old second untimed count()
replayed entire streaming-roundtrip lanes, wiping and rebuilding
their persisted index dirs and re-executing delivery protocols).
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

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cdc_debezium_spark import registry  # noqa: E402
from cdc_debezium_spark.session import get_spark  # noqa: E402


def _rest(ui: str, path: str):
    with urllib.request.urlopen(f"{ui}/api/v1/{path}", timeout=30) as r:
        return json.loads(r.read())


def _group_shuffle_mb(ui: str, app_id: str, group: str) -> tuple[float, float]:
    """Sum shuffle write/read MB over every stage of every job whose
    jobGroup matches. Stages shared between jobs are counted once."""
    jobs = _rest(ui, f"applications/{app_id}/jobs")
    stage_ids: set[int] = set()
    for j in jobs:
        if j.get("jobGroup") == group:
            stage_ids.update(j.get("stageIds", []))
    wr = rd = 0.0
    for s in _rest(ui, f"applications/{app_id}/stages?status=complete"):
        if s["stageId"] in stage_ids:
            wr += s.get("shuffleWriteBytes", 0)
            rd += s.get("shuffleReadBytes", 0)
    return round(wr / 1e6, 1), round(rd / 1e6, 1)


def main() -> None:
    keys = sys.argv[1].split(",")
    sf_dirs = sys.argv[2:] or [
        os.path.join(_REPO, "scale", "sf1"),
        os.path.join(_REPO, "scale", "sf10"),
    ]
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    spark = get_spark(app_name="decade-probe")
    registry.load_all()
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    out: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        out[sf_dir] = {}
        for key in keys:
            fn = registry.QUERIES[key]
            spark.catalog.clearCache()
            group = f"probe:{key}:{os.path.basename(sf_dir)}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            try:
                obs = Observation()
                df = fn(spark, sf_dir)
                df.observe(obs, F.count(F.lit(1)).alias("rows")).write.format(
                    "noop"
                ).mode("overwrite").save()
                wall = round(time.perf_counter() - t0, 2)
                wr_mb, rd_mb = (
                    _group_shuffle_mb(ui, app_id, group) if ui else (-1.0, -1.0)
                )
                rows = int(obs.get["rows"])  # same execution, not a re-run
            except Exception as ex:  # noqa: BLE001 - record, keep probing
                out[sf_dir][key] = {
                    "error": f"{type(ex).__name__}: {str(ex)[:300]}"
                }
                print(f"# {os.path.basename(sf_dir)} {key}: ERROR", file=sys.stderr)
                continue
            out[sf_dir][key] = {
                "wall_s": wall,
                "shuffle_write_mb": wr_mb,
                "shuffle_read_mb": rd_mb,
                "output_rows": rows,
            }
            print(
                f"# {os.path.basename(sf_dir)} {key}: {wall:.2f}s "
                f"wr={wr_mb}MB rd={rd_mb}MB rows={rows}",
                file=sys.stderr,
            )
    print(json.dumps({"keys": keys, "scales": out}))
    spark.stop()


if __name__ == "__main__":
    main()
