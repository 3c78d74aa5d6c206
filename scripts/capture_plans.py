#!/usr/bin/env python
"""Capture .explain('formatted') for the bench lanes (r15 opt round).

Usage: python scripts/capture_plans.py <suffix> [key ...]
Writes plans/r15/<key>_<suffix>.txt and prints a one-line plan-shape
summary (Exchange count, join strategies, Python-eval nodes) per key.
"""

from __future__ import annotations

import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from cdc_debezium_spark import registry  # noqa: E402
from cdc_debezium_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    if not keys:
        import bench

        keys = list(bench.HEADLINE) + list(bench.DIAGNOSTICS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        _REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    registry.load_all()
    for key in keys:
        fn = registry.QUERIES.get(key)
        if fn is None:
            print(f"!! {key}: not registered")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"!! {key}: {exc}")
            continue
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(re.findall(r"(\w*(?:HashJoin|MergeJoin|NestedLoopJoin))", plan))
        )
        py = sorted(
            set(
                re.findall(
                    r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas|MapInBatch\w*)",
                    plan,
                )
            )
        )
        agg = len(re.findall(r"HashAggregate", plan))
        print(
            f"{key}: Exchange={n_ex} joins={joins or '-'} py={py or '-'} "
            f"HashAgg={agg} lines={len(plan.splitlines())}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
