#!/usr/bin/env python
"""Per-lane sf1 noise bands (r10 verdict item 7): turn the prose
"noisy-class excursions ±2-3×" into a committed, mechanical artifact,
so sf1 sweep regressions are attributable the way bench ones are.

build  — aggregate the committed SCALE_SF1_r*.json sweeps into
         SCALE_SF1_bands.json: per lane {median, min, max, spread,
         rounds, paid} over every committed sweep (paid = the lane's
         timing included a shared-cache materialization in >=1 round,
         so its numbers are order-dependent and its band is widened).

compare — judge a fresh sweep against the bands. Excursion rule
         (mechanical, intentionally conservative so the output is a
         short adjudication list, not noise):
             t > median + max(3*spread, 0.5*median, 0.3 s)
         with the multiplier on median doubled for `paid` lanes.
         New lanes (no band) are listed separately, never flagged.

Usage:
  python scripts/sf1_bands.py build   [out=SCALE_SF1_bands.json]
  python scripts/sf1_bands.py compare <sweep.json> [bands.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> dict:
    sweeps = []
    for p in sorted(glob.glob(os.path.join(_REPO, "SCALE_SF1_r*.json"))):
        with open(p) as f:
            d = json.load(f)
        if "timings" in d:
            sweeps.append((os.path.basename(p), d))
    assert sweeps, "no committed SCALE_SF1_r*.json sweeps found"
    keys: set[str] = set()
    for _, d in sweeps:
        keys |= set(d["timings"])
    bands: dict[str, dict] = {}
    for k in sorted(keys):
        ts = [d["timings"][k] for _, d in sweeps if k in d["timings"]]
        paid = any(k in d.get("paid_materialization", {}) for _, d in sweeps)
        ts_sorted = sorted(ts)
        med = ts_sorted[len(ts_sorted) // 2]
        bands[k] = {
            "median": round(med, 3),
            "min": round(min(ts), 3),
            "max": round(max(ts), 3),
            "spread": round((max(ts) - min(ts)) / 2, 3),
            "rounds": len(ts),
            "paid": paid,
        }
    doc = {
        "metric": "sf1_per_lane_noise_bands",
        "built_from": [name for name, _ in sweeps],
        "rule": "excursion iff t > median + max(3*spread, m*median, 0.3s); m=0.5, 1.0 for paid lanes",
        "bands": bands,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    return doc


def compare(sweep_path: str, bands_path: str) -> int:
    with open(sweep_path) as f:
        sweep = json.load(f)
    with open(bands_path) as f:
        bands = json.load(f)["bands"]
    excursions, new_lanes, faster = [], [], []
    for k, t in sorted(sweep["timings"].items()):
        b = bands.get(k)
        if b is None:
            new_lanes.append({"key": k, "t": t})
            continue
        m = 1.0 if b["paid"] else 0.5
        limit = b["median"] + max(3 * b["spread"], m * b["median"], 0.3)
        if t > limit:
            excursions.append(
                {
                    "key": k,
                    "t": t,
                    "median": b["median"],
                    "limit": round(limit, 3),
                    "ratio": round(t / b["median"], 2),
                    "paid": b["paid"],
                }
            )
        elif t < b["min"] * 0.5 and b["min"] - t > 0.5:
            faster.append({"key": k, "t": t, "prior_min": b["min"]})
    print(
        json.dumps(
            {
                "sweep": os.path.basename(sweep_path),
                "lanes": len(sweep["timings"]),
                "excursions": excursions,
                "new_lanes": new_lanes,
                "notably_faster": faster,
            },
            indent=1,
        )
    )
    return 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "build"
    if mode == "build":
        out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(_REPO, "SCALE_SF1_bands.json")
        doc = build(out)
        print(f"wrote {out}: {len(doc['bands'])} lane bands from {doc['built_from']}")
    elif mode == "compare":
        sweep = sys.argv[2]
        bands = sys.argv[3] if len(sys.argv) > 3 else os.path.join(_REPO, "SCALE_SF1_bands.json")
        sys.exit(compare(sweep, bands))
    else:
        raise SystemExit(f"unknown mode {mode}")
