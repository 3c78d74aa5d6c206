"""Guard: _PRIORITY rotation follows the key-tiering policy.

The driver samples a count-budgeted prefix of the registry each round
(historically 50 keys). registry.py's policy comment promises that the
prefix always retires the oldest correctness debt: never-driver-sampled
keys first, then the stalest cohort. This test recomputes staleness
from the committed CORRECTNESS_r0*.json artifacts — the same evidence
the judge reads — so a stale _PRIORITY fails the suite instead of
silently starving keys of external rows (r7 verdict ask #8).
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

from cdc_debezium_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _correctness_rounds() -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(data, dict):
            out[int(m.group(1))] = set(data.keys())
    return out


@pytest.fixture(scope="module")
def loaded():
    registry.load_all()
    rounds = _correctness_rounds()
    if not rounds:
        pytest.skip("no committed CORRECTNESS artifacts")
    return rounds


def _last_sampled(rounds: dict[int, set[str]], upto: int) -> dict[str, int]:
    last: dict[str, int] = {}
    for r in sorted(rounds):
        if r > upto:
            continue
        for k in rounds[r]:
            last[k] = r
    # a key whose registered implementation changed after its last
    # driver sample has no valid row — the rotation must treat it as
    # never-sampled (registry._RESAMPLE_FORCED)
    for k in getattr(registry, "_RESAMPLE_FORCED", ()):
        last.pop(k, None)
    return last


def test_built_from_marker_fresh(loaded):
    # The rebuild ratchet: the layout may lag the newest committed
    # artifact by at most one round (the in-round file the driver
    # writes before the next rebuild).
    assert max(loaded) - registry._PRIORITY_BUILT_FROM <= 1, (
        "rebuild _PRIORITY from the newest CORRECTNESS files and bump "
        "_PRIORITY_BUILT_FROM"
    )


def test_never_sampled_keys_lead_priority(loaded):
    last = _last_sampled(loaded, registry._PRIORITY_BUILT_FROM)
    never = {k for k in registry.QUERIES if k not in last}
    prio = [k for k in registry._PRIORITY if k in registry.QUERIES]
    missing = never - set(prio)
    assert not missing, f"never-driver-sampled keys absent from _PRIORITY: {sorted(missing)}"
    # ...and they form a prefix: no sampled key may jump the queue.
    n = len(never)
    head = set(prio[:n])
    assert head == never, (
        "never-sampled keys must lead _PRIORITY; interlopers: "
        f"{sorted(head - never)}"
    )


def test_priority_budget_goes_to_stalest(loaded):
    # Within a 50-key driver budget, every entry after the
    # never-sampled block must come from the stalest remaining cohort
    # (warm-tier bound: nothing fresher than built_from-3 may consume
    # budget while older debt exists).
    last = _last_sampled(loaded, registry._PRIORITY_BUILT_FROM)
    prio = [k for k in registry.QUERIES if k in registry._PRIORITY][:50]
    sampled_tail = [k for k in prio if k in last]
    if not sampled_tail:
        return
    oldest_outside = min(
        (last[k] for k in registry.QUERIES if k in last and k not in prio),
        default=registry._PRIORITY_BUILT_FROM,
    )
    worst_inside = max(last[k] for k in sampled_tail)
    assert worst_inside <= oldest_outside, (
        f"budgeted prefix carries a key last sampled r{worst_inside} while "
        f"r{oldest_outside}-stale keys wait outside"
    )


def test_driver_sample_breadth(loaded):
    # r8 verdict ask #8: the committed CORRECTNESS_r0*.json union must
    # cover every registry key — a key with no driver row ever is only
    # tolerable while it leads _PRIORITY (i.e. it is queued to be
    # sampled next round). This locks the r8 state (274/274 covered)
    # so a future key addition can't silently join a never-sampled
    # class that nothing retires.
    union: set[str] = set()
    for keys in loaded.values():
        union |= keys
    uncovered = [k for k in registry.QUERIES if k not in union]
    prio = [k for k in registry.QUERIES if k in registry._PRIORITY]
    lead = set(prio[: len(uncovered)])
    strays = [k for k in uncovered if k not in lead]
    assert not strays, (
        "registry keys with no driver CORRECTNESS row that do not lead "
        f"_PRIORITY: {sorted(strays)} — add them to the lead block"
    )


def test_registry_orders_priority_first(loaded):
    keys = list(registry.QUERIES)
    prio = [k for k in registry._PRIORITY if k in registry.QUERIES]
    assert keys[: len(prio)] == prio
