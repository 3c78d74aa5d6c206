#!/usr/bin/env python
"""Regenerate docs/OPERATORS.md from registry docstrings."""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cdc_debezium_spark import registry  # noqa: E402


def main() -> None:
    registry.load_all()
    lines = [
        "# Operator index",
        "",
        "One row per driver-registered operator key (auto-generated from",
        "registry docstrings by `scripts/gen_operator_index.py`; regenerate",
        "after adding keys). Every key has a matching DuckDB oracle in",
        "`oracle_sql()`.",
        "",
        "| Key | What it does | Module |",
        "|---|---|---|",
    ]
    for key in sorted(registry.QUERIES):
        fn = registry.QUERIES[key]
        doc = (fn.__doc__ or "").strip().split("\n\n")[0]
        doc = " ".join(x.strip() for x in doc.splitlines())
        doc = doc.replace("|", "\\|")  # keep markdown table cells intact
        if len(doc) > 220:
            doc = doc[:217] + "..."
        mod = fn.__module__.replace("cdc_debezium_spark.", "")
        lines.append(f"| `{key}` | {doc} | {mod} |")
    lines.append("")
    out = os.path.join(_REPO, "docs", "OPERATORS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(registry.QUERIES)} keys")


if __name__ == "__main__":
    main()
