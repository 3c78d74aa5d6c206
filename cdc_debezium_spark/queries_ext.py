"""Driver keys for LLM-data-pipeline extensions (SURVEY.md §2.G) — M5."""

from __future__ import annotations
