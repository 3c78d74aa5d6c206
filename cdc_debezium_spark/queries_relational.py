"""Driver keys for the relational surface (SURVEY.md §2.C) — M2."""

from __future__ import annotations
