"""Driver keys for the scalar function surface (SURVEY.md §2.D) — M2."""

from __future__ import annotations
