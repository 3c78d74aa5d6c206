"""Event-time windowing helpers (SURVEY.md §2.E E3–E5).

The same expressions serve batch (oracle-checkable) and streaming
(with `withWatermark` upstream): Spark's `window`/`session_window`
are incremental under Structured Streaming and plain aggregations in
batch — one definition, both runtimes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

US_PER_DAY = 86_400_000_000
US_PER_MIN = 60_000_000


def tumbling(df: DataFrame, ts_col: str, duration: str, *keys: str) -> "DataFrame":
    """Tumbling window grouped-aggregation builder: returns the grouped
    object so callers attach their own aggs."""
    return df.groupBy(F.window(ts_col, duration), *keys)


def sliding(df: DataFrame, ts_col: str, duration: str, slide: str, *keys: str):
    return df.groupBy(F.window(ts_col, duration, slide), *keys)


def session(df: DataFrame, ts_col: str, gap: str, *keys: str):
    """Session window: events within `gap` of each other merge."""
    return df.groupBy(*keys, F.session_window(F.col(ts_col), gap))


def window_start_us(window_col: str = "window") -> Column:
    return F.unix_micros(F.col(f"{window_col}.start").cast("timestamp"))


def window_end_us(window_col: str = "window") -> Column:
    return F.unix_micros(F.col(f"{window_col}.end").cast("timestamp"))
