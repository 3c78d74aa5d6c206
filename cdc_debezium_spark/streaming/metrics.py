"""Stream monitoring (E9): progress capture + lag-SLO style checks.

Spark-native analog of the reference's Prometheus alerting over
consumer lag and connector health (prometheus-rules.yaml:12-37):
`StreamingQueryListener` is the scrape, `df.observe` the inline
counters, and `backlog_exceeded` the `kafka_consumer_lag_sum > 1000`
rule.
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQueryListener


class ProgressCapture(StreamingQueryListener):
    """Collects per-batch progress (rows, duration) for assertions
    and ops dashboards."""

    def __init__(self) -> None:
        self.progress: list[dict[str, Any]] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress.append(
            {
                "id": p.id,
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
            }
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(event.id)

    def onQueryIdle(self, event) -> None:  # Spark 3.4+
        pass

    def total_input_rows(self, query_id: str | None = None) -> int:
        """Rows across micro-batches; a batchId can be reported more
        than once (progress re-emission), so last report wins."""
        latest: dict[tuple[str, int], int] = {}
        for p in self.progress:
            if query_id is None or str(p["id"]) == str(query_id):
                latest[(str(p["id"]), p["batchId"])] = p["numInputRows"]
        return sum(latest.values())


def with_observed_counts(df: DataFrame, name: str = "metrics") -> DataFrame:
    """Inline counters on any (batch or streaming) DataFrame."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("op") == "d", 1).otherwise(0)).alias("deletes"),
    )


def backlog_exceeded(progress: list[dict], threshold: int = 1000) -> bool:
    """Lag-SLO analog: sustained batches with more queued input than
    the threshold (prometheus-rules.yaml:12-19)."""
    return any(p["numInputRows"] > threshold for p in progress[-5:])
