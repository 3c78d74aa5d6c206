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
        than once (progress re-emission), so MAX report per
        (query, batch) wins — the SAME rule render_exposition applies
        to cdc_stream_input_rows_total (r14 ADVICE: last-report-wins
        here vs max-wins there made a shrinking re-emission spin the
        progress-audit wait loop for its full timeout)."""
        latest: dict[tuple[str, int], int] = {}
        for p in self.progress:
            if query_id is None or str(p["id"]) == str(query_id):
                key = (str(p["id"]), p["batchId"])
                latest[key] = max(latest.get(key, 0), p["numInputRows"])
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


def _esc(v: str) -> str:
    """Prometheus label-value escaping (exposition format 0.0.4):
    backslash, double-quote, newline."""
    return (
        str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
    )


def render_exposition(capture: "ProgressCapture") -> str:
    """Render a ProgressCapture as Prometheus text exposition format
    0.0.4 — the scrape payload the reference's Prometheus pulls from
    every component (prometheus-config.yaml: scrape_configs with
    metrics_path /metrics; kafka-connect exposes consumer lag and
    connector state the same way). Metric mapping:

      cdc_stream_endpoint_up              — 1 while the process serves
                                            (namespaced: Prometheus
                                            synthesizes its own `up`
                                            per scrape, so exporting a
                                            literal `up` would collide)
      cdc_stream_queries_active           — started minus terminated
      cdc_stream_input_rows_total{query}  — numInputRows summed with
                                            max-report-wins per batch
                                            (monotone, so PromQL
                                            rate()/increase() never see
                                            a phantom counter reset from
                                            a progress re-emission that
                                            reports fewer rows)
      cdc_stream_last_batch_id{query}     — latest batchId seen
      cdc_stream_last_batch_duration_ms{query,phase}
                                          — durationMs of the latest
                                            report (addBatch etc.)
      cdc_stream_backlog_rows{query}      — latest numInputRows (the
                                            kafka_consumer_lag_sum
                                            analog the lag alert
                                            thresholds on)

    Counters are derived from the capture on every render — the
    listener is the single source of truth, the endpoint is stateless
    (scrape-safe under concurrent progress callbacks: list.append is
    atomic and renders tolerate a mid-append prefix)."""
    lines = [
        "# HELP cdc_stream_endpoint_up Endpoint liveness (namespaced; Prometheus adds its own synthetic up).",
        "# TYPE cdc_stream_endpoint_up gauge",
        "cdc_stream_endpoint_up 1",
        "# HELP cdc_stream_queries_active Streaming queries started minus terminated.",
        "# TYPE cdc_stream_queries_active gauge",
        f"cdc_stream_queries_active {len(capture.started) - len(capture.terminated)}",
    ]
    latest_rows: dict[tuple[str, int], int] = {}
    last_report: dict[str, dict] = {}
    for p in capture.progress:
        qid = str(p["id"])
        key = (qid, p["batchId"])
        # max per (query, batch): a re-emission reporting fewer rows must
        # not shrink a TYPE-counter series between scrapes.
        latest_rows[key] = max(latest_rows.get(key, 0), p["numInputRows"])
        last_report[qid] = p
    totals: dict[str, int] = {}
    for (qid, _bid), n in latest_rows.items():
        totals[qid] = totals.get(qid, 0) + n
    lines += [
        "# HELP cdc_stream_input_rows_total Input rows per query (max report per batch wins; monotone).",
        "# TYPE cdc_stream_input_rows_total counter",
    ]
    for qid in sorted(totals):
        lines.append(
            f'cdc_stream_input_rows_total{{query="{_esc(qid)}"}} {totals[qid]}'
        )
    lines += [
        "# HELP cdc_stream_last_batch_id Latest micro-batch id per query.",
        "# TYPE cdc_stream_last_batch_id gauge",
        "# HELP cdc_stream_backlog_rows Latest batch input rows (consumer-lag analog).",
        "# TYPE cdc_stream_backlog_rows gauge",
        "# HELP cdc_stream_last_batch_duration_ms Latest batch phase durations.",
        "# TYPE cdc_stream_last_batch_duration_ms gauge",
    ]
    for qid in sorted(last_report):
        p = last_report[qid]
        q = _esc(qid)
        lines.append(f'cdc_stream_last_batch_id{{query="{q}"}} {p["batchId"]}')
        lines.append(
            f'cdc_stream_backlog_rows{{query="{q}"}} {p["numInputRows"]}'
        )
        for phase, ms in sorted((p.get("durationMs") or {}).items()):
            lines.append(
                "cdc_stream_last_batch_duration_ms"
                f'{{query="{q}",phase="{_esc(phase)}"}} {ms}'
            )
    return "\n".join(lines) + "\n"


class MetricsEndpoint:
    """HTTP /metrics endpoint serving `render_exposition` — the
    in-process analog of the reference's per-component scrape targets
    (prometheus-config.yaml registers every service at
    metrics_path: /metrics; the rules in prometheus-rules.yaml then
    alert on the scraped series). Stdlib-only (ThreadingHTTPServer on
    a daemon thread, ephemeral port), so a Spark driver can expose
    stream health to a real Prometheus with zero dependencies; on a
    cluster this runs once on the driver, where StreamingQueryListener
    callbacks land.

    Usage:
        cap = ProgressCapture(); spark.streams.addListener(cap)
        with MetricsEndpoint(cap) as ep:
            ...  # scrape http://127.0.0.1:{ep.port}/metrics
    """

    def __init__(self, capture: ProgressCapture, port: int = 0) -> None:
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        endpoint = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 - http.server API
                if self.path.split("?")[0] != "/metrics":
                    self.send_response(404)
                    self.end_headers()
                    return
                body = render_exposition(endpoint.capture).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # silence per-scrape stderr
                pass

        self.capture = capture
        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "MetricsEndpoint":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
