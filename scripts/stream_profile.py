#!/usr/bin/env python
"""Streaming decade rehearsal: drain an events log through the
merge-on-read sinks (and optionally their copy-on-write twins) and
record PER-BATCH cost + state size, so the sinks' defining scale claim
— per-batch addBatch work is O(batch), flat in accumulated state — is
measured, not argued (r10 verdict item 1; r9 measured only to sf1).

Method (the STREAM_PROFILE_r09 decomposition, now committed):

  * events are chunked ts-ordered with repeat=2 (every chunk delivered
    twice — the at-least-once redelivery the canonical gate lanes
    run), one chunk per micro-batch via maxFilesPerTrigger=1;
  * each sink callable is wrapped in a meter that records per-batch
    addBatch wall, post-batch state-dir bytes, and live delta count —
    sink-side attribution, sharper than recentProgress durationMs
    (which folds in planning/WAL; those are recorded too);
  * flatness statistic: median addBatch over the LAST quarter of
    steady (non-compaction) batches vs the first quarter. Merge-on-
    read should hold ~1x at any scale; copy-on-write grows with
    accumulated state (O(total^2/batch) over a drain).

Usage:
  python scripts/stream_profile.py [sf_dir] [n_chunks] [repeat] [sinks]
  sinks: comma list of delta,scd2_delta,cow,scd2_cow (default: all)

Writes one JSON document to stdout; progress lines to stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cdc_debezium_spark.operators import cdc  # noqa: E402
from cdc_debezium_spark.session import get_spark  # noqa: E402
from cdc_debezium_spark.streaming.replay import (  # noqa: E402
    read_event_stream,
    write_event_chunks,
)
from cdc_debezium_spark.streaming.state import (  # noqa: E402
    DeltaUpsertSink,
    ParquetUpsertSink,
    Scd2DeltaHistorySink,
    Scd2HistorySink,
    run_upsert_stream,
)


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _n_deltas(path: str) -> int:
    try:
        return sum(1 for d in os.listdir(path) if d.startswith("delta_"))
    except OSError:
        return 0


class _Meter:
    """foreachBatch wrapper: per-batch addBatch wall + state shape.

    Compaction batches are detected from compact-CALL instrumentation
    (the sink's own compact() wrapped with a counter), not inferred
    from residual state shape — a size-threshold sink that degenerates
    to fold-every-batch leaves live_deltas == 0 after EVERY batch,
    which the shape heuristic misread as zero compactions (r13
    ADVICE). Copy-on-write sinks never call compact() from addBatch,
    so they correctly record compacted=False throughout."""

    def __init__(self, sink, state_dir: str) -> None:
        self.sink = sink
        self.state_dir = state_dir
        self.batches: list[dict] = []
        self.compact_calls = 0
        if hasattr(sink, "compact"):
            orig = sink.compact

            def counted(*a, **kw):
                self.compact_calls += 1
                return orig(*a, **kw)

            sink.compact = counted

    def __call__(self, batch, batch_id: int) -> None:
        before = self.compact_calls
        t0 = time.time()
        self.sink(batch, batch_id)
        dt = time.time() - t0
        self.batches.append(
            {
                "batch_id": int(batch_id),
                "addbatch_s": round(dt, 3),
                "state_bytes": _du(self.state_dir),
                "live_deltas": _n_deltas(self.state_dir),
                "compacted": self.compact_calls > before,
            }
        )


def _flatness(batches: list[dict], compact_every: int) -> dict:
    """first-quarter vs last-quarter median addBatch over steady
    batches (compaction batches and batch 0 excluded — batch 0 pays
    JIT/codegen warmup, compaction batches pay the scheduled fold).
    A compaction batch is the instrumented `compacted` flag from the
    meter's compact-call counter (r13 ADVICE: the previous state-shape
    heuristic — live_deltas == 0 after the call — misclassified the
    degenerate ratio policy that folds EVERY batch as all-steady,
    counting every fold as steady-state cost). The shape heuristic and
    the cadence modulo stay as fallbacks for batch dicts recorded
    without the flag (older committed profiles re-analyzed)."""
    had_flag = any("compacted" in b for b in batches)
    had_deltas = any(b.get("live_deltas", 0) > 0 for b in batches)

    def is_compaction(i: int, b: dict) -> bool:
        if had_flag:
            return bool(b.get("compacted"))
        if had_deltas and b.get("live_deltas", 1) == 0:
            return True
        return bool(compact_every and (i + 1) % compact_every == 0)

    steady = [
        b for i, b in enumerate(batches) if i > 0 and not is_compaction(i, b)
    ]
    if len(steady) < 4:
        return {"steady_batches": len(steady)}
    q = max(1, len(steady) // 4)

    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    first = med([b["addbatch_s"] for b in steady[:q]])
    last = med([b["addbatch_s"] for b in steady[-q:]])
    return {
        "steady_batches": len(steady),
        "first_quarter_median_s": first,
        "last_quarter_median_s": last,
        "last_over_first": round(last / first, 2) if first else None,
    }


def profile_sink(spark, chunk_dir: str, make_sink, read_back, label: str) -> dict:
    base = tempfile.mkdtemp(prefix=f"stream_profile_{label}_")
    state, cp = f"{base}/state", f"{base}/cp"
    try:
        sink, compact_every = make_sink(state)
        meter = _Meter(sink, state)
        stream = cdc.to_cdc(read_event_stream(spark, chunk_dir))
        t0 = time.time()
        q = run_upsert_stream(stream, meter, cp)
        if not q.awaitTermination(3600):
            q.stop()
            raise TimeoutError(f"{label}: stream did not drain in 3600s")
        drain = time.time() - t0
        progress = [
            {
                "batch_id": p["batchId"],
                "triggerExecution_ms": p["durationMs"].get("triggerExecution"),
                "addBatch_ms": p["durationMs"].get("addBatch"),
                "walCommit_ms": p["durationMs"].get("walCommit"),
                "numInputRows": p["numInputRows"],
            }
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
        t1 = time.time()
        out = read_back(sink, spark)
        rows = out.count()
        read_s = time.time() - t1
        # compaction count from the compact-call counter. r14 ADVICE:
        # a delta-layout sink that legitimately performed ZERO
        # compactions (cadence longer than the run) must report 0, not
        # None — None is reserved for sinks with no compact() at all
        # (copy-on-write: "not applicable"), so committed profiles
        # keep the two cases distinguishable.
        n_compactions = (
            meter.compact_calls if hasattr(sink, "compact") else None
        )
        return {
            "stream_drain_s": round(drain, 2),
            "read_back_s": round(read_s, 2),
            "result_rows": rows,
            "n_compactions": n_compactions,
            "n_batches": len(meter.batches),
            "sum_addbatch_s": round(sum(b["addbatch_s"] for b in meter.batches), 2),
            "final_state_bytes": meter.batches[-1]["state_bytes"] if meter.batches else 0,
            "per_batch": meter.batches,
            "flatness": _flatness(meter.batches, compact_every),
            "progress": progress,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, "scale", "sf10")
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    which = set(
        (sys.argv[4] if len(sys.argv) > 4 else "delta,scd2_delta,cow,scd2_cow").split(",")
    )
    spark = get_spark(app_name="stream-profile")

    chunk_dir = tempfile.mkdtemp(prefix="stream_profile_chunks_")
    t0 = time.time()
    total_rows = write_event_chunks(spark, sf_dir, chunk_dir, n_chunks, repeat)
    write_s = time.time() - t0
    print(f"chunks: {total_rows} rows in {write_s:.1f}s", file=sys.stderr)

    sinks = {
        "merge_on_read_DeltaUpsertSink": (
            "delta",
            lambda p: (
                DeltaUpsertSink(p, keys=["pk"], order=["ts_us", "ord2"], compact_every=3),
                3,
            ),
            lambda s, sp: s.read_live(sp),
        ),
        "merge_on_read_DeltaUpsertSink_ratio": (
            "delta_ratio",
            lambda p: (
                DeltaUpsertSink(
                    p, keys=["pk"], order=["ts_us", "ord2"], compact_ratio=1.0
                ),
                0,
            ),
            lambda s, sp: s.read_live(sp),
        ),
        "merge_on_read_DeltaUpsertSink_ratio_floor": (
            "delta_ratio_floor",
            # the r13 per-sink default for key-bounded bases: ratio
            # with a min-delta-bytes floor, so the fold fires on
            # accumulated bytes instead of every batch (the measured
            # ratio-only degeneration)
            lambda p: (
                DeltaUpsertSink(
                    p,
                    keys=["pk"],
                    order=["ts_us", "ord2"],
                    compact_ratio=1.0,
                    compact_min_bytes=32 << 20,
                ),
                0,
            ),
            lambda s, sp: s.read_live(sp),
        ),
        "merge_on_read_Scd2DeltaHistorySink": (
            "scd2_delta",
            lambda p: (Scd2DeltaHistorySink(p, keys=["pk"], compact_every=3), 3),
            lambda s, sp: s.read_history(sp),
        ),
        "merge_on_read_Scd2DeltaHistorySink_ratio": (
            "scd2_delta_ratio",
            lambda p: (
                Scd2DeltaHistorySink(p, keys=["pk"], compact_ratio=1.0),
                0,
            ),
            lambda s, sp: s.read_history(sp),
        ),
        "copy_on_write_ParquetUpsertSink": (
            "cow",
            lambda p: (ParquetUpsertSink(p, keys=["pk"], order=["ts_us", "ord2"]), 0),
            lambda s, sp: s.read_live(sp),
        ),
        "copy_on_write_Scd2HistorySink": (
            "scd2_cow",
            lambda p: (Scd2HistorySink(p, keys=["pk"]), 0),
            lambda s, sp: s.read_history(sp),
        ),
    }

    out = {
        "metric": "stream_decade_profile",
        "sf_dir": sf_dir,
        "n_chunks": n_chunks,
        "repeat": repeat,
        "event_rows_delivered": total_rows,
        "write_chunks_s": round(write_s, 2),
    }
    try:
        for name, (tag, mk, rd) in sinks.items():
            if tag not in which:
                continue
            print(f"profiling {name} ...", file=sys.stderr)
            t = time.time()
            out[name] = profile_sink(spark, chunk_dir, mk, rd, tag)
            print(f"  done in {time.time() - t:.1f}s", file=sys.stderr)
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)

    d = out.get("merge_on_read_Scd2DeltaHistorySink")
    c = out.get("copy_on_write_Scd2HistorySink")
    if d and c:
        out["scd2_cow_over_delta_drain"] = round(
            c["stream_drain_s"] / d["stream_drain_s"], 2
        )
    d = out.get("merge_on_read_DeltaUpsertSink")
    c = out.get("copy_on_write_ParquetUpsertSink")
    if d and c:
        out["latest_cow_over_delta_drain"] = round(
            c["stream_drain_s"] / d["stream_drain_s"], 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
