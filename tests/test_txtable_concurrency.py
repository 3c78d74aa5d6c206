"""TxTable under CONCURRENT writers (r7 verdict item 7).

The single-writer drills in test_streaming prove the conflict checks
fire when versions are stale; these prove the documented contract
holds when two real threads race past each other's read version:

  append  vs append  — blind adds never conflict: both rebase onto
                       whatever version the other claimed.
  append  vs upsert  — the upsert that read a base the append has
                       since advanced past raises CommitConflict; the
                       standard optimistic retry (recompute against
                       the new snapshot) then lands BOTH changes.
  upsert  vs upsert  — both read the same base and race for base+1;
                       the os.link claim guarantees exactly one
                       winner, the loser conflicts and retries.

Interleavings are forced with threading barriers/events — no sleeps:
the test FAILS (deadlock timeout) rather than silently passing if the
synchronization contract changes. Reference parity: Debezium sinks
land on stores with exactly this WriteSerializable optimistic
behavior (Delta MERGE); reference deploys declare the warehouse sink
at README.md:48-51.
"""

from __future__ import annotations

import threading

import pytest

from cdc_debezium_spark.streaming.txlog import CommitConflict, TxTable

WAIT = 120  # generous barrier timeout: only ever hit on a real bug


def _rows(t, version=None):
    return {(r.pk, r.v) for r in t.snapshot(version).collect()}


class GatedTable(TxTable):
    """TxTable whose FIRST latest_version() read per operation can be
    fenced: after reading the base version, signal `read_done` and
    block on `resume` — letting the test commit something else in the
    window between a transaction's read and its commit attempt."""

    def __init__(self, spark, path, read_done=None, resume=None):
        super().__init__(spark, path)
        self._read_done = read_done
        self._resume = resume
        self._armed = True

    def latest_version(self):
        v = super().latest_version()
        if self._armed and self._read_done is not None:
            self._armed = False
            self._read_done.set()
            assert self._resume.wait(WAIT), "resume event never fired"
        return v


def test_concurrent_appends_both_rebase(spark, tmp_path):
    """Two threads race append(): adds never conflict, so both must
    commit (distinct versions) and the final table holds both rows."""
    path = str(tmp_path / "tx")
    TxTable(spark, path).append(
        spark.createDataFrame([(0, "base")], "pk long, v string")
    )
    barrier = threading.Barrier(2, timeout=WAIT)
    results, errors = {}, {}

    def worker(name, pk):
        try:
            t = TxTable(spark, path)
            df = spark.createDataFrame([(pk, name)], "pk long, v string")
            staged = t._stage(df)  # stage before the barrier: both
            barrier.wait()         # then race latest_version+_try_commit
            while True:
                v = t.latest_version() + 1
                if t._try_commit(v, staged, []):
                    results[name] = v
                    return
        except Exception as ex:  # noqa: BLE001 - surfaced by assert
            errors[name] = f"{type(ex).__name__}: {ex}"

    threads = [
        threading.Thread(target=lambda: worker("a", 1)),
        threading.Thread(target=lambda: worker("b", 2)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(WAIT)
        assert not th.is_alive(), "append worker deadlocked"
    assert not errors, errors
    assert sorted(results.values()) == [1, 2]  # both committed, no gap
    t = TxTable(spark, path)
    assert _rows(t) == {(0, "base"), (1, "a"), (2, "b")}


def test_upsert_conflicts_when_append_interleaves(spark, tmp_path):
    """An upsert that read version N must raise CommitConflict when an
    append claims N+1 inside its read->commit window, and the retry
    (recompute against the new snapshot) lands both changes."""
    path = str(tmp_path / "tx")
    # CDC-schema rows throughout: the upsert fold keeps a row only if
    # op != 'd', so schema-less rows (null op) would silently vanish
    cdc = "pk long, v string, op string, ts_us long, ord2 long"
    TxTable(spark, path).append(
        spark.createDataFrame([(1, "old", "c", 0, 0)], cdc)
    )
    read_done, resume = threading.Event(), threading.Event()
    gated = GatedTable(spark, path, read_done=read_done, resume=resume)
    outcome, errors = {}, {}

    def upserter():
        src = spark.createDataFrame([(1, "new", "u", 10, 0)], cdc)
        try:
            try:
                gated.upsert(src, keys=("pk",), order=("ts_us", "ord2"))
                outcome["first"] = "committed"
            except CommitConflict:
                outcome["first"] = "conflict"
                gated.upsert(src, keys=("pk",), order=("ts_us", "ord2"))
                outcome["retry"] = "committed"
        except Exception as ex:  # noqa: BLE001 - surfaced by assert
            errors["upserter"] = f"{type(ex).__name__}: {ex}"
            resume.set()  # never leave the main thread blocked

    th = threading.Thread(target=upserter)
    th.start()
    # the upsert has read its base and is paused; advance the table
    assert read_done.wait(WAIT), "upsert never read its base version"
    TxTable(spark, path).append(
        spark.createDataFrame([(2, "mid", "c", 5, 0)], cdc)
    )
    resume.set()
    th.join(WAIT)
    assert not th.is_alive(), "upsert worker deadlocked"
    assert not errors, errors
    # the contract: stale read MUST conflict (never silently clobber
    # the interleaved append), and the retry folds both in
    assert outcome == {"first": "conflict", "retry": "committed"}
    assert _rows(TxTable(spark, path)) == {(1, "new"), (2, "mid")}


def test_concurrent_upserts_one_wins_one_conflicts(spark, tmp_path):
    """Two upserts read the SAME base and race for base+1: exactly one
    commits, the other raises CommitConflict; after the loser's retry
    both keys are present (WriteSerializable, Delta-MERGE behavior)."""
    path = str(tmp_path / "tx")
    TxTable(spark, path).append(
        spark.createDataFrame(
            [(1, "seed", "c", 0, 0)],
            "pk long, v string, op string, ts_us long, ord2 long",
        )
    )
    barrier = threading.Barrier(2, timeout=WAIT)
    outcome, errors = {}, {}

    class BarrierTable(TxTable):
        def latest_version(self):
            v = super().latest_version()
            if not getattr(self, "_released", False):
                self._released = True
                barrier.wait()  # both readers hold the same base
            return v

    def worker(name, pk):
        t = BarrierTable(spark, path)
        src = spark.createDataFrame(
            [(pk, name, "u", 10, 0)],
            "pk long, v string, op string, ts_us long, ord2 long",
        )
        try:
            try:
                t.upsert(src, keys=("pk",), order=("ts_us", "ord2"))
                outcome[name] = "committed"
            except CommitConflict:
                outcome[name] = "conflict"
                TxTable(spark, path).upsert(
                    src, keys=("pk",), order=("ts_us", "ord2")
                )
        except Exception as ex:  # noqa: BLE001 - surfaced by assert
            errors[name] = f"{type(ex).__name__}: {ex}"

    threads = [
        threading.Thread(target=worker, args=("a", 2)),
        threading.Thread(target=worker, args=("b", 3)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(WAIT)
        assert not th.is_alive(), "upsert worker deadlocked"
    assert not errors, errors
    assert sorted(outcome.values()) == ["committed", "conflict"]
    assert _rows(TxTable(spark, path)) == {
        (1, "seed"), (2, "a"), (3, "b"),
    }


def test_conflicted_upsert_leaves_no_torn_state(spark, tmp_path):
    """A losing writer must not leave the table torn: the snapshot at
    every committed version reads exactly what its commit wrote, and
    vacuum() reclaims the loser's orphaned staged files."""
    path = str(tmp_path / "tx")
    t = TxTable(spark, path)
    t.append(spark.createDataFrame([(1, "x")], "pk long, v string"))

    # simulate the loser: stage files, fail to claim an already-taken
    # version (the exact path a raced _try_commit takes)
    orphan = t._stage(spark.createDataFrame([(9, "loser")], "pk long, v string"))
    assert not t._try_commit(0, orphan, [])  # v0 already committed
    assert _rows(t) == {(1, "x")}  # reader never sees the orphan

    import os

    live_before = set(os.listdir(t.file_dir))
    assert set(orphan) <= live_before
    t.vacuum(retain_versions=1)
    live_after = set(os.listdir(t.file_dir))
    assert not (set(orphan) & live_after), "orphaned stage not reclaimed"
    assert _rows(t) == {(1, "x")}
