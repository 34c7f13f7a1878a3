"""Optimistic concurrent-writer commits (VERDICT r5 #2).

Statement seqs are allocated by atomic create of per-seq reservation
files in ``<table>/_commits/`` (O_CREAT|O_EXCL with retry — the
local-fs analog of Delta's put-if-absent commit), so two sessions over
one warehouse can never stamp the same ``__seq__``; commit timestamps
are one immutable file per statement (no read-modify-write anywhere on
the commit path); read-modify-write DML (UPDATE/MERGE/predicate
DELETE/RESTORE) validates its snapshot base at reservation time and
raises ConcurrentWriteConflict BEFORE writing anything."""

import os

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark import ConcurrentWriteConflict, EngineSession


def _mk_pair(spark, tmp_path):
    """Two independent EngineSessions (separate catalogs, separate
    in-memory seq counters) over ONE warehouse directory."""
    wh = str(tmp_path / "wh_concurrent")
    e1 = EngineSession(spark=spark, warehouse=wh)
    e1.sql("CREATE TABLE t (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e2 = EngineSession(spark=spark, warehouse=wh)  # attaches t from disk
    return e1, e2


def _seq_history(e, table="t"):
    return sorted(
        r["__seq__"]
        for r in e.sql(f"SELECT DISTINCT __seq__ FROM {table}$history").collect()
    )


def test_interleaved_inserts_never_share_a_seq(spark, tmp_path):
    e1, e2 = _mk_pair(spark, tmp_path)
    for i in range(5):
        e1.sql(f"INSERT INTO t VALUES ({i}, 'one-{i}')")
        e2.sql(f"INSERT INTO t VALUES ({100 + i}, 'two-{i}')")
    rows = {(r.id, r.v) for r in e1.sql("SELECT * FROM t").collect()}
    assert len(rows) == 10, "no lost rows"
    seqs = _seq_history(e1)
    assert len(seqs) == 10, "10 statements -> 10 distinct seqs"
    assert seqs == sorted(set(seqs)) and seqs[-1] == 10, (
        "strictly monotone, gap-free under pure contention"
    )
    # both sessions read the same merged state
    assert e2.sql("SELECT count(*) AS n FROM t").collect()[0].n == 10


def test_upsert_ordering_across_sessions(spark, tmp_path):
    """Cross-session writes to ONE key resolve by commit order — the
    last statement's value wins everywhere, and time travel replays the
    intermediate states."""
    e1, e2 = _mk_pair(spark, tmp_path)
    e1.sql("INSERT INTO t VALUES (1, 'a')")   # seq 1
    e2.sql("INSERT INTO t VALUES (1, 'b')")   # seq 2
    e1.sql("INSERT INTO t VALUES (1, 'c')")   # seq 3
    for e in (e1, e2):
        assert e.sql("SELECT v FROM t").collect()[0].v == "c"
    assert e2.catalog.read("t", as_of_seq=1).collect()[0].v == "a"
    assert e1.catalog.read("t", as_of_seq=2).collect()[0].v == "b"
    # per-seq commit files exist and timestamp travel resolves across
    # sessions (each statement wrote its own immutable commit file)
    commits = e2.catalog._load_commits(e2.catalog.get_table("t"))
    assert sorted(commits) == [1, 2, 3]
    assert e1.catalog.resolve_timestamp("t", commits[2]) == 2


def test_update_conflict_detected_before_any_write(spark, tmp_path, monkeypatch):
    """A write landing between an UPDATE's snapshot read and its commit
    reservation raises ConcurrentWriteConflict; the UPDATE writes
    NOTHING (no partial statement), and a retry succeeds."""
    e1, e2 = _mk_pair(spark, tmp_path)
    e1.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    cat = e1.catalog
    orig = cat._reserve_seqs
    state = {"fired": False}

    def sneak_then_reserve(spec, count=1, expect_base=None):
        if not state["fired"]:
            state["fired"] = True
            e2.sql("INSERT INTO t VALUES (99, 'sneak')")  # concurrent commit
        return orig(spec, count, expect_base=expect_base)

    monkeypatch.setattr(cat, "_reserve_seqs", sneak_then_reserve)
    with pytest.raises(ConcurrentWriteConflict, match="re-run"):
        e1.sql("UPDATE t SET v = upper(v)")
    monkeypatch.undo()
    # nothing half-applied: the sneak landed, the update did not
    got = {(r.id, r.v) for r in e1.sql("SELECT * FROM t").collect()}
    assert got == {(1, "a"), (2, "b"), (99, "sneak")}
    assert _seq_history(e1) == [1, 2]
    # the failed statement left no stray reservation: retry allocates
    # the next seq and applies cleanly
    assert e1.sql("UPDATE t SET v = upper(v)").collect()[0]["count"] == 3
    got = {r.v for r in e1.sql("SELECT v FROM t").collect()}
    assert got == {"A", "B", "SNEAK"}


def test_merge_conflict_aborts_whole_statement(spark, tmp_path, monkeypatch):
    """MERGE reserves its full contiguous seq range up front — a
    concurrent commit aborts the whole MERGE (both appends), never half."""
    e1, e2 = _mk_pair(spark, tmp_path)
    e1.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    cat = e1.catalog
    orig = cat._reserve_seqs
    state = {"fired": False}

    def sneak_then_reserve(spec, count=1, expect_base=None):
        if not state["fired"]:
            state["fired"] = True
            e2.sql("INSERT INTO t VALUES (50, 'mid')")
        return orig(spec, count, expect_base=expect_base)

    monkeypatch.setattr(cat, "_reserve_seqs", sneak_then_reserve)
    with pytest.raises(ConcurrentWriteConflict):
        e1.sql(
            "MERGE INTO t USING (SELECT 1 AS id, 'A' AS v UNION ALL"
            " SELECT 2, NULL) s ON t.id = s.id"
            " WHEN MATCHED AND s.v IS NULL THEN DELETE"
            " WHEN MATCHED THEN UPDATE SET v = s.v"
        )
    monkeypatch.undo()
    got = {(r.id, r.v) for r in e1.sql("SELECT * FROM t").collect()}
    assert got == {(1, "a"), (2, "b"), (50, "mid")}, "no partial MERGE"
    # retry applies both halves under fresh contiguous seqs
    res = e1.sql(
        "MERGE INTO t USING (SELECT 1 AS id, 'A' AS v UNION ALL"
        " SELECT 2, NULL) s ON t.id = s.id"
        " WHEN MATCHED AND s.v IS NULL THEN DELETE"
        " WHEN MATCHED THEN UPDATE SET v = s.v"
    ).collect()[0]
    assert (res.upserted, res.deleted) == (1, 1)
    seqs = _seq_history(e1)
    assert seqs[-2:] == [seqs[-1] - 1, seqs[-1]], "contiguous MERGE seqs"
    got = {(r.id, r.v) for r in e1.sql("SELECT * FROM t").collect()}
    assert got == {(1, "A"), (50, "mid")}


def test_blind_inserts_never_conflict(spark, tmp_path):
    """INSERT is a blind append: contention retries allocation instead
    of raising — interleaved inserts all succeed."""
    e1, e2 = _mk_pair(spark, tmp_path)
    # stale in-memory counters on both sides: each session's cache lags
    # the other's commits, so every allocation exercises the CAS retry
    for i in range(4):
        (e1 if i % 2 == 0 else e2).sql(f"INSERT INTO t VALUES ({i}, 'x')")
    assert e1.sql("SELECT count(*) AS n FROM t").collect()[0].n == 4
    assert _seq_history(e1) == [1, 2, 3, 4]


def test_crashed_reservation_does_not_block_writers(spark, tmp_path):
    """A writer that reserved a seq and died (stray .inflight, no data,
    no finalize) must not block others: allocation skips past it and the
    seq history simply has a gap."""
    e1, e2 = _mk_pair(spark, tmp_path)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    spec = e1.catalog.get_table("t")
    d = e1.catalog._commit_dir(spec)
    with open(os.path.join(d, f"{2:010d}.inflight"), "x"):
        pass  # simulated crash: reservation never finalized
    e2.sql("INSERT INTO t VALUES (3, 'c')")  # allocates seq 3, not 2
    assert _seq_history(e2) == [1, 3]
    assert e1.sql("SELECT count(*) AS n FROM t").collect()[0].n == 2
    # time travel ignores the phantom: seq 3 is the latest anchor
    assert {r.id for r in e1.catalog.read("t", as_of_seq=3).collect()} == {1, 3}


def test_maintenance_folds_commit_files(spark, tmp_path):
    """OPTIMIZE/COMPACT fold the per-seq commit files into the legacy
    JSON map (bounding the directory) and timestamp travel still
    resolves afterwards."""
    e1, _ = _mk_pair(spark, tmp_path)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    e1.sql("INSERT INTO t VALUES (2, 'b')")
    spec = e1.catalog.get_table("t")
    commits_before = e1.catalog._load_commits(spec)
    assert sorted(commits_before) == [1, 2]
    e1.catalog.optimize("t")
    d = e1.catalog._commit_dir(spec)
    assert not os.path.isdir(d) or not os.listdir(d), "per-seq files folded"
    assert e1.catalog._load_commits(spec) == commits_before
    assert e1.catalog.resolve_timestamp("t", commits_before[1]) == 1
    # and the commit protocol keeps working after the fold
    e1.sql("INSERT INTO t VALUES (3, 'c')")
    assert sorted(e1.catalog._load_commits(spec)) == [1, 2, 3]


def test_commit_dir_folds_into_rollups(spark, tmp_path, monkeypatch):
    """Commit-dir growth is bounded WITHOUT exclusive access (r6): past
    COMMIT_FOLD_THRESHOLD finalized files they merge into one immutable
    rollup (O_EXCL create — one concurrent folder wins), per-seq files
    are deleted only after the rollup exists, and every consumer
    (allocation max, timestamp travel, DESCRIBE HISTORY) reads through
    the rollup."""
    e1, e2 = _mk_pair(spark, tmp_path)
    monkeypatch.setattr(type(e1.catalog), "COMMIT_FOLD_THRESHOLD", 4)
    for i in range(6):
        (e1 if i % 2 == 0 else e2).sql(f"INSERT INTO t VALUES ({i}, 'v{i}')")
    spec = e1.catalog.get_table("t")
    d = e1.catalog._commit_dir(spec)
    rollups = [f for f in os.listdir(d) if f.startswith("rollup-")]
    per_seq = [f for f in os.listdir(d) if f.partition(".")[0].isdigit()]
    assert rollups, "fold must have produced a rollup"
    assert len(per_seq) < 6, "folded per-seq files are gone"
    # every commit stamp survives the fold, from BOTH sessions
    for e in (e1, e2):
        commits = e.catalog._load_commits(spec)
        assert sorted(commits) == [1, 2, 3, 4, 5, 6]
    # allocation continues above the rollup (names-only max)
    e2.sql("INSERT INTO t VALUES (99, 'after')")
    assert sorted(e1.catalog._load_commits(spec)) == [1, 2, 3, 4, 5, 6, 7]
    assert _seq_history(e1) == [1, 2, 3, 4, 5, 6, 7]
    # timestamp travel resolves through the rollup
    ts = e1.catalog._load_commits(spec)[3]
    assert e2.catalog.resolve_timestamp("t", ts) == 3
    # maintenance folds absorb rollups into the legacy map
    e1.catalog.optimize("t")
    assert not [f for f in os.listdir(d) if f.startswith("rollup-")] if os.path.isdir(d) else True
    assert sorted(e1.catalog._load_commits(spec)) == [1, 2, 3, 4, 5, 6, 7]


# -- maintenance under the commit protocol (r7) ---------------------------


def test_insert_interleaved_with_optimize_threads(spark, tmp_path):
    """TRUE interleave: one session INSERTs in a loop from a thread
    while the other runs OPTIMIZE (dir swaps) — the maintenance marker
    + reservation-drain handshake must lose no rows, raise nothing,
    and keep the seq history consistent."""
    import threading

    e1, e2 = _mk_pair(spark, tmp_path)
    e1.sql("INSERT INTO t VALUES (0, 'seed')")
    errs = []

    def writer():
        try:
            for i in range(1, 9):
                e1.sql(f"INSERT INTO t VALUES ({i}, 'w{i}')")
        except Exception as exc:  # pragma: no cover - the assert below
            errs.append(exc)

    th = threading.Thread(target=writer)
    th.start()
    try:
        for _ in range(3):
            e2.catalog.optimize("t")
    finally:
        th.join()
    assert not errs, f"writer died during concurrent OPTIMIZE: {errs}"
    assert e2.sql("SELECT count(*) AS n FROM t").collect()[0].n == 9
    assert _seq_history(e1) == list(range(1, 10)), "no lost statements"
    spec = e1.catalog.get_table("t")
    d = e1.catalog._commit_dir(spec)
    leftover = (
        [f for f in os.listdir(d) if f.endswith(".inflight")]
        if os.path.isdir(d)
        else []
    )
    assert not leftover, f"markers/reservations must all release: {leftover}"


def test_insert_interleaved_with_auto_compaction(spark, tmp_path):
    """Cross-session auto-compaction (compaction.auto-after) vs a
    writer in another session: every row survives, the floor rises,
    reads agree in both sessions."""
    wh = str(tmp_path / "wh_autocompact")
    e1 = EngineSession(spark=spark, warehouse=wh)
    e1.sql(
        "CREATE TABLE t (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id)) "
        "WITH ('compaction.auto-after' = '3')"
    )
    e2 = EngineSession(spark=spark, warehouse=wh)
    for i in range(8):
        (e1 if i % 2 == 0 else e2).sql(f"INSERT INTO t VALUES ({i}, 'v{i}')")
    for e in (e1, e2):
        assert e.sql("SELECT count(*) AS n FROM t").collect()[0].n == 8
    spec = e1.catalog.get_table("t")
    assert e1.catalog._floor.get(spec.qualified_name, 0) >= 3, (
        "auto-compaction must have run at least once"
    )


def test_compact_aborts_cleanly_on_undrained_reservation(spark, tmp_path):
    """A fresh foreign writer reservation blocks maintenance: COMPACT
    waits, then aborts with ConcurrentWriteConflict having swapped
    nothing; after the reservation clears it succeeds."""
    import pytest

    e1, e2 = _mk_pair(spark, tmp_path)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    e1.sql("INSERT INTO t VALUES (1, 'b')")
    spec = e2.catalog.get_table("t")
    d = e2.catalog._commit_dir(spec)
    stray = os.path.join(d, f"{99:010d}.inflight")
    with open(stray, "x"):
        pass
    e2.catalog.MAINT_WAIT_SECS = 0.3
    with pytest.raises(ConcurrentWriteConflict, match="did not finalize"):
        e2.catalog.compact("t")
    # nothing swapped: full history still present
    assert _seq_history(e1) == [1, 2]
    assert not os.path.exists(e2.catalog._maint_marker_path(spec)), (
        "aborted maintenance must release its marker"
    )
    os.unlink(stray)
    e2.catalog.compact("t")
    assert e1.sql("SELECT v FROM t").collect()[0].v == "b"


def test_writer_yields_to_maintenance_marker(spark, tmp_path):
    """A fresh foreign maintenance marker blocks seq allocation: the
    writer waits, raises ConcurrentWriteConflict at the deadline having
    written nothing, and succeeds once the marker clears."""
    import json

    import pytest

    e1, e2 = _mk_pair(spark, tmp_path)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    spec = e1.catalog.get_table("t")
    marker = e1.catalog._maint_marker_path(spec)
    with open(marker, "x") as fh:
        json.dump({"token": "foreign-session", "ts": 0}, fh)
    e1.catalog.MAINT_WAIT_SECS = 0.3
    with pytest.raises(ConcurrentWriteConflict, match="maintenance"):
        e1.sql("INSERT INTO t VALUES (2, 'blocked')")
    assert _seq_history(e1) == [1], "nothing written under the marker"
    os.unlink(marker)
    e1.sql("INSERT INTO t VALUES (2, 'ok')")
    assert _seq_history(e1) == [1, 2]


def test_stale_maintenance_marker_is_reaped(spark, tmp_path):
    """A marker from a crashed maintenance session (mtime past
    MAINT_STALE_SECS) must not block writers forever: it is reaped and
    the INSERT proceeds."""
    import json

    e1, _ = _mk_pair(spark, tmp_path)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    spec = e1.catalog.get_table("t")
    marker = e1.catalog._maint_marker_path(spec)
    with open(marker, "x") as fh:
        json.dump({"token": "crashed-session", "ts": 0}, fh)
    old = 1.0  # epoch 1970: decisively stale
    os.utime(marker, (old, old))
    e1.sql("INSERT INTO t VALUES (2, 'b')")  # reaps and proceeds
    assert _seq_history(e1) == [1, 2]
    assert not os.path.exists(marker)


def test_live_owner_marker_is_never_reaped_by_age(spark, tmp_path):
    """A maintenance marker older than MAINT_STALE_SECS whose owner
    process is ALIVE must NOT be reaped — a big compaction legitimately
    running past the stale window would otherwise get writers appending
    under its swap (silent row loss).  The writer blocks and aborts
    cleanly instead."""
    import json

    e1, _ = _mk_pair(spark, tmp_path)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    spec = e1.catalog.get_table("t")
    marker = e1.catalog._maint_marker_path(spec)
    with open(marker, "x") as fh:
        # os.getpid(): provably-alive owner (this very process)
        json.dump({"token": "foreign", "pid": os.getpid(), "ts": 0}, fh)
    os.utime(marker, (1.0, 1.0))  # decisively stale by mtime
    e1.catalog.MAINT_WAIT_SECS = 0.3
    with pytest.raises(ConcurrentWriteConflict, match="maintenance"):
        e1.sql("INSERT INTO t VALUES (2, 'blocked')")
    assert os.path.exists(marker), "live-owner marker survived"
    assert _seq_history(e1) == [1]
    os.unlink(marker)


def test_dead_owner_marker_is_reaped(spark, tmp_path):
    """A stale marker whose recorded pid is provably dead is reaped and
    the writer proceeds (the crashed-maintenance recovery path)."""
    import json
    import subprocess

    e1, _ = _mk_pair(spark, tmp_path)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    spec = e1.catalog.get_table("t")
    marker = e1.catalog._maint_marker_path(spec)
    proc = subprocess.Popen(["true"])
    proc.wait()  # reaped: the pid no longer exists
    with open(marker, "x") as fh:
        json.dump({"token": "crashed", "pid": proc.pid, "ts": 0}, fh)
    os.utime(marker, (1.0, 1.0))
    e1.sql("INSERT INTO t VALUES (2, 'b')")
    assert _seq_history(e1) == [1, 2]
    assert not os.path.exists(marker)


def test_live_owner_reservation_blocks_maintenance_past_stale_window(
    spark, tmp_path
):
    """The drain loop must keep waiting on a reservation whose owner is
    alive even past MAINT_STALE_SECS (a >10-minute append job at real
    table sizes); maintenance aborts cleanly rather than swapping files
    out from under the live write."""
    e1, _ = _mk_pair(spark, tmp_path)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    spec = e1.catalog.get_table("t")
    d = e1.catalog._commit_dir(spec)
    stray = os.path.join(d, f"{99:010d}.inflight")
    with open(stray, "x") as fh:
        fh.write(str(os.getpid()))  # alive owner
    os.utime(stray, (1.0, 1.0))  # stale by mtime
    e1.catalog.MAINT_WAIT_SECS = 0.3
    with pytest.raises(ConcurrentWriteConflict, match="reservations"):
        e1.catalog.optimize("t")
    os.unlink(stray)
    # dead-owner stale reservation: ignored, maintenance proceeds
    import subprocess

    proc = subprocess.Popen(["true"])
    proc.wait()
    with open(stray, "x") as fh:
        fh.write(str(proc.pid))
    os.utime(stray, (1.0, 1.0))
    e1.catalog.MAINT_WAIT_SECS = 60.0
    e1.catalog.optimize("t")
    assert e1.sql("SELECT count(*) AS n FROM t").collect()[0].n == 1


def test_auto_compact_conflict_does_not_fail_statement(spark, tmp_path):
    """If auto-compaction cannot get its maintenance window (stray
    fresh reservation), the triggering INSERT must still succeed — the
    policy is best-effort, the statement is not."""
    wh = str(tmp_path / "wh_acskip")
    e1 = EngineSession(spark=spark, warehouse=wh)
    e1.sql(
        "CREATE TABLE t (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id)) "
        "WITH ('compaction.auto-after' = '1')"
    )
    e1.catalog.MAINT_WAIT_SECS = 0.3
    spec = e1.catalog.get_table("t")
    d = e1.catalog._commit_dir(spec)
    os.makedirs(d, exist_ok=True)
    stray = os.path.join(d, f"{50:010d}.inflight")
    with open(stray, "x"):
        pass
    e1.sql("INSERT INTO t VALUES (1, 'a')")  # compact skipped, no raise
    assert e1.sql("SELECT count(*) AS n FROM t").collect()[0].n == 1
    assert e1.catalog._floor.get(spec.qualified_name, 0) == 0, (
        "compaction was skipped under the undrained reservation"
    )


def test_commit_protocol_runs_through_locking_seam(spark, tmp_path):
    """r8 (VERDICT r7 item 9): every put-if-absent / delete / read /
    stat the protocol performs goes through catalog.locking — the seam
    an object-store backend (S3 conditional-PUT, GCS generation-match)
    implements.  An instrumented wrapper sees reservation creates on
    INSERT and marker creates on OPTIMIZE; nothing bypasses it."""
    from fluss_datafusion_spark.catalog.locking import LocalFSLocking

    class Counting(LocalFSLocking):
        def __init__(self):
            self.calls = {"put": [], "delete": 0, "read": 0, "stat": 0}

        def put_if_absent(self, path, data=b""):
            self.calls["put"].append(os.path.basename(path))
            return super().put_if_absent(path, data)

        def delete(self, path):
            self.calls["delete"] += 1
            return super().delete(path)

        def read(self, path):
            self.calls["read"] += 1
            return super().read(path)

        def stat_mtime(self, path):
            self.calls["stat"] += 1
            return super().stat_mtime(path)

    wh = str(tmp_path / "wh_seam")
    e = EngineSession(spark=spark, warehouse=wh)
    lk = Counting()
    e.catalog.locking = lk
    e.sql("CREATE TABLE t (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO t VALUES (1, 'a')")
    e.sql("INSERT INTO t VALUES (2, 'b')")
    assert [p for p in lk.calls["put"] if p.endswith(".inflight")], (
        "writer reservations must go through the seam"
    )
    puts_before = len(lk.calls["put"])
    e.catalog.optimize("t")
    marker_puts = [
        p for p in lk.calls["put"][puts_before:] if "maintenance" in p
    ]
    assert marker_puts, "the maintenance marker must go through the seam"
    assert lk.calls["delete"] >= 1, "releases/reaps must go through the seam"
    assert e.sql("SELECT count(*) AS n FROM t").collect()[0].n == 2
