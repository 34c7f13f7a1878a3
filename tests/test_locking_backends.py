"""The commit protocol parametrized over locking backends (VERDICT r8
item 9): the same seq-allocation, conflict-detection, maintenance- and
publish-exclusion properties must hold whether the put-if-absent
namespace is POSIX O_EXCL (LocalFSLocking) or a shared non-posix store
with heartbeat-only liveness (InMemoryLocking — the object-store test
double with injectable failures).  Proves the seam is real: nothing in
the protocol silently assumes reservations are visible as files."""

import os
import threading
import time

import pytest

from fluss_datafusion_spark import ConcurrentWriteConflict, EngineSession
from fluss_datafusion_spark.catalog.locking import (
    InMemoryLocking,
    LocalFSLocking,
)

BACKENDS = [LocalFSLocking, InMemoryLocking]


def _pair(spark, tmp_path, backend_cls):
    """Two sessions over ONE warehouse sharing ONE backend instance —
    the way two sessions share one object store."""
    wh = str(tmp_path / "wh")
    shared = backend_cls()
    e1 = EngineSession(spark=spark, warehouse=wh)
    e1.catalog.locking = shared
    e1.sql("CREATE TABLE t (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e2 = EngineSession(spark=spark, warehouse=wh)
    e2.catalog.locking = shared
    return e1, e2, shared


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_interleaved_inserts_never_share_a_seq(spark, tmp_path, backend_cls):
    e1, e2, _ = _pair(spark, tmp_path, backend_cls)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    e2.sql("INSERT INTO t VALUES (2, 'b')")
    e1.sql("INSERT INTO t VALUES (3, 'c')")
    seqs = sorted(
        r["__seq__"]
        for r in e1.sql("SELECT DISTINCT __seq__ FROM t$history").collect()
    )
    assert seqs == [1, 2, 3]


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_rmw_conflict_detected_before_any_write(spark, tmp_path, backend_cls):
    e1, e2, _ = _pair(spark, tmp_path, backend_cls)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    cat = e2.catalog
    spec = cat.get_table("t")
    # e2 read its snapshot at seq 1; e1 commits seq 2 underneath
    base = cat._committed_seq(spec)
    e1.sql("INSERT INTO t VALUES (2, 'b')")
    with pytest.raises(ConcurrentWriteConflict):
        cat._reserve_seqs(spec, 1, expect_base=base)
    # nothing was reserved: the next allocation is exactly seq 3
    assert cat._reserve_seqs(spec, 1) == [3]
    cat._release_seqs(spec, [3])


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_lost_put_race_retries_and_converges(spark, tmp_path, backend_cls):
    """A lost conditional PUT (contention / 412) must retry, never
    double-allocate and never give up.  Lost races advance past the
    contended seq (the competitor may be mid-write), so they become
    history GAPS — the documented _release_seqs contract — and the
    counter stays monotone."""
    e1, _e2, shared = _pair(spark, tmp_path, backend_cls)
    cat = e1.catalog
    spec = cat.get_table("t")
    lost = 0
    if isinstance(shared, InMemoryLocking):
        lost = 2
        shared.fail_put(lost)  # lose the race twice
    got = cat._reserve_seqs(spec, 1)
    assert got == [1 + lost]
    cat._release_seqs(spec, got)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    assert e1.sql("SELECT count(*) AS n FROM t").collect()[0].n == 1
    seqs = [
        r["__seq__"]
        for r in e1.sql("SELECT DISTINCT __seq__ FROM t$history").collect()
    ]
    assert seqs == [2 + lost]  # monotone past the gap


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_maintenance_excludes_writers(spark, tmp_path, backend_cls):
    """Marker up -> a foreign reservation waits (Dekker); reservation up
    -> maintenance drains it before swapping."""
    e1, e2, _ = _pair(spark, tmp_path, backend_cls)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    cat1, cat2 = e1.catalog, e2.catalog
    spec1, spec2 = cat1.get_table("t"), cat2.get_table("t")

    # writer reservation in flight -> OPTIMIZE waits for the drain
    got = cat2._reserve_seqs(spec2, 1)
    done = {}

    def _opt():
        done["t0"] = time.monotonic()
        cat1.optimize("t")
        done["t1"] = time.monotonic()

    th = threading.Thread(target=_opt)
    th.start()
    time.sleep(0.3)
    assert "t1" not in done, "maintenance must wait on the reservation"
    cat2._record_commit(spec2, got[0])
    th.join(timeout=30)
    assert "t1" in done and done["t1"] - done["t0"] >= 0.25

    # marker up -> the foreign session's reservation waits
    with cat1._maintenance_lock(spec1):
        res = {}

        def _reserve():
            res["got"] = cat2._reserve_seqs(spec2, 1)

        th2 = threading.Thread(target=_reserve)
        th2.start()
        time.sleep(0.3)
        assert "got" not in res, "writer must yield to the marker"
    th2.join(timeout=30)
    assert "got" in res
    cat2._release_seqs(spec2, res["got"])


def test_heartbeat_staleness_reaps_without_liveness(spark, tmp_path):
    """InMemoryLocking's owner_alive is always unknown (object-store
    semantics): a marker whose mtime is stale is reaped on age alone —
    the heartbeat contract — while a FRESH marker still blocks."""
    e1, e2, shared = _pair(spark, tmp_path, InMemoryLocking)
    cat1, cat2 = e1.catalog, e2.catalog
    spec2 = cat2.get_table("t")
    marker = cat1._maint_marker_path(cat1.get_table("t"))
    assert shared.put_if_absent(marker, b'{"pid": 999999, "ts": 0}')
    assert cat2._maintenance_inflight(spec2) is True  # fresh: blocks
    shared.backdate(marker, cat2.MAINT_STALE_SECS + 5)
    assert cat2._maintenance_inflight(spec2) is False  # stale: reaped
    assert shared.stat_mtime(marker) is None  # physically gone


def test_transient_storage_errors_do_not_corrupt(spark, tmp_path):
    """Injected transient list/stat failures degrade like the LocalFS
    OSError paths: statements still commit, seqs stay monotone."""
    e1, _e2, shared = _pair(spark, tmp_path, InMemoryLocking)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    shared.fail_op("stat_mtime", 1)
    shared.fail_op("list_names", 1)
    e1.sql("INSERT INTO t VALUES (2, 'b')")
    e1.sql("INSERT INTO t VALUES (3, 'c')")
    seqs = sorted(
        r["__seq__"]
        for r in e1.sql("SELECT DISTINCT __seq__ FROM t$history").collect()
    )
    assert seqs == [1, 2, 3]


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_branch_protocol_through_backend(spark, tmp_path, backend_cls):
    """Branch seq reservations, the publish lock, and fast_forward all
    ride the seam: a full branch lifecycle works over either backend
    and leaves no stray reservations behind."""
    e1, _e2, shared = _pair(spark, tmp_path, backend_cls)
    e1.sql("INSERT INTO t VALUES (1, 'a')")
    e1.sql("ALTER TABLE t CREATE BRANCH dev")
    # a session attaching AFTER the branch DDL sees it (specs load at
    # attach; live-session spec reload is a separate concern) and its
    # branch writes contend through the SAME shared backend
    e2 = EngineSession(spark=spark, warehouse=e1.catalog.warehouse)
    e2.catalog.locking = shared
    e1.sql("INSERT INTO t$branch('dev') VALUES (2, 'b')")
    e2.sql("INSERT INTO t$branch('dev') VALUES (3, 'c')")
    got = sorted(
        tuple(r)
        for r in e1.sql("SELECT id, v FROM t$branch('dev')").collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    ff = e1.sql("ALTER TABLE t FAST FORWARD BRANCH dev").collect()[0]
    assert ff.advanced_to == 3
    assert sorted(
        tuple(r) for r in e1.sql("SELECT id, v FROM t").collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]
    if isinstance(shared, InMemoryLocking):
        # no reservation or marker left behind in the lock namespace
        stray = [
            p for p in shared._entries if p.endswith(".inflight")
        ]
        assert stray == []
