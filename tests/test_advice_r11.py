"""ADVICE r10 regression tests: the spec lock's thread-exclusivity and
deadline liveness, the check-constraint validation scan moved OUTSIDE
the (heartbeat-less) spec window, and _parallel_writes exception
chaining.  The fifth item — string node ids through the driver-local
union-find — lives with the graph tests
(test_graph.py::test_connected_components_string_ids_local_regime)."""

import threading

import pytest

from fluss_datafusion_spark import ConcurrentWriteConflict, EngineSession


def _engine(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh"))
    e.sql("CREATE TABLE at (id BIGINT NOT NULL, v BIGINT, PRIMARY KEY (id))")
    e.sql("INSERT INTO at VALUES (1, 5), (2, 50)")
    return e


def test_spec_lock_excludes_other_threads_of_same_session(spark, tmp_path):
    """qname-only depth keying made the spec lock re-entrant ACROSS
    threads of one session — a _parallel_writes worker mutating the
    same table's spec would silently ride the main thread's window.
    Depth now keys by (thread ident, qname): another thread contends
    like another session."""
    e = _engine(spark, tmp_path)
    e.catalog.MAINT_WAIT_SECS = 0.3
    spec = e.catalog.get_table("at")
    outcome = {}

    def worker():
        try:
            with e.catalog._spec_mutation(spec):
                outcome["entered"] = True
        except ConcurrentWriteConflict:
            outcome["conflict"] = True

    with e.catalog._spec_mutation(spec):
        t = threading.Thread(target=worker)
        t.start()
        t.join(timeout=10)
    assert outcome == {"conflict": True}
    # same thread still re-enters (nested helpers ride the outer window)
    with e.catalog._spec_mutation(spec):
        with e.catalog._spec_mutation(spec):
            pass
    # and after release another thread acquires cleanly
    outcome.clear()
    t = threading.Thread(target=worker)
    t.start()
    t.join(timeout=10)
    assert outcome == {"entered": True}


def test_spec_lock_deadline_fires_even_when_marker_flaps(spark, tmp_path):
    """The acquisition loop's `mtime is None` and reap branches used to
    `continue` past the deadline check — a marker repeatedly
    created/deleted by other sessions could spin a waiter forever.  The
    deadline is now checked first each iteration."""
    e = _engine(spark, tmp_path)
    e.catalog.MAINT_WAIT_SECS = 0.3
    spec = e.catalog.get_table("at")

    class FlappingLocking:
        def __init__(self, inner):
            self._inner = inner

        def put_if_absent(self, path, payload):
            return False  # always "just taken by someone else"

        def stat_mtime(self, path):
            return None  # always "released between put and stat"

        def __getattr__(self, name):
            return getattr(self._inner, name)

    real = e.catalog.locking
    e.catalog.locking = FlappingLocking(real)
    try:
        with pytest.raises(ConcurrentWriteConflict):
            with e.catalog._spec_mutation(spec):
                pass
    finally:
        e.catalog.locking = real


def test_check_constraint_validation_scan_runs_outside_spec_lock(
    spark, tmp_path
):
    """The spec marker has no heartbeat, so a table-sized validation
    scan inside the window could outlive the staleness reap and let a
    concurrent DDL be clobbered.  The scan now runs BEFORE acquisition:
    a failing ADD CONSTRAINT never touches the lock at all, and a
    passing one acquires it only for the name re-check + save."""
    e = _engine(spark, tmp_path)
    puts = []
    real_put = e.catalog.locking.put_if_absent

    def spy_put(path, payload):
        puts.append(path)
        return real_put(path, payload)

    e.catalog.locking.put_if_absent = spy_put
    try:
        with pytest.raises(ValueError, match="violate"):
            e.sql("ALTER TABLE at ADD CONSTRAINT v_big CHECK (v > 10)")
        assert not [p for p in puts if "spec.lock" in p], (
            "validation failure must not have acquired the spec lock"
        )
        e.sql("ALTER TABLE at ADD CONSTRAINT v_pos CHECK (v > 0)")
        assert [p for p in puts if "spec.lock" in p], (
            "the save itself still runs under the spec lock"
        )
    finally:
        e.catalog.locking.put_if_absent = real_put
    # enforcement behaves as ever
    with pytest.raises(Exception):
        e.sql("INSERT INTO at VALUES (3, -1)")
    # duplicate-name refusal survives the restructure (re-checked
    # both before the scan and inside the window)
    with pytest.raises(ValueError, match="already exists"):
        e.sql("ALTER TABLE at ADD CONSTRAINT v_pos CHECK (v > 0)")


def test_parallel_writes_chains_secondary_failures():
    from fluss_datafusion_spark.operators.incremental import (
        _parallel_writes,
    )

    def boom_a():
        raise RuntimeError("primary")

    def boom_b():
        raise ValueError("secondary")

    with pytest.raises(Exception) as exc_info:
        _parallel_writes(boom_a, boom_b)
    primary = exc_info.value
    # both diagnostics survive: the second failure rides as __cause__
    assert primary.__cause__ is not None
    msgs = {str(primary), str(primary.__cause__)}
    assert msgs == {"primary", "secondary"}
    # single-failure path unchanged (no spurious chaining)
    with pytest.raises(RuntimeError) as ei:
        _parallel_writes(boom_a, lambda: None)
    assert ei.value.__cause__ is None
