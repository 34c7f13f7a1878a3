"""r12 (VERDICT r11 item 6): the spec lock heartbeats for the whole
window, so a maintenance dir-swap outliving MAINT_STALE_SECS on a
liveness-unknown backend (owner pid unresolvable) is never reaped
mid-hold — a concurrent DDL waits or conflicts, it does not clobber."""

import os
import threading
import time

import pytest

from fluss_datafusion_spark import ConcurrentWriteConflict, EngineSession


class _UnknownLiveness:
    """Locking wrapper simulating an object-store backend: pid liveness
    is undecidable, so mtime staleness alone governs reaping."""

    def __init__(self, inner, with_touch=True):
        self._inner = inner
        if not with_touch:
            self.touch = None  # getattr(..., "touch", None) -> None

    def owner_alive(self, pid):
        return None

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _marker_path(e, name):
    spec = e.catalog.get_table(name)
    path = e.catalog.table_path(spec)
    return os.path.join(
        os.path.dirname(path), f".{os.path.basename(path)}.spec.lock"
    )


@pytest.mark.parametrize("with_touch", [True, False])
def test_long_spec_hold_survives_concurrent_ddl(
    spark, tmp_path, with_touch
):
    wh = str(tmp_path / f"wh_{with_touch}")
    a = EngineSession(spark=spark, warehouse=wh)
    a.sql("CREATE TABLE hb (k BIGINT NOT NULL, v BIGINT, PRIMARY KEY (k))")
    b = EngineSession(spark=spark, warehouse=wh)
    for e in (a, b):
        e.catalog.MAINT_STALE_SECS = 0.3
        e.catalog.PUBLISH_HEARTBEAT_SECS = 0.05
        e.catalog.MAINT_WAIT_SECS = 0.2
        e.catalog.locking = _UnknownLiveness(
            e.catalog.locking, with_touch=with_touch
        )

    marker = _marker_path(a, "hb")
    spec = a.catalog.get_table("hb")
    b_outcome = {}

    def b_ddl(tag):
        try:
            b.sql(f"ALTER TABLE hb CREATE TAG {tag}")
            b_outcome["entered_at"] = time.time()
        except ConcurrentWriteConflict:
            b_outcome["conflict"] = True

    with a.catalog._spec_mutation(spec):
        t0 = time.time()
        # hold well past MAINT_STALE_SECS, with B contending mid-hold
        time.sleep(0.4)
        t = threading.Thread(target=b_ddl, args=("raced",))
        t.start()
        t.join(timeout=10)
        held_until = time.time()
        mtime = a.catalog.locking.stat_mtime(marker)
        if with_touch:
            # heartbeat kept the marker fresh: B conflicted, the
            # marker is young, and the window completed undisturbed
            assert b_outcome == {"conflict": True}
            assert mtime is not None
            assert held_until - mtime < 0.3, "heartbeat must refresh mtime"
        else:
            # control (the pre-r12 hazard): without touch the stale
            # marker is reaped mid-hold and B's DDL enters the window
            assert "entered_at" in b_outcome
            assert b_outcome["entered_at"] < held_until
        _ = t0
    # after release, B's DDL goes through cleanly in both modes
    b_outcome.clear()
    b_ddl("after")
    assert "entered_at" in b_outcome
    tags = {r.tag_name for r in b.sql("SHOW TAGS hb").collect()}
    assert "after" in tags
