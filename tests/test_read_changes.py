"""Bounded incremental changelog (catalog.read_changes — CDF analog).

Hard signals: the slice between two anchors equals the full changelog
filtered to that window (with exact -U pre-images from BEFORE the
window); consecutive windows partition the full changelog; replaying a
window on top of the from-state reproduces the to-state; compaction
floor refusal."""

import pytest

from fluss_datafusion_spark import EngineSession


@pytest.fixture()
def engine(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_cdc"))
    e.sql("CREATE TABLE kv (k BIGINT NOT NULL, v STRING, PRIMARY KEY (k))")
    return e


def _ops(df):
    return sorted(
        (r.op, r.change_seq, r.k, r.v) for r in df.collect()
    )


def test_changes_between_anchors(engine):
    e = engine
    e.sql("INSERT INTO kv VALUES (1, 'a'), (2, 'b')")
    a1 = e.catalog.current_seq("kv")
    e.sql("INSERT INTO kv VALUES (2, 'b2'), (3, 'c')")
    a2 = e.catalog.current_seq("kv")
    e.sql("DELETE FROM kv WHERE k = 1")
    a3 = e.catalog.current_seq("kv")

    got = _ops(e.catalog.read_changes("kv", a1, a2))
    assert got == [
        ("+I", a2, 3, "c"),
        ("+U", a2, 2, "b2"),
        ("-U", a2, 2, "b"),  # pre-image from BEFORE the window
    ]
    got = _ops(e.catalog.read_changes("kv", a2))
    assert got == [("-D", a3, 1, "a")]
    # empty window
    assert e.catalog.read_changes("kv", a3).count() == 0


def test_windows_partition_full_changelog(engine):
    e = engine
    anchors = [0]
    e.sql("INSERT INTO kv VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    anchors.append(e.catalog.current_seq("kv"))
    e.sql("UPDATE kv SET v = v || '!' WHERE k >= 2")
    anchors.append(e.catalog.current_seq("kv"))
    e.sql("DELETE FROM kv WHERE k = 3")
    anchors.append(e.catalog.current_seq("kv"))
    e.sql("INSERT INTO kv VALUES (3, 'c2')")  # re-insert after delete
    anchors.append(e.catalog.current_seq("kv"))

    full = _ops(e.catalog.read_changelog("kv"))
    pieces = []
    for lo, hi in zip(anchors, anchors[1:]):
        pieces.extend(_ops(e.catalog.read_changes("kv", lo, hi)))
    assert sorted(pieces) == full


def test_replaying_window_reproduces_state(engine):
    e = engine
    e.sql("INSERT INTO kv VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    a1 = e.catalog.current_seq("kv")
    e.sql("INSERT INTO kv VALUES (1, 'a2'), (4, 'd')")
    e.sql("DELETE FROM kv WHERE k = 2")
    a2 = e.catalog.current_seq("kv")

    state = {r.k: r.v for r in e.catalog.read("kv", as_of_seq=a1).collect()}
    changes = e.catalog.read_changes("kv", a1, a2).collect()
    # apply in (change_seq, change_sub) order: -U is retraction noise
    # for a consumer materializing a dict; +U/+I set, -D removes
    for r in sorted(changes, key=lambda r: (r.change_seq, r.change_sub)):
        if r.op in ("+I", "+U"):
            state[r.k] = r.v
        elif r.op == "-D":
            state.pop(r.k, None)
    want = {r.k: r.v for r in e.catalog.read("kv", as_of_seq=a2).collect()}
    assert state == want


def test_floor_refusal_and_bad_range(engine):
    e = engine
    e.sql("INSERT INTO kv VALUES (1, 'a')")
    a1 = e.catalog.current_seq("kv")
    e.sql("INSERT INTO kv VALUES (1, 'a2')")
    e.catalog.compact("kv")
    floor = e.catalog.current_seq("kv")
    with pytest.raises(ValueError, match="compaction"):
        e.catalog.read_changes("kv", a1)
    with pytest.raises(ValueError, match="from_seq"):
        e.catalog.read_changes("kv", floor + 5, floor + 1)
    # from the floor itself: exact (post-compaction writes only)
    e.sql("INSERT INTO kv VALUES (2, 'b')")
    got = _ops(e.catalog.read_changes("kv", floor))
    assert [(op, k, v) for op, _s, k, v in got] == [("+I", 2, "b")]


def test_log_table_refused(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_cdc_log"))
    e.sql("CREATE TABLE logs (x BIGINT)")
    with pytest.raises(ValueError, match="primary-key"):
        e.catalog.read_changes("logs", 0)


def test_changes_system_table_sql(engine):
    e = engine
    e.sql("INSERT INTO kv VALUES (1, 'a'), (2, 'b')")
    a1 = e.catalog.current_seq("kv")
    e.sql("INSERT INTO kv VALUES (2, 'b2'), (3, 'c')")
    a2 = e.catalog.current_seq("kv")
    e.sql("DELETE FROM kv WHERE k = 3")

    rows = sorted(
        (r.op, r.k, r.v)
        for r in e.sql(
            f"SELECT op, k, v FROM kv$changes({a1}, {a2})"
        ).collect()
    )
    assert rows == [("+I", 3, "c"), ("+U", 2, "b2"), ("-U", 2, "b")]
    # open-ended form + projection/aggregation over the bound view
    n = e.sql(
        f"SELECT count(*) AS n FROM kv$changes({a2}) WHERE op = '-D'"
    ).collect()[0]["n"]
    assert n == 1
