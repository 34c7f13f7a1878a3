"""Type-2 slowly-changing dimensions (operators/temporal.py —
scd2_versions / scd2_history): the engine PK table's own log folded
into (valid_from, valid_to, is_current, version) interval rows, with
no-op-write suppression, delete-close, and rebirth semantics."""

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.operators.temporal import (
    scd2_history,
    scd2_versions,
)


@pytest.fixture()
def scd_session(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_scd2"))
    e.sql(
        "CREATE TABLE sdim (k BIGINT NOT NULL, attr STRING, note STRING,"
        " PRIMARY KEY (k))"
    )
    return e


def _by_key(rows):
    out = {}
    for r in rows:
        out.setdefault(r.k, []).append(r)
    for versions in out.values():
        versions.sort(key=lambda r: r["__version__"])
    return out


def test_scd2_basic_lifecycle(scd_session):
    e = scd_session
    e.sql("INSERT INTO sdim VALUES (1, 'a', 'n'), (2, 'x', 'n')")  # seq 1
    e.sql("INSERT INTO sdim VALUES (1, 'b', 'n')")                 # seq 2
    rows = _by_key(scd2_history(e.catalog, "sdim").collect())
    v1, v2 = rows[1]
    assert (v1.attr, v1["__valid_from_seq__"], v1["__valid_to_seq__"]) == ("a", 1, 2)
    assert v1["__is_current__"] is False and v1["__version__"] == 1
    assert (v2.attr, v2["__valid_from_seq__"], v2["__valid_to_seq__"]) == ("b", 2, None)
    assert v2["__is_current__"] is True and v2["__version__"] == 2
    (only,) = rows[2]
    assert only["__is_current__"] is True and only["__version__"] == 1
    # ts anchors ride along and are ordered like the seq anchors
    assert v1["__valid_from_ts__"] <= v2["__valid_from_ts__"]
    assert v1["__valid_to_ts__"] == v2["__valid_from_ts__"]


def test_scd2_identical_rewrite_suppressed(scd_session):
    e = scd_session
    e.sql("INSERT INTO sdim VALUES (1, 'a', 'n')")   # seq 1
    e.sql("UPDATE sdim SET attr = attr")             # seq 2: no-op rewrite
    e.sql("INSERT INTO sdim VALUES (1, 'a', 'n')")   # seq 3: identical upsert
    rows = _by_key(scd2_history(e.catalog, "sdim").collect())
    (only,) = rows[1]
    assert only["__version__"] == 1 and only["__is_current__"] is True
    assert only["__valid_from_seq__"] == 1


def test_scd2_delete_closes_and_rebirth_reopens(scd_session):
    e = scd_session
    e.sql("INSERT INTO sdim VALUES (1, 'a', 'n')")   # seq 1
    e.sql("DELETE FROM sdim WHERE k = 1")            # seq 2
    e.sql("INSERT INTO sdim VALUES (1, 'a', 'n')")   # seq 3: same values!
    rows = _by_key(scd2_history(e.catalog, "sdim").collect())
    v1, v2 = rows[1]
    # the delete closed v1 at its own seq; no tombstone row is emitted
    assert v1["__valid_to_seq__"] == 2 and v1["__is_current__"] is False
    # rebirth opens a NEW version even though the attributes match
    assert v2["__valid_from_seq__"] == 3 and v2["__is_current__"] is True
    assert v2["__version__"] == 2
    # a key that ends deleted has no current version at all
    e.sql("DELETE FROM sdim WHERE k = 1")            # seq 4
    rows = _by_key(scd2_history(e.catalog, "sdim").collect())
    assert all(not r["__is_current__"] for r in rows[1])
    assert rows[1][-1]["__valid_to_seq__"] == 4


def test_scd2_untracked_column_changes_ignored(scd_session):
    e = scd_session
    e.sql("INSERT INTO sdim VALUES (1, 'a', 'note0')")   # seq 1
    e.sql("UPDATE sdim SET note = 'note1'")              # seq 2: untracked
    e.sql("UPDATE sdim SET attr = 'b'")                  # seq 3: tracked
    rows = _by_key(
        scd2_history(e.catalog, "sdim", track_cols=["attr"]).collect()
    )
    v1, v2 = rows[1]
    # the note-only write opened nothing; v1 reports the opener's note
    assert (v1.attr, v1.note, v1["__valid_to_seq__"]) == ("a", "note0", 3)
    assert (v2.attr, v2["__valid_from_seq__"]) == ("b", 3)


def test_scd2_kernel_on_plain_frames(spark):
    # the kernel is catalog-free: any (key, seq, payload, tombstone)
    # version feed folds — here a Debezium-shaped stream reduced to it
    hist = spark.createDataFrame(
        [
            (1, 10, "a", False),
            (1, 20, "a", False),   # suppressed
            (1, 30, "b", False),
            (2, 10, "x", False),
            (2, 15, None, True),   # delete
            (3, 5, None, True),    # leading tombstone: anchors nothing
        ],
        "k int, s int, attr string, dead boolean",
    )
    out = scd2_versions(
        hist,
        keys=["k"],
        seq_col="s",
        ts_col=None,
        tombstone_col="dead",
    )
    rows = _by_key(out.collect())
    assert [(r.attr, r.s, r["__valid_to_seq__"]) for r in rows[1]] == [
        ("a", 10, 30),
        ("b", 30, None),
    ]
    assert [(r.s, r["__valid_to_seq__"], r["__is_current__"]) for r in rows[2]] == [
        (10, 15, False)
    ]
    assert 3 not in rows
    assert "__valid_from_ts__" not in out.columns


def test_scd2_null_attribute_transitions(spark):
    # NULL -> value and value -> NULL are real changes; NULL -> NULL is not
    hist = spark.createDataFrame(
        [(1, 1, None, False), (1, 2, None, False), (1, 3, "v", False),
         (1, 4, None, False)],
        "k int, s int, attr string, dead boolean",
    )
    out = scd2_versions(hist, ["k"], seq_col="s", ts_col=None, tombstone_col="dead")
    rows = _by_key(out.collect())
    assert [(r.attr, r.s) for r in rows[1]] == [(None, 1), ("v", 3), (None, 4)]


# -- property: kernel vs a brute-force reference ------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_event = st.one_of(
    st.none(),                       # tombstone
    st.sampled_from(["a", "b"]),     # attribute value
)


def _ref_scd2(events):
    """Brute-force reference: walk the (seq, value_or_None) stream and
    emit (value, vf, vt, cur, ver) rows by the documented rules."""
    versions = []  # [value, vf, vt]
    alive = False
    cur_val = object()
    for seq, val in events:
        if val is None:
            if alive:
                versions[-1][2] = seq
                alive = False
        else:
            if not alive or val != cur_val:
                if alive:
                    versions[-1][2] = seq
                versions.append([val, seq, None])
                alive = True
                cur_val = val
    return [
        (v, vf, vt, vt is None, i + 1)
        for i, (v, vf, vt) in enumerate(versions)
    ]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    seqs=st.lists(
        st.tuples(st.integers(0, 2), _event), min_size=1, max_size=12
    )
)
def test_scd2_kernel_matches_reference(spark, seqs):
    rows = []
    per_key = {}
    for i, (key, val) in enumerate(seqs):
        seq = i + 1
        per_key.setdefault(key, []).append((seq, val))
        rows.append((key, seq, val, val is None))
    hist = spark.createDataFrame(
        rows, "k int, s int, attr string, dead boolean"
    )
    out = scd2_versions(hist, ["k"], seq_col="s", ts_col=None, tombstone_col="dead")
    got = {}
    for r in out.collect():
        got.setdefault(r.k, []).append(
            (r.attr, r.s, r["__valid_to_seq__"], r["__is_current__"], r["__version__"])
        )
    for k in got:
        got[k].sort(key=lambda t: t[4])
    want = {
        k: _ref_scd2(evs)
        for k, evs in per_key.items()
        if _ref_scd2(evs)
    }
    assert got == want
