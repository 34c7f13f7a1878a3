"""Timestamp-based time travel (read(as_of_ts=...) / t$at('...')):
per-statement commit stamps resolve wall-clock anchors to seq anchors,
survive optimize/compact/clone, and respect the compaction floor."""

import datetime
import time

import pytest

from fluss_datafusion_spark import EngineSession


def _mk(spark, tmp_path, name):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / name))
    e.sql("CREATE TABLE t (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    return e


def _rows(df):
    return sorted((r.id, r.v) for r in df.collect())


def test_as_of_ts_resolves_between_statements(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_ts1")
    t0 = time.time()
    e.sql("INSERT INTO t VALUES (1, 'a')")
    time.sleep(0.05)
    t1 = time.time()
    time.sleep(0.05)
    e.sql("INSERT INTO t VALUES (1, 'a2'), (2, 'b')")
    t2 = time.time()

    assert _rows(e.catalog.read("t", as_of_ts=t1)) == [(1, "a")]
    assert _rows(e.catalog.read("t", as_of_ts=t2)) == [(1, "a2"), (2, "b")]
    # datetime and ISO-string forms (naive = UTC)
    iso = datetime.datetime.fromtimestamp(
        t1, tz=datetime.timezone.utc
    ).replace(tzinfo=None).isoformat()
    assert _rows(e.catalog.read("t", as_of_ts=iso)) == [(1, "a")]
    got = _rows(e.sql(f"SELECT id, v FROM t$at('{iso}')"))
    assert got == [(1, "a")]

    with pytest.raises(ValueError, match="no commit"):
        e.catalog.resolve_timestamp("t", t0)
    with pytest.raises(ValueError, match="not both"):
        e.catalog.read("t", as_of_seq=1, as_of_ts=t1)


def test_as_of_ts_survives_optimize_and_clone(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_ts2")
    e.sql("INSERT INTO t VALUES (1, 'a')")
    time.sleep(0.05)
    t1 = time.time()
    time.sleep(0.05)
    e.sql("INSERT INTO t VALUES (2, 'b')")
    e.catalog.optimize("t")  # dir swap must carry _commits.json
    assert _rows(e.catalog.read("t", as_of_ts=t1)) == [(1, "a")]
    e.sql("CREATE TABLE t2 CLONE t")  # commit stamps carry to the clone
    assert _rows(e.catalog.read("t2", as_of_ts=t1)) == [(1, "a")]


def test_as_of_ts_respects_compaction_floor(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_ts3")
    e.sql("INSERT INTO t VALUES (1, 'a')")
    time.sleep(0.05)
    t1 = time.time()
    time.sleep(0.05)
    e.sql("INSERT INTO t VALUES (1, 'a2')")
    e.catalog.compact("t")
    # the anchor resolves to a pre-floor seq -> refused, like read(as_of_seq)
    with pytest.raises(ValueError, match="compaction"):
        e.catalog.read("t", as_of_ts=t1).collect()
    # post-compaction commits keep resolving
    e.sql("INSERT INTO t VALUES (3, 'c')")
    assert (3, "c") in _rows(e.catalog.read("t", as_of_ts=time.time()))


def test_restore_to_timestamp(spark, tmp_path):
    """RESTORE TABLE ... TO TIMESTAMP AS OF '<ts>' resolves the stamp
    and rolls forward a new statement with the historical state."""
    e = _mk(spark, tmp_path, "wh_ts4")
    e.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    time.sleep(0.05)
    t1 = time.time()
    time.sleep(0.05)
    e.sql("INSERT INTO t VALUES (1, 'a2'), (3, 'c')")
    e.sql("DELETE FROM t WHERE id = 2")
    iso = datetime.datetime.fromtimestamp(
        t1, tz=datetime.timezone.utc
    ).replace(tzinfo=None).isoformat()
    e.sql(f"RESTORE TABLE t TO TIMESTAMP AS OF '{iso}'")
    assert _rows(e.sql("SELECT * FROM t")) == [(1, "a"), (2, "b")]
    # restore is a NEW statement: pre-restore state is still anchored
    assert (3, "c") in _rows(e.catalog.read("t", as_of_seq=2))


def test_inline_version_as_of_sql(spark, tmp_path):
    """Delta's `FROM t VERSION AS OF n` inline spelling rewrites onto
    the t$v<n> system view (session._rewrite_time_travel)."""
    e = _mk(spark, tmp_path, "wh_ts5")
    e.sql("INSERT INTO t VALUES (1, 'a')")
    e.sql("INSERT INTO t VALUES (1, 'a2'), (2, 'b')")
    assert _rows(e.sql("SELECT * FROM t VERSION AS OF 1")) == [(1, "a")]
    assert _rows(e.sql("SELECT * FROM t VERSION AS OF 2")) == [(1, "a2"), (2, "b")]
    # joins between two anchors of the same table
    n = e.sql(
        "SELECT count(*) AS n FROM t VERSION AS OF 1 a"
        " JOIN t VERSION AS OF 2 b ON a.id = b.id"
    ).collect()[0].n
    assert n == 1


def test_inline_timestamp_as_of_sql(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_ts6")
    e.sql("INSERT INTO t VALUES (1, 'a')")
    time.sleep(0.05)
    t1 = time.time()
    time.sleep(0.05)
    e.sql("INSERT INTO t VALUES (2, 'b')")
    iso = datetime.datetime.fromtimestamp(
        t1, tz=datetime.timezone.utc
    ).replace(tzinfo=None).isoformat()
    assert _rows(e.sql(f"SELECT * FROM t TIMESTAMP AS OF '{iso}'")) == [(1, "a")]
    assert _rows(e.sql(f"SELECT * FROM t FOR SYSTEM_TIME AS OF '{iso}'")) == [(1, "a")]
    # unknown tables pass through untouched (no rewrite, normal error)
    with pytest.raises(Exception):
        e.sql("SELECT * FROM no_such_table VERSION AS OF 1").collect()


def test_describe_history(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_ts7")
    e.sql("INSERT INTO t VALUES (1, 'a')")
    e.sql("INSERT INTO t VALUES (2, 'b')")
    e.sql("DELETE FROM t WHERE id = 1")
    rows = e.sql("DESCRIBE HISTORY t").collect()
    assert [r.version for r in rows] == [3, 2, 1]  # newest first
    assert all(r.time_travelable for r in rows)
    assert all(r.commit_ts is not None for r in rows)
    # compaction raises the floor: old versions flagged untravelable
    e.sql("COMPACT TABLE t")
    rows = e.sql("DESCRIBE HISTORY t").collect()
    flags = {r.version: r.time_travelable for r in rows}
    assert flags[3] and not flags[1]


def test_time_travel_words_inside_literals_untouched(spark, tmp_path):
    """A string literal containing 't VERSION AS OF 1' must not be
    rewritten even when table t exists (literal-aware matching)."""
    e = _mk(spark, tmp_path, "wh_ts8")
    e.sql("INSERT INTO t VALUES (1, 'a')")
    rows = e.sql("SELECT 't VERSION AS OF 1' AS s, id FROM t").collect()
    assert rows[0].s == "t VERSION AS OF 1"


def test_inline_time_travel_inside_insert_body(spark, tmp_path):
    """ADVICE r5: INSERT INTO ... SELECT ... FROM t VERSION AS OF n is
    routed to insert_sql before the generic SELECT rewrites run — the
    DML path must apply the time-travel + system-table rewrites to its
    body too."""
    e = _mk(spark, tmp_path, "wh_ts9")
    e.sql("INSERT INTO t VALUES (1, 'a')")          # v1
    e.sql("INSERT INTO t VALUES (1, 'a2'), (2, 'b')")  # v2
    e.sql("CREATE TABLE snap (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    n = e.sql(
        "INSERT INTO snap SELECT id, v FROM t VERSION AS OF 1"
    ).collect()[0]["count"]
    assert n == 1
    assert _rows(e.sql("SELECT * FROM snap")) == [(1, "a")]
    # system-table form inside the body works the same way
    e.sql("CREATE TABLE snap2 (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO snap2 SELECT id, v FROM t$v2 WHERE id = 2")
    assert _rows(e.sql("SELECT * FROM snap2")) == [(2, "b")]
    # INSERT OVERWRITE with a time-travel body: rollback-style rewrite
    e.sql("INSERT OVERWRITE t SELECT id, v FROM t VERSION AS OF 1")
    assert _rows(e.sql("SELECT * FROM t")) == [(1, "a")]
