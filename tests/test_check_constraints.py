"""CHECK constraints (Delta-style): CREATE TABLE CHECK clauses, ALTER
ADD/DROP CONSTRAINT, write-time enforcement across INSERT/UPDATE/MERGE,
NULL-passes semantics, and warehouse persistence."""

import pytest

from fluss_datafusion_spark import EngineSession


def _mk(spark, tmp_path, name):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / name))
    e.sql(
        "CREATE TABLE t (id BIGINT NOT NULL, x BIGINT, s STRING,"
        " CONSTRAINT x_pos CHECK (x > 0), PRIMARY KEY (id))"
    )
    return e


def test_check_blocks_violating_insert_and_allows_null(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_ck1")
    e.sql("INSERT INTO t VALUES (1, 5, 'a')")
    # NULL passes (SQL-standard CHECK semantics)
    e.sql("INSERT INTO t VALUES (2, NULL, 'b')")
    with pytest.raises(Exception, match="x_pos"):
        e.sql("INSERT INTO t VALUES (3, -1, 'c')")
    # the failed statement wrote nothing
    assert sorted(r.id for r in e.sql("SELECT id FROM t").collect()) == [1, 2]


def test_check_enforced_on_update_and_merge(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_ck2")
    e.sql("INSERT INTO t VALUES (1, 5, 'a'), (2, 9, 'b')")
    with pytest.raises(Exception, match="x_pos"):
        e.sql("UPDATE t SET x = -3 WHERE id = 1")
    e.sql("UPDATE t SET x = 7 WHERE id = 1")  # passing update is fine
    with pytest.raises(Exception, match="x_pos"):
        e.sql(
            "MERGE INTO t USING (SELECT 9 AS id, -1 AS x, 'z' AS s) AS s"
            " ON t.id = s.id WHEN NOT MATCHED THEN INSERT (id, x, s)"
            " VALUES (s.id, s.x, s.s)"
        )
    got = {r.id: r.x for r in e.sql("SELECT id, x FROM t").collect()}
    assert got == {1: 7, 2: 9}


def test_alter_add_drop_constraint(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_ck3")
    e.sql("INSERT INTO t VALUES (1, 5, 'abc')")
    # adding a constraint existing rows violate is refused
    with pytest.raises(Exception, match="existing"):
        e.sql("ALTER TABLE t ADD CONSTRAINT s_len CHECK (length(s) > 5)")
    e.sql("ALTER TABLE t ADD CONSTRAINT s_len CHECK (length(s) >= 3)")
    with pytest.raises(Exception, match="s_len"):
        e.sql("INSERT INTO t VALUES (2, 5, 'xy')")
    e.sql("ALTER TABLE t DROP CONSTRAINT s_len")
    e.sql("INSERT INTO t VALUES (2, 5, 'xy')")  # enforced no longer
    with pytest.raises(Exception, match="x_pos"):  # others still live
        e.sql("INSERT INTO t VALUES (3, 0, 'zzz')")


def test_check_survives_session_reattach(spark, tmp_path):
    wh = str(tmp_path / "wh_ck4")
    e = EngineSession(spark=spark, warehouse=wh)
    e.sql(
        "CREATE TABLE t (id BIGINT NOT NULL, x BIGINT,"
        " CONSTRAINT x_pos CHECK (x > 0), PRIMARY KEY (id))"
    )
    e.sql("INSERT INTO t VALUES (1, 5)")
    e2 = EngineSession(spark=spark, warehouse=wh)
    with pytest.raises(Exception, match="x_pos"):
        e2.sql("INSERT INTO t VALUES (2, -1)")
    assert e2.catalog.get_table("t").check_constraints == {"x_pos": "x > 0"}
