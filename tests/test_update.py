"""UPDATE statement: parser + engine semantics on PK tables."""

import pytest

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.catalog.ddl import parse_update


def test_parse_update_forms():
    assert parse_update("UPDATE t SET a = 1") == ("t", {"a": "1"}, None)
    target, assigns, where = parse_update(
        "UPDATE db.t SET a = a + 1, b = concat(b, 'x') WHERE a > 2 AND b = 'q'"
    )
    assert target == "db.t"
    assert assigns == {"a": "a + 1", "b": "concat(b, 'x')"}
    assert where == "a > 2 AND b = 'q'"
    assert parse_update("SELECT 1") is None


@pytest.fixture()
def engine(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_upd"))
    e.sql(
        "CREATE TABLE accounts (id BIGINT NOT NULL, bal DOUBLE, tag STRING,"
        " PRIMARY KEY (id))"
    )
    e.sql(
        "INSERT INTO accounts VALUES (1, 10.0, 'a'), (2, 20.0, 'b'),"
        " (3, 30.0, 'a')"
    )
    return e


def _state(engine):
    return {
        (r.id, r.bal, r.tag)
        for r in engine.sql("SELECT * FROM accounts").collect()
    }


def test_update_with_where(engine):
    n = engine.sql(
        "UPDATE accounts SET bal = bal * 2 WHERE tag = 'a'"
    ).collect()[0]["count"]
    assert n == 2
    assert _state(engine) == {(1, 20.0, "a"), (2, 20.0, "b"), (3, 60.0, "a")}


def test_update_all_rows_and_expression_over_self(engine):
    n = engine.sql(
        "UPDATE accounts SET tag = concat(tag, '!'), bal = bal + 1"
    ).collect()[0]["count"]
    assert n == 3
    assert _state(engine) == {
        (1, 11.0, "a!"), (2, 21.0, "b!"), (3, 31.0, "a!")
    }


def test_update_preserves_history(engine):
    anchor = engine.catalog.current_seq("accounts")
    engine.sql("UPDATE accounts SET bal = 0 WHERE id = 1")
    past = {
        (r.id, r.bal)
        for r in engine.catalog.read("accounts", as_of_seq=anchor)
        .select("id", "bal").collect()
    }
    assert (1, 10.0) in past
    assert (1, 0.0, "a") in _state(engine)


def test_update_rejects_pk_and_unknown_and_log_table(engine, spark, tmp_path):
    with pytest.raises(ValueError, match="primary-key columns"):
        engine.sql("UPDATE accounts SET id = 9")
    with pytest.raises(ValueError, match="unknown columns"):
        engine.sql("UPDATE accounts SET nope = 1")
    e2 = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_updlog"))
    e2.sql("CREATE TABLE ev (x BIGINT)")
    with pytest.raises(ValueError, match="primary-key table"):
        e2.sql("UPDATE ev SET x = 1")


def test_delete_where_predicate(engine):
    n = engine.sql(
        "DELETE FROM accounts WHERE bal >= 20 AND tag = 'a'"
    ).collect()[0]["count"]
    assert n == 1  # only (3, 30.0, 'a')
    assert {r[0] for r in _state(engine)} == {1, 2}


def test_delete_where_non_key_equality_routes_to_predicate(engine):
    # An equality on a NON-key column is a predicate delete (the point
    # path would refuse it as not covering the PK).
    n = engine.sql("DELETE FROM accounts WHERE tag = 'a'").collect()[0]["count"]
    assert n == 2
    assert {r[0] for r in _state(engine)} == {2}


def test_delete_where_no_matches(engine):
    n = engine.sql("DELETE FROM accounts WHERE bal > 1e9").collect()[0]["count"]
    assert n == 0
    assert len(_state(engine)) == 3


def test_point_delete_still_blind_append(engine):
    # Full-PK equality keeps the upsert-writer semantics: absent key
    # still records one tombstone.
    n = engine.sql("DELETE FROM accounts WHERE id = 999").collect()[0]["count"]
    assert n == 1
    assert len(_state(engine)) == 3


def test_restore_table_round_trip(engine):
    # anchor: 3 rows (1,10,a) (2,20,b) (3,30,a)
    anchor = engine.catalog.current_seq("accounts")
    engine.sql("UPDATE accounts SET bal = 0 WHERE id = 1")
    engine.sql("DELETE FROM accounts WHERE id = 2")
    engine.sql("INSERT INTO accounts VALUES (9, 90.0, 'z')")
    assert _state(engine) == {(1, 0.0, "a"), (3, 30.0, "a"), (9, 90.0, "z")}

    row = engine.sql(
        f"RESTORE TABLE accounts TO VERSION AS OF {anchor}"
    ).collect()[0]
    assert (row.restored, row.deleted) == (3, 1)  # 3 old rows; key 9 gone
    assert _state(engine) == {(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a")}

    # the restore is itself history: travel back to the post-edit state
    post_edit = engine.catalog.current_seq("accounts") - 2
    past = {
        (r.id, r.bal, r.tag)
        for r in engine.catalog.read("accounts", as_of_seq=post_edit).collect()
    }
    assert (9, 90.0, "z") in past


def test_restore_refuses_pre_compaction_anchor(engine):
    engine.sql("UPDATE accounts SET bal = 1")
    engine.catalog.compact("accounts")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="compaction"):
        engine.sql("RESTORE TABLE accounts TO VERSION AS OF 1")


def test_restore_rejects_log_table(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_rlog"))
    e.sql("CREATE TABLE lg (x BIGINT)")
    with pytest.raises(ValueError, match="primary-key table"):
        e.sql("RESTORE TABLE lg TO VERSION AS OF 1")


def test_restore_on_partitioned_bucketed_table(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_rlay"))
    e.sql(
        "CREATE TABLE ev (id BIGINT NOT NULL, region STRING, v DOUBLE,"
        " PRIMARY KEY (id))"
        " PARTITIONED BY (region) DISTRIBUTED BY (id) INTO 2 BUCKETS"
    )
    e.sql("INSERT INTO ev VALUES (1, 'eu', 1.0), (2, 'us', 2.0)")
    anchor = e.catalog.current_seq("ev")
    e.sql("UPDATE ev SET v = 99 WHERE id = 1")
    e.sql("INSERT INTO ev VALUES (3, 'ap', 3.0)")
    row = e.sql(f"RESTORE TABLE ev TO VERSION AS OF {anchor}").collect()[0]
    assert (row.restored, row.deleted) == (2, 1)
    state = {(r.id, r.region, r.v) for r in e.sql("SELECT * FROM ev").collect()}
    assert state == {(1, "eu", 1.0), (2, "us", 2.0)}
    # bucket-pruned lookup still correct after the restore writes
    assert e.catalog.lookup("ev", 1).collect()[0].v == 1.0


# -- string-literal-aware parsing + unsatisfiable point-delete guard ---------


def test_parse_update_where_inside_set_literal():
    # ' WHERE ' inside a SET string literal must not truncate the SET list.
    target, assigns, where = parse_update(
        "UPDATE t SET note = 'use WHERE wisely', b = 2 WHERE id = 1"
    )
    assert target == "t"
    assert assigns == {"note": "'use WHERE wisely'", "b": "2"}
    assert where == "id = 1"


def test_parse_update_no_real_where_literal_only():
    target, assigns, where = parse_update(
        "UPDATE t SET note = 'a WHERE b'"
    )
    assert assigns == {"note": "'a WHERE b'"}
    assert where is None


def test_update_literal_with_where_end_to_end(engine):
    engine.sql(
        "UPDATE accounts SET tag = 'x WHERE y' WHERE id = 1"
    )
    assert (1, 10.0, "x WHERE y") in _state(engine)


def test_parse_delete_repeated_column_falls_back_to_predicate():
    from fluss_datafusion_spark.catalog.ddl import parse_delete

    target, key, pred = parse_delete("DELETE FROM t WHERE id = 3 AND id = 4")
    assert target == "t" and key is None
    assert pred == "id = 3 AND id = 4"
    # Repeated with the SAME value still point-deletes.
    target, key, pred = parse_delete("DELETE FROM t WHERE id = 3 AND id = 3")
    assert key == {"id": 3}


def test_delete_unsatisfiable_conjunction_deletes_nothing(engine):
    n = engine.sql(
        "DELETE FROM accounts WHERE id = 1 AND id = 2"
    ).collect()[0]["count"]
    assert n == 0
    assert {r[0] for r in _state(engine)} == {1, 2, 3}


def test_parse_delete_literal_containing_and():
    from fluss_datafusion_spark.catalog.ddl import parse_delete

    target, key, pred = parse_delete(
        "DELETE FROM t WHERE tag = 'salt AND pepper'"
    )
    assert key == {"tag": "salt AND pepper"}
    assert pred == "tag = 'salt AND pepper'"
