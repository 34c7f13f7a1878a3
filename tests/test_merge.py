"""MERGE INTO: parser, API, and SQL end-to-end.

The reference's upsert writer (src/provider.rs:411-441) implies merge
semantics but its CLI exposes only INSERT; MERGE INTO is the standard
lakehouse DML for the same storage model, so it exceeds the reference
the way DELETE/ALTER do.  Correctness model: final table state equals
the ANSI MERGE result — first matching WHEN clause wins per key, one
source row per key enforced.
"""

import pytest

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.catalog.ddl import parse_merge


# -- parser (no Spark) -------------------------------------------------------


def test_parse_merge_full_form():
    parsed = parse_merge(
        """
        MERGE INTO tgt AS t USING (SELECT * FROM u) AS s
        ON t.id = s.id
        WHEN MATCHED AND s.qty = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET price = s.price, note = concat(t.note, '!')
        WHEN NOT MATCHED THEN INSERT (id, price) VALUES (s.id, s.price)
        """
    )
    assert parsed["target"] == "tgt"
    assert parsed["on"] == ["id"]
    assert parsed["matched"][0] == ("delete", "s.qty = 0", None)
    action, cond, assigns = parsed["matched"][1]
    assert action == "update" and cond is None
    assert assigns == {"price": "s.price", "note": "concat(t.note, '!')"}
    cond, assigns = parsed["not_matched"][0]
    assert cond is None and assigns == {"id": "s.id", "price": "s.price"}


def test_parse_merge_alias_canonicalization():
    # Swapped aliases: target aliased s, source aliased t.
    parsed = parse_merge(
        "MERGE INTO tgt AS s USING src AS t ON s.id = t.id "
        "WHEN MATCHED THEN UPDATE SET v = t.v"
    )
    assert parsed["on"] == ["id"]
    assert parsed["matched"][0][2] == {"v": "s.v"}  # source alias t -> s.


def test_parse_merge_insert_star_and_update_star():
    parsed = parse_merge(
        "MERGE INTO a USING b ON a.k = b.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert parsed["matched"] == [("update", None, None)]
    assert parsed["not_matched"] == [(None, None)]


def test_parse_merge_rejects_non_pk_on():
    with pytest.raises(ValueError, match="equalities"):
        parse_merge(
            "MERGE INTO a USING b ON a.k > b.k WHEN MATCHED THEN DELETE"
        )


def test_parse_merge_non_merge_returns_none():
    assert parse_merge("SELECT 1") is None


# -- engine end-to-end -------------------------------------------------------


@pytest.fixture()
def engine(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_merge"))
    e.sql(
        "CREATE TABLE items (id BIGINT NOT NULL, price DOUBLE, qty INT,"
        " PRIMARY KEY (id))"
    )
    e.sql(
        "INSERT INTO items VALUES (1, 10.0, 5), (2, 20.0, 0), (3, 30.0, 7)"
    )
    return e


def _state(engine):
    rows = engine.sql("SELECT id, price, qty FROM items ORDER BY id").collect()
    return [(r.id, r.price, r.qty) for r in rows]


def test_merge_update_delete_insert(engine):
    result = engine.sql(
        """
        MERGE INTO items AS t
        USING (SELECT * FROM VALUES (2, 99.0, 1), (3, 31.0, 8), (4, 40.0, 2)
               AS u(id, price, qty)) AS s
        ON t.id = s.id
        WHEN MATCHED AND t.qty = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET price = s.price, qty = s.qty
        WHEN NOT MATCHED THEN INSERT (id, price, qty)
             VALUES (s.id, s.price, s.qty)
        """
    ).collect()[0]
    assert (result.upserted, result.deleted) == (2, 1)
    # id=1 untouched, id=2 deleted (qty was 0), id=3 updated, id=4 inserted.
    assert _state(engine) == [(1, 10.0, 5), (3, 31.0, 8), (4, 40.0, 2)]


def test_merge_clause_order_first_wins(engine):
    # Same key matches both clauses; the FIRST (update) must win.
    engine.sql(
        """
        MERGE INTO items t USING (SELECT 3 AS id) s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET qty = t.qty + 100
        WHEN MATCHED THEN DELETE
        """
    )
    assert (3, 30.0, 107) in _state(engine)


def test_merge_insert_star_and_update_star(engine):
    engine.sql(
        """
        MERGE INTO items t
        USING (SELECT * FROM VALUES (1, 11.0, 6), (9, 90.0, 9)
               AS u(id, price, qty)) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    state = _state(engine)
    assert (1, 11.0, 6) in state and (9, 90.0, 9) in state


def test_merge_update_references_both_sides(engine):
    engine.sql(
        """
        MERGE INTO items t USING (SELECT 1 AS id, 5.0 AS bump) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET price = t.price + s.bump
        """
    )
    assert (1, 15.0, 5) in _state(engine)


def test_merge_conditional_insert_only(engine):
    engine.sql(
        """
        MERGE INTO items t
        USING (SELECT * FROM VALUES (7, 70.0), (8, 1.0) AS u(id, price)) s
        ON t.id = s.id
        WHEN NOT MATCHED AND s.price > 10 THEN INSERT (id, price)
             VALUES (s.id, s.price)
        """
    )
    state = _state(engine)
    assert (7, 70.0, None) in state
    assert all(r[0] != 8 for r in state)  # filtered by the AND condition


def test_merge_duplicate_source_keys_rejected(engine):
    with pytest.raises(ValueError, match="cardinality"):
        engine.sql(
            "MERGE INTO items t USING "
            "(SELECT * FROM VALUES (1, 1.0), (1, 2.0) AS u(id, price)) s "
            "ON t.id = s.id WHEN MATCHED THEN UPDATE SET price = s.price"
        )


def test_merge_rejects_pk_reassignment(engine):
    with pytest.raises(ValueError, match="primary-key"):
        engine.sql(
            "MERGE INTO items t USING (SELECT 1 AS id) s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET id = 99"
        )


def test_merge_rejects_log_table(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_log"))
    e.sql("CREATE TABLE logt (x BIGINT)")
    with pytest.raises(ValueError, match="primary-key table"):
        e.sql(
            "MERGE INTO logt t USING (SELECT 1 AS x) s ON t.x = s.x "
            "WHEN MATCHED THEN DELETE"
        )


def test_merge_delete_then_time_travel_sees_pre_merge(engine):
    seq_before = engine.catalog.current_seq("items")
    engine.sql(
        "MERGE INTO items t USING (SELECT 2 AS id) s ON t.id = s.id "
        "WHEN MATCHED THEN DELETE"
    )
    now = {r[0] for r in _state(engine)}
    assert 2 not in now
    past = {
        r.id
        for r in engine.catalog.read("items", as_of_seq=seq_before)
        .select("id")
        .collect()
    }
    assert 2 in past


def test_merge_source_engine_table(engine):
    engine.sql(
        "CREATE TABLE patches (id BIGINT NOT NULL, price DOUBLE,"
        " PRIMARY KEY (id))"
    )
    engine.sql("INSERT INTO patches VALUES (1, 111.0), (6, 60.0)")
    engine.sql(
        """
        MERGE INTO items t USING patches s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET price = s.price
        WHEN NOT MATCHED THEN INSERT (id, price) VALUES (s.id, s.price)
        """
    )
    state = _state(engine)
    assert (1, 111.0, 5) in state and (6, 60.0, None) in state


def test_merge_on_partitioned_bucketed_table(spark, tmp_path):
    """DML must respect the physical layout: partition dirs + __bkt__
    bucket dirs survive MERGE/UPDATE/DELETE, and reads stay correct."""
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_mlay"))
    e.sql(
        "CREATE TABLE sales (sale_id BIGINT NOT NULL, region STRING,"
        " amount DOUBLE, PRIMARY KEY (sale_id))"
        " PARTITIONED BY (region) DISTRIBUTED BY (sale_id) INTO 4 BUCKETS"
    )
    e.sql(
        "INSERT INTO sales VALUES (1, 'eu', 10.0), (2, 'us', 20.0),"
        " (3, 'eu', 30.0), (4, 'ap', 40.0)"
    )
    e.sql(
        """
        MERGE INTO sales t
        USING (SELECT * FROM VALUES (2, 'us', 25.0), (5, 'eu', 50.0)
               AS u(sale_id, region, amount)) s
        ON t.sale_id = s.sale_id
        WHEN MATCHED THEN UPDATE SET amount = s.amount
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    e.sql("UPDATE sales SET amount = amount + 1 WHERE region = 'eu'")
    e.sql("DELETE FROM sales WHERE amount > 45")
    state = {
        (r.sale_id, r.region, r.amount)
        for r in e.sql("SELECT * FROM sales").collect()
    }
    # eu rows got +1; the merged-in (5, eu, 50) became 51 and was
    # deleted by the amount > 45 predicate; ap/us untouched by the eu
    # update.
    assert state == {
        (1, "eu", 11.0), (2, "us", 25.0), (3, "eu", 31.0), (4, "ap", 40.0)
    }
    # layout intact: region partition dirs with __bkt__ bucket dirs below
    import os

    path = e.catalog.table_path(e.catalog.get_table("sales"))
    regions = {d for d in os.listdir(path) if d.startswith("region=")}
    assert {"region=eu", "region=us", "region=ap"} <= regions
    assert any(
        d.startswith("__bkt__=")
        for d in os.listdir(os.path.join(path, "region=eu"))
    )
    # PK lookup (bucket-pruned path) sees the merged value
    assert e.catalog.lookup("sales", 2).collect()[0].amount == 25.0


def test_merge_composite_pk(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_mcomp"))
    e.sql(
        "CREATE TABLE inv (wh STRING NOT NULL, item BIGINT NOT NULL,"
        " qty INT, PRIMARY KEY (wh, item))"
    )
    e.sql("INSERT INTO inv VALUES ('a', 1, 5), ('a', 2, 7), ('b', 1, 9)")
    e.sql(
        """
        MERGE INTO inv t
        USING (SELECT * FROM VALUES ('a', 2, 3), ('b', 2, 4)
               AS u(wh, item, qty)) s
        ON t.wh = s.wh AND t.item = s.item
        WHEN MATCHED THEN UPDATE SET qty = t.qty + s.qty
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    state = {(r.wh, r.item, r.qty) for r in e.sql("SELECT * FROM inv").collect()}
    assert state == {("a", 1, 5), ("a", 2, 10), ("b", 1, 9), ("b", 2, 4)}
    # ON must cover the FULL composite key
    with pytest.raises(ValueError, match="exactly the primary key"):
        e.sql(
            "MERGE INTO inv t USING (SELECT 'a' AS wh) s ON t.wh = s.wh "
            "WHEN MATCHED THEN DELETE"
        )


# -- ANSI 2023 matrix: multiple NOT MATCHED + NOT MATCHED BY SOURCE ----------


def test_parse_merge_multiple_not_matched_and_by_source():
    parsed = parse_merge(
        """
        MERGE INTO tgt t USING src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED AND s.price > 10 THEN INSERT (id, price)
             VALUES (s.id, s.price)
        WHEN NOT MATCHED THEN INSERT (id, price) VALUES (s.id, 0.0)
        WHEN NOT MATCHED BY SOURCE AND t.qty = 0 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET note = 'stale'
        """
    )
    assert len(parsed["not_matched"]) == 2
    assert parsed["not_matched"][0][0] == "s.price > 10"
    assert parsed["not_matched"][1][0] is None
    assert parsed["not_matched_by_source"] == [
        ("delete", "t.qty = 0", None),
        ("update", None, {"note": "'stale'"}),
    ]


def test_parse_merge_by_target_spelling():
    parsed = parse_merge(
        "MERGE INTO a USING b ON a.k = b.k "
        "WHEN NOT MATCHED BY TARGET THEN INSERT *"
    )
    assert parsed["not_matched"] == [(None, None)]
    assert parsed["not_matched_by_source"] == []


def test_merge_multiple_not_matched_first_wins(engine):
    engine.sql(
        """
        MERGE INTO items t
        USING (SELECT * FROM VALUES (7, 70.0, 1), (8, 1.0, 2)
               AS u(id, price, qty)) s
        ON t.id = s.id
        WHEN NOT MATCHED AND s.price > 10 THEN INSERT (id, price, qty)
             VALUES (s.id, s.price, s.qty)
        WHEN NOT MATCHED THEN INSERT (id, price, qty)
             VALUES (s.id, 0.0, s.qty)
        """
    )
    state = _state(engine)
    # id=7 satisfies BOTH clauses -> first wins (real price); id=8 only
    # the catch-all -> price zeroed.
    assert (7, 70.0, 1) in state and (8, 0.0, 2) in state


def test_merge_not_matched_by_source_delete_and_update(engine):
    # Source covers only id=1; ids 2 and 3 are NOT MATCHED BY SOURCE.
    result = engine.sql(
        """
        MERGE INTO items t USING (SELECT 1 AS id, 12.0 AS price) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET price = s.price
        WHEN NOT MATCHED BY SOURCE AND t.qty = 0 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET qty = t.qty + 1000
        """
    ).collect()[0]
    # id=2 (qty 0) deleted; id=3 bumped; id=1 price-updated.
    assert result.deleted == 1
    assert _state(engine) == [(1, 12.0, 5), (3, 30.0, 1007)]


def test_merge_by_source_clause_order_first_wins(engine):
    engine.sql(
        """
        MERGE INTO items t USING (SELECT 1 AS id) s ON t.id = s.id
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET qty = -1
        WHEN NOT MATCHED BY SOURCE THEN DELETE
        """
    )
    state = _state(engine)
    # Both target-only rows hit the UPDATE first; nothing deleted.
    assert (2, 20.0, -1) in state and (3, 30.0, -1) in state


def test_merge_by_source_update_star_rejected(engine):
    with pytest.raises(ValueError, match="BY SOURCE"):
        engine.catalog.merge_into(
            "items",
            engine.sql("SELECT 1 AS id"),
            ["id"],
            not_matched_by_source=[("update", None, None)],
        )


def test_merge_null_source_key_rejected(engine):
    with pytest.raises(ValueError, match="NULL join-key"):
        engine.sql(
            "MERGE INTO items t USING "
            "(SELECT CAST(NULL AS BIGINT) AS id, 1.0 AS price) s "
            "ON t.id = s.id WHEN NOT MATCHED THEN INSERT (id, price) "
            "VALUES (s.id, s.price)"
        )


def test_merge_null_composite_key_component_rejected(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_mnull"))
    e.sql(
        "CREATE TABLE inv2 (wh STRING NOT NULL, item BIGINT NOT NULL,"
        " qty INT, PRIMARY KEY (wh, item))"
    )
    e.sql("INSERT INTO inv2 VALUES ('a', 1, 5)")
    with pytest.raises(ValueError, match="NULL join-key"):
        e.sql(
            "MERGE INTO inv2 t USING "
            "(SELECT 'a' AS wh, CAST(NULL AS BIGINT) AS item, 9 AS qty) s "
            "ON t.wh = s.wh AND t.item = s.item "
            "WHEN NOT MATCHED THEN INSERT *"
        )


# -- string-literal-aware parsing (masking) ----------------------------------


def test_parse_merge_literal_containing_alias_prefix():
    # Source alias 'src': the literal 'src.jpg' must NOT become 's.jpg'.
    parsed = parse_merge(
        "MERGE INTO tgt t USING src ON t.id = src.id "
        "WHEN MATCHED THEN UPDATE SET path = 'src.jpg', v = src.v"
    )
    assert parsed["matched"][0][2] == {"path": "'src.jpg'", "v": "s.v"}


def test_parse_merge_literal_containing_when_matched():
    parsed = parse_merge(
        "MERGE INTO tgt t USING src s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET note = 'WHEN MATCHED THEN DELETE'"
    )
    assert parsed["matched"] == [
        ("update", None, {"note": "'WHEN MATCHED THEN DELETE'"})
    ]


def test_merge_literal_with_clause_keywords_end_to_end(engine):
    engine.sql("ALTER TABLE items ADD COLUMN note STRING")
    engine.sql(
        "MERGE INTO items t USING (SELECT 1 AS id) s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET note = ' AND x THEN WHEN MATCHED '"
    )
    row = engine.sql("SELECT note FROM items WHERE id = 1").collect()[0]
    assert row.note == " AND x THEN WHEN MATCHED "
