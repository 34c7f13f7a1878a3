"""GENERATED ALWAYS AS columns (r8 — the Delta generated-column
pattern): computed from the row's other values at every live write
through the single _append_log choke point, so INSERT / UPDATE / MERGE
can never leave a stale derived value; explicit writes refuse."""

import pytest

from fluss_datafusion_spark import EngineSession


def _mk(spark, tmp_path, name="wh_gen"):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / name))
    e.sql(
        "CREATE TABLE ev (id BIGINT NOT NULL, ts TIMESTAMP, v BIGINT,"
        " d DATE GENERATED ALWAYS AS (CAST(ts AS DATE)),"
        " v2 BIGINT GENERATED ALWAYS AS (v * 2),"
        " PRIMARY KEY (id)) PARTITIONED BY (d)"
    )
    return e


def test_insert_computes_generated_and_partitions_by_it(spark, tmp_path):
    e = _mk(spark, tmp_path)
    e.sql(
        "INSERT INTO ev VALUES (1, TIMESTAMP '2024-03-05 10:00:00', 7),"
        " (2, TIMESTAMP '2024-03-06 23:59:59', 9)"
    )
    rows = {r.id: r for r in e.sql("SELECT * FROM ev").collect()}
    assert str(rows[1].d) == "2024-03-05" and rows[1].v2 == 14
    assert str(rows[2].d) == "2024-03-06" and rows[2].v2 == 18
    # the generated column is a REAL partition directory
    import os

    path = e.catalog.table_path(e.catalog.get_table("ev"))
    assert any("d=2024-03-05" in d for d, _, _ in os.walk(path))
    # partition pruning on the generated column
    assert (
        e.sql("SELECT count(*) AS n FROM ev WHERE d = DATE '2024-03-05'")
        .collect()[0].n
        == 1
    )


def test_update_of_source_column_recomputes(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_gen_upd")
    e.sql("INSERT INTO ev VALUES (1, TIMESTAMP '2024-03-05 10:00:00', 7)")
    e.sql("UPDATE ev SET v = 100 WHERE id = 1")
    row = e.sql("SELECT * FROM ev").collect()[0]
    assert row.v == 100 and row.v2 == 200, "derived value must track"
    # moving the timestamp moves the generated PARTITION value too
    e.sql("UPDATE ev SET ts = TIMESTAMP '2024-04-01 00:00:00' WHERE id = 1")
    row = e.sql("SELECT * FROM ev").collect()[0]
    assert str(row.d) == "2024-04-01"


def test_explicit_writes_refuse(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_gen_ref")
    e.sql("INSERT INTO ev VALUES (1, TIMESTAMP '2024-03-05 10:00:00', 7)")
    with pytest.raises(ValueError, match="GENERATED"):
        e.sql(
            "INSERT INTO ev (id, ts, v, v2) VALUES "
            "(2, TIMESTAMP '2024-03-05 10:00:00', 7, 999)"
        )
    with pytest.raises(ValueError, match="GENERATED"):
        e.sql("UPDATE ev SET v2 = 5 WHERE id = 1")
    with pytest.raises(ValueError, match="GENERATED"):
        e.sql(
            "MERGE INTO ev USING (SELECT 1 AS id, 5 AS nv) s ON ev.id = s.id"
            " WHEN MATCHED THEN UPDATE SET v2 = s.nv"
        )
    # BY NAME naming a generated column refuses too
    spark.sql(
        "SELECT 3 AS id, TIMESTAMP '2024-03-05 10:00:00' AS ts,"
        " 7 AS v, 999 AS v2"
    ).createOrReplaceTempView("gen_byname_src")
    with pytest.raises(ValueError, match="GENERATED"):
        e.sql("INSERT INTO ev BY NAME SELECT * FROM gen_byname_src")
    # wrong positional arity gets the computed-columns hint
    with pytest.raises(ValueError, match="computed, not supplied"):
        e.sql(
            "INSERT INTO ev VALUES "
            "(2, TIMESTAMP '2024-03-05 10:00:00', 7, DATE '2024-03-05', 14)"
        )


def test_merge_insert_and_update_recompute(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_gen_mrg")
    e.sql("INSERT INTO ev VALUES (1, TIMESTAMP '2024-03-05 10:00:00', 7)")
    e.sql(
        "MERGE INTO ev USING (SELECT 1 AS id, 50 AS nv UNION ALL"
        " SELECT 9, 3) s ON ev.id = s.id"
        " WHEN MATCHED THEN UPDATE SET v = s.nv"
        " WHEN NOT MATCHED THEN INSERT (id, ts, v) VALUES"
        " (s.id, TIMESTAMP '2024-05-01 00:00:00', s.nv)"
    )
    rows = {r.id: r for r in e.sql("SELECT * FROM ev").collect()}
    assert rows[1].v2 == 100
    assert rows[9].v2 == 6 and str(rows[9].d) == "2024-05-01"


def test_ddl_roundtrip_and_reattach(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_gen_ddl")
    ddl = e.sql("SHOW CREATE TABLE ev").collect()[0][0]
    assert "GENERATED ALWAYS AS (CAST(ts AS DATE))" in ddl
    assert "GENERATED ALWAYS AS (v * 2)" in ddl
    e.sql("INSERT INTO ev VALUES (1, TIMESTAMP '2024-03-05 10:00:00', 7)")
    # a new session over the same warehouse keeps the generation rule
    e2 = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_gen_ddl"))
    e2.sql("INSERT INTO ev VALUES (2, TIMESTAMP '2024-06-01 01:00:00', 4)")
    rows = {r.id: r for r in e2.sql("SELECT * FROM ev").collect()}
    assert rows[2].v2 == 8 and str(rows[2].d) == "2024-06-01"


def test_create_time_validation(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_gen_val"))
    with pytest.raises(ValueError, match="does not resolve"):
        e.sql(
            "CREATE TABLE bad (id BIGINT NOT NULL, "
            "g BIGINT GENERATED ALWAYS AS (nope + 1), PRIMARY KEY (id))"
        )
    with pytest.raises(ValueError, match="primary-key"):
        e.sql(
            "CREATE TABLE bad2 (id BIGINT NOT NULL, v BIGINT, "
            "k BIGINT GENERATED ALWAYS AS (v + 1), PRIMARY KEY (k))"
        )


def test_rename_and_drop_of_generation_sources_refuse(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_gen_alter")
    e.sql("INSERT INTO ev VALUES (1, TIMESTAMP '2024-03-05 10:00:00', 7)")
    with pytest.raises(ValueError, match="generated column"):
        e.sql("ALTER TABLE ev RENAME COLUMN v TO w")
    with pytest.raises(ValueError, match="generated column"):
        e.sql("ALTER TABLE ev DROP COLUMN v")
    # dropping the GENERATED column itself frees its source
    e.sql("ALTER TABLE ev DROP COLUMN v2")
    e.sql("ALTER TABLE ev RENAME COLUMN v TO w")
    assert e.sql("SELECT w FROM ev").collect()[0].w == 7
