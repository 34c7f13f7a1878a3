"""DDL parser unit tests (no Spark session needed)."""

import pytest

from fluss_datafusion_spark.catalog.ddl import (
    is_engine_create_table,
    parse_create_table,
    parse_insert_target,
)


def test_basic_create():
    spec = parse_create_table(
        "CREATE TABLE user (id BIGINT NOT NULL, name STRING, PRIMARY KEY (id))"
    )
    assert spec.database == "fluss" and spec.name == "user"
    assert [c.name for c in spec.columns] == ["id", "name"]
    assert spec.primary_key == ["id"]
    assert not spec.columns[0].nullable
    assert spec.columns[1].nullable


def test_qualified_and_quoted_names():
    spec = parse_create_table("CREATE TABLE `my-db`.`my-table` (`weird col` INT)")
    assert spec.database == "my-db"
    assert spec.name == "my-table"
    assert spec.columns[0].name == "weird col"


def test_if_not_exists():
    spec = parse_create_table("CREATE TABLE IF NOT EXISTS t1 (x INT)")
    assert spec.name == "t1"


def test_pk_implies_not_null():
    spec = parse_create_table("CREATE TABLE t (id BIGINT, v STRING, PRIMARY KEY (id))")
    assert not spec.column("id").nullable


def test_composite_pk():
    spec = parse_create_table(
        "CREATE TABLE t (a BIGINT, b STRING, c DOUBLE, PRIMARY KEY (a, b))"
    )
    assert spec.primary_key == ["a", "b"]


def test_column_comments_with_escaped_quote():
    spec = parse_create_table(
        "CREATE TABLE t (x INT COMMENT 'it''s a column', y STRING)"
    )
    assert spec.column("x").comment == "it's a column"


def test_partitioned_distributed_with():
    spec = parse_create_table(
        "CREATE TABLE t (a INT, dt STRING, r STRING)"
        " COMMENT 'tbl' PARTITIONED BY (dt, r)"
        " DISTRIBUTED BY (a) INTO 8 BUCKETS"
        " WITH ('k1' = 'v1', 'k2' = 'v2')"
    )
    assert spec.comment == "tbl"
    assert spec.partition_keys == ["dt", "r"]
    assert spec.bucket_keys == ["a"]
    assert spec.num_buckets == 8
    assert spec.properties == {"k1": "v1", "k2": "v2"}


def test_decimal_and_all_types():
    spec = parse_create_table(
        "CREATE TABLE t (a DECIMAL(12, 3), b TINYINT, c SMALLINT, d FLOAT, e BYTES)"
    )
    assert spec.column("a").spark_type.simpleString() == "decimal(12,3)"


def test_unsupported_type_rejected():
    with pytest.raises(ValueError, match="unsupported CREATE TABLE type"):
        parse_create_table("CREATE TABLE t (x GEOMETRY)")


def test_negative_decimal_scale_rejected():
    with pytest.raises(Exception):
        parse_create_table("CREATE TABLE t (x DECIMAL(10, -2))")


def test_unknown_key_column_rejected():
    with pytest.raises(ValueError, match="not in column list"):
        parse_create_table("CREATE TABLE t (x INT, PRIMARY KEY (nope))")


def test_duplicate_columns_rejected():
    with pytest.raises(ValueError, match="duplicate column"):
        parse_create_table("CREATE TABLE t (x INT, x STRING)")


def test_insert_target():
    assert parse_insert_target("INSERT INTO t VALUES (1)") == "t"
    assert parse_insert_target("INSERT INTO db.t SELECT * FROM s") == "db.t"
    assert parse_insert_target("insert into `my-t` (a, b) VALUES (1, 2)") == "my-t"
    assert parse_insert_target("SELECT 1") is None


def test_is_engine_create_table():
    assert is_engine_create_table("CREATE TABLE t (x INT)")
    assert is_engine_create_table("  create   table t (x INT)")
    assert not is_engine_create_table("CREATE VIEW v AS SELECT 1")


def test_create_database_and_drop_table_routing(spark, tmp_path):
    from fluss_datafusion_spark import EngineSession

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh"))
    e.sql("CREATE DATABASE extra")
    assert "extra" in e.catalog.list_databases()
    rows = e.sql("SHOW DATABASES").collect()
    assert {r["database_name"] for r in rows} >= {"fluss", "extra"}

    e.sql("CREATE TABLE droppable (id BIGINT NOT NULL, PRIMARY KEY (id))")
    assert e.catalog.has_table("droppable")
    e.sql("INSERT INTO droppable VALUES (1)")
    e.sql("DROP TABLE droppable")
    assert not e.catalog.has_table("droppable")
    # SHOW TABLES no longer lists it
    assert all(
        r["table_name"] != "droppable" for r in e.sql("SHOW TABLES").collect()
    )


def test_parse_alter_table_forms():
    from fluss_datafusion_spark.catalog import ddl

    target, (action, col) = ddl.parse_alter_table(
        "ALTER TABLE db1.t ADD COLUMN score DOUBLE COMMENT 'quality'"
    )
    assert target == "db1.t" and action == "add"
    assert col.name == "score" and col.type_name == "DOUBLE"
    assert col.nullable and col.comment == "quality"

    target, (action, payload) = ddl.parse_alter_table("ALTER TABLE t DROP COLUMN x;")
    assert target == "t" and action == "drop" and payload == "x"

    assert ddl.parse_alter_table("SELECT 1") is None

    import pytest as _pytest

    target, (action, payload) = ddl.parse_alter_table("ALTER TABLE t RENAME TO u")
    assert target == "t" and action == "rename" and payload == "u"

    assert ddl.parse_truncate_table("TRUNCATE TABLE db1.t;") == "db1.t"
    assert ddl.parse_truncate_table("SELECT 1") is None

    with _pytest.raises(ValueError):
        ddl.parse_alter_table("ALTER TABLE t ADD COLUMN y BIGINT NOT NULL")
    # supported since r6 (used to raise as unsupported)
    assert ddl.parse_alter_table(
        "ALTER TABLE t SET TBLPROPERTIES ('a'='b', 'c' = 'd''e')"
    ) == ("t", ("set_properties", {"a": "b", "c": "d'e"}))
    assert ddl.parse_alter_table(
        "ALTER TABLE t UNSET TBLPROPERTIES ('a', 'b')"
    ) == ("t", ("unset_properties", ["a", "b"]))
    with _pytest.raises(ValueError, match="at least one"):
        ddl.parse_alter_table("ALTER TABLE t UNSET TBLPROPERTIES ()")
    with _pytest.raises(ValueError):
        ddl.parse_alter_table("ALTER TABLE t SET TBLPROPERTIES (a = b)")
    with _pytest.raises(ValueError):
        ddl.parse_alter_table("ALTER TABLE t FROB SOMETHING")


def test_alter_table_add_drop_column_lifecycle(spark, tmp_path):
    """ADD COLUMN surfaces NULL for pre-ALTER rows (no rewrite), carries
    values for new upserts, composes with compaction; DROP COLUMN hides
    the bytes and refuses identity columns."""
    import pytest as _pytest

    from fluss_datafusion_spark import EngineSession

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_alter"))
    e.sql("CREATE TABLE items (id BIGINT NOT NULL, name STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO items VALUES (1, 'a')")
    e.sql("ALTER TABLE items ADD COLUMN score DOUBLE COMMENT 'quality'")

    rows = {r["id"]: (r["name"], r["score"]) for r in e.sql("SELECT * FROM items").collect()}
    assert rows == {1: ("a", None)}  # pre-ALTER row reads NULL

    e.sql("INSERT INTO items VALUES (2, 'b', 0.5)")
    e.sql("INSERT INTO items VALUES (1, 'a2', 0.9)")  # upsert across the ALTER
    rows = {r["id"]: (r["name"], r["score"]) for r in e.sql("SELECT * FROM items").collect()}
    assert rows == {1: ("a2", 0.9), 2: ("b", 0.5)}

    # DESCRIBE/SHOW CREATE reflect the new column
    ddl_text = e.sql("SHOW CREATE TABLE items").collect()[0][0]
    assert "score" in ddl_text and "quality" in ddl_text

    e.catalog.compact("items")
    rows = {r["id"]: r["score"] for r in e.sql("SELECT * FROM items").collect()}
    assert rows == {1: 0.9, 2: 0.5}

    e.sql("ALTER TABLE items DROP COLUMN score")
    cols = e.sql("SELECT * FROM items").columns
    assert cols == ["id", "name"]

    with _pytest.raises(Exception):
        e.sql("ALTER TABLE items DROP COLUMN id")  # PK column refuses
    with _pytest.raises(Exception):
        e.sql("ALTER TABLE items ADD COLUMN name STRING")  # duplicate


def test_truncate_and_rename_lifecycle(spark, tmp_path):
    from fluss_datafusion_spark import EngineSession

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_tr"))
    e.sql("CREATE TABLE logs (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO logs VALUES (1, 'x')")
    e.sql("INSERT INTO logs VALUES (2, 'y')")
    assert e.sql("SELECT count(*) AS n FROM logs").collect()[0]["n"] == 2

    e.sql("TRUNCATE TABLE logs")
    assert e.sql("SELECT count(*) AS n FROM logs").collect()[0]["n"] == 0
    # definition survives: insert works again, seq restarts cleanly
    e.sql("INSERT INTO logs VALUES (3, 'z')")
    assert e.sql("SELECT count(*) AS n FROM logs").collect()[0]["n"] == 1

    e.sql("ALTER TABLE logs RENAME TO audit")
    assert e.sql("SELECT v FROM audit").collect()[0]["v"] == "z"
    assert not e.catalog.has_table("logs")
    # PK upsert still works under the new name (spec + storage moved)
    e.sql("INSERT INTO audit VALUES (3, 'z2')")
    assert e.sql("SELECT v FROM audit WHERE id = 3").collect()[0]["v"] == "z2"


def test_create_table_like(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS likedb")
    engine.sql(
        "CREATE TABLE likedb.src (id BIGINT NOT NULL, g STRING, v DOUBLE,"
        " CONSTRAINT pos CHECK (v >= 0), PRIMARY KEY (id))"
        " PARTITIONED BY (g) WITH ('compaction.auto-after' = '100')"
    )
    engine.sql("INSERT INTO likedb.src VALUES (1, 'a', 2.0)")
    engine.sql("CREATE TABLE likedb.dst LIKE likedb.src")
    src = engine.catalog.get_table("likedb.src")
    dst = engine.catalog.get_table("likedb.dst")
    # full definition copied: columns, PK, layout, properties, constraints
    assert [c.name for c in dst.columns] == [c.name for c in src.columns]
    assert dst.primary_key == src.primary_key
    assert dst.partition_keys == src.partition_keys
    assert dst.properties.get("compaction.auto-after") == "100"
    assert dst.check_constraints == src.check_constraints
    # ...but no data
    assert engine.sql("SELECT count(*) AS n FROM likedb.dst").collect()[0].n == 0
    # constraints are live on the new table
    import pytest as _pytest

    with _pytest.raises(Exception, match="pos"):
        engine.sql("INSERT INTO likedb.dst VALUES (1, 'a', -5.0)")
    # IF NOT EXISTS is a no-op on an existing table
    engine.sql("CREATE TABLE IF NOT EXISTS likedb.dst LIKE likedb.src")
    for t in ("src", "dst"):
        engine.sql(f"DROP TABLE likedb.{t}")


def test_set_unset_tblproperties(spark, tmp_path):
    """ALTER TABLE SET/UNSET TBLPROPERTIES (r6): the standard way to
    enable policies on an EXISTING table — validated at DDL time, live
    for the next write, visible to SHOW TBLPROPERTIES."""
    import pytest as _pytest

    from fluss_datafusion_spark import EngineSession

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_tblprops"))
    e.sql("CREATE TABLE tp (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO tp VALUES (1, 'a')")
    e.sql(
        "ALTER TABLE tp SET TBLPROPERTIES"
        " ('compaction.auto-after' = '2', 'owner' = 'data''team')"
    )
    spec = e.catalog.get_table("tp")
    assert spec.properties["compaction.auto-after"] == "2"
    assert spec.properties["owner"] == "data'team"
    # the policy is LIVE: two more statements trigger auto-compaction
    e.sql("INSERT INTO tp VALUES (2, 'b')")
    e.sql("INSERT INTO tp VALUES (1, 'a2')")
    assert e.catalog._floor.get("fluss.tp", 0) >= 2
    got = {(r.id, r.v) for r in e.sql("SELECT * FROM tp").collect()}
    assert got == {(1, "a2"), (2, "b")}
    # SHOW TBLPROPERTIES (alias of SHOW OPTIONS) surfaces them
    rows = e.sql("SHOW TBLPROPERTIES tp").collect()
    props = {r.option_name: r.option_value for r in rows}
    assert props.get("owner") == "data'team"
    # UNSET removes; absent keys are a no-op
    e.sql("ALTER TABLE tp UNSET TBLPROPERTIES ('owner', 'nope')")
    assert "owner" not in e.catalog.get_table("tp").properties
    # persisted: a fresh session sees the surviving property
    e2 = EngineSession(spark=spark, warehouse=e.catalog.warehouse)
    assert e2.catalog.get_table("tp").properties[
        "compaction.auto-after"
    ] == "2"
    # validation at DDL time
    with _pytest.raises(ValueError, match="integer statement count"):
        e.sql("ALTER TABLE tp SET TBLPROPERTIES ('compaction.auto-after' = 'x')")
    with _pytest.raises(ValueError, match="unknown columns"):
        e.sql("ALTER TABLE tp SET TBLPROPERTIES ('bloom.columns' = 'ghost')")
    with _pytest.raises(ValueError, match="in \\(0, 1\\)"):
        e.sql("ALTER TABLE tp SET TBLPROPERTIES ('bloom.fpp' = '7')")
    with _pytest.raises(ValueError, match="engine-managed"):
        e.sql("ALTER TABLE tp SET TBLPROPERTIES ('materialized_view' = 'true')")


def test_set_tblproperties_enables_blooms_for_future_writes(spark, tmp_path):
    from pyspark.sql import functions as F

    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.catalog import skipping

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_tpbloom"))
    e.sql("CREATE TABLE bp (doc_id STRING, n BIGINT)")
    spark.range(8).select(
        F.md5(F.col("id").cast("string")).alias("doc_id"),
        F.col("id").alias("n"),
    ).createOrReplaceTempView("bp_src")
    e.sql("INSERT INTO bp SELECT * FROM bp_src")
    e.sql("ALTER TABLE bp SET TBLPROPERTIES ('bloom.columns' = 'doc_id')")
    spark.range(8, 16).select(
        F.md5(F.col("id").cast("string")).alias("doc_id"),
        F.col("id").alias("n"),
    ).createOrReplaceTempView("bp_src2")
    e.sql("INSERT INTO bp SELECT * FROM bp_src2")
    path = e.catalog.table_path(e.catalog.get_table("bp"))
    manifest = skipping.load(path)
    with_blooms = sum(1 for m in manifest.values() if skipping.BLOOM_KEY in m)
    assert with_blooms >= 1, "post-SET writes harvest blooms"
    # refresh backfills the pre-SET files too
    e.catalog.refresh_file_stats("bp")
    manifest = skipping.load(path)
    assert all(skipping.BLOOM_KEY in m for m in manifest.values())
