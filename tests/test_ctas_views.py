"""CREATE TABLE AS SELECT and logical (non-materialized) views
(catalog/ddl.py parse_ctas/parse_create_view, catalog.create_view)."""

import pytest

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.catalog import ddl


def _mk(spark, tmp_path, name):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / name))
    e.sql("CREATE TABLE base (id BIGINT NOT NULL, g STRING, x BIGINT,"
          " PRIMARY KEY (id))")
    e.sql("INSERT INTO base VALUES (1, 'a', 10), (2, 'b', 20), (3, 'a', 5)")
    return e


# -- parsers ------------------------------------------------------------------


def test_parse_ctas_forms():
    name, layout, select, ine = ddl.parse_ctas(
        "CREATE TABLE t PRIMARY KEY (k) PARTITIONED BY (g)"
        " DISTRIBUTED BY (k) INTO 4 BUCKETS WITH ('a' = 'b')"
        " AS SELECT k, g FROM src"
    )
    assert name == "fluss.t" and not ine
    assert layout["primary_key"] == ["k"]
    assert layout["partition_keys"] == ["g"]
    assert layout["bucket_keys"] == ["k"] and layout["num_buckets"] == 4
    assert layout["properties"] == {"a": "b"}
    assert select == "SELECT k, g FROM src"
    # IF NOT EXISTS + qualified + CTE select
    name, _, select, ine = ddl.parse_ctas(
        "CREATE TABLE IF NOT EXISTS db2.t2 AS WITH c AS (SELECT 1 AS v)"
        " SELECT * FROM c"
    )
    assert name == "db2.t2" and ine and select.startswith("WITH c")
    # a column list is NOT a CTAS; neither is CLONE
    assert ddl.parse_ctas("CREATE TABLE t (a INT) WITH ('x'='y')") is None
    assert ddl.parse_ctas("CREATE TABLE t2 SHALLOW CLONE t1") is None
    # 'AS' inside a string literal must not split
    assert ddl.parse_ctas(
        "CREATE TABLE t WITH ('note' = 'AS SELECT trap') AS SELECT 1 AS a"
    )[2] == "SELECT 1 AS a"


def test_parse_view_forms():
    assert ddl.parse_create_view("CREATE VIEW v AS SELECT 1 AS a") == (
        "v", "SELECT 1 AS a", False,
    )
    assert ddl.parse_create_view(
        "CREATE OR REPLACE VIEW d.v AS SELECT 2 AS b"
    ) == ("d.v", "SELECT 2 AS b", True)
    # MATERIALIZED views take the other path
    assert ddl.parse_create_view(
        "CREATE MATERIALIZED VIEW v AS SELECT 1 AS a"
    ) is None
    assert ddl.parse_drop_view("DROP VIEW v") == ("v", False)
    assert ddl.parse_drop_view("DROP VIEW IF EXISTS d.v") == ("d.v", True)


# -- CTAS ---------------------------------------------------------------------


def test_ctas_log_table(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_ctas1")
    n = e.sql(
        "CREATE TABLE agg AS SELECT g, sum(x) AS sx FROM base GROUP BY g"
    ).collect()[0][0]
    assert n == 2
    got = sorted(tuple(r) for r in e.sql("SELECT * FROM agg").collect())
    assert got == [("a", 15), ("b", 20)]
    spec = e.catalog.get_table("agg")
    assert not spec.has_primary_key
    assert [c.type_name.lower() for c in spec.columns] == ["string", "bigint"]


def test_ctas_pk_table_upserts(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_ctas2")
    e.sql(
        "CREATE TABLE snap PRIMARY KEY (id) AS"
        " SELECT id, g, x FROM base WHERE x >= 10"
    )
    spec = e.catalog.get_table("snap")
    assert spec.primary_key == ["id"]
    # it is a real PK table: upserts merge
    e.sql("INSERT INTO snap VALUES (1, 'z', 99)")
    got = {r.id: (r.g, r.x) for r in e.sql("SELECT * FROM snap").collect()}
    assert got == {1: ("z", 99), 2: ("b", 20)}
    # IF NOT EXISTS is a no-op the second time
    n = e.sql(
        "CREATE TABLE IF NOT EXISTS snap PRIMARY KEY (id) AS"
        " SELECT id, g, x FROM base"
    ).count()
    assert n == 0
    assert {r.id for r in e.sql("SELECT * FROM snap").collect()} == {1, 2}


def test_ctas_with_layout(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_ctas3")
    e.sql(
        "CREATE TABLE lay PARTITIONED BY (g) AS SELECT g, x FROM base"
    )
    spec = e.catalog.get_table("lay")
    assert spec.partition_keys == ["g"]
    assert e.sql("SELECT count(*) FROM lay").collect()[0][0] == 3


# -- logical views ------------------------------------------------------------


def test_view_tracks_base_table_writes(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_v1")
    e.sql("CREATE VIEW v AS SELECT g, sum(x) AS sx FROM base GROUP BY g")
    got = sorted(tuple(r) for r in e.sql("SELECT * FROM v").collect())
    assert got == [("a", 15), ("b", 20)]
    # the view must see subsequent writes (temp views freeze analyzed
    # plans — the rebind hook is what makes this pass)
    e.sql("INSERT INTO base VALUES (4, 'a', 100)")
    got = sorted(tuple(r) for r in e.sql("SELECT * FROM v").collect())
    assert got == [("a", 115), ("b", 20)]
    e.sql("UPDATE base SET x = 0 WHERE id = 2")
    got = sorted(tuple(r) for r in e.sql("SELECT * FROM v").collect())
    assert got == [("a", 115), ("b", 0)]


def test_view_on_view_and_replace(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_v2")
    e.sql("CREATE VIEW v1 AS SELECT g, x FROM base WHERE x >= 10")
    e.sql("CREATE VIEW v2 AS SELECT g, count(*) AS n FROM v1 GROUP BY g")
    got = sorted(tuple(r) for r in e.sql("SELECT * FROM v2").collect())
    assert got == [("a", 1), ("b", 1)]
    e.sql("INSERT INTO base VALUES (5, 'a', 50)")
    got = sorted(tuple(r) for r in e.sql("SELECT * FROM v2").collect())
    assert got == [("a", 2), ("b", 1)]
    with pytest.raises(ValueError, match="already exists"):
        e.sql("CREATE VIEW v1 AS SELECT 1 AS one")
    e.sql("CREATE OR REPLACE VIEW v1 AS SELECT g, x FROM base WHERE x < 10")
    got = sorted(tuple(r) for r in e.sql("SELECT * FROM v2").collect())
    assert got == [("a", 1)]


def test_view_persists_across_sessions(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_v3")
    e.sql("CREATE VIEW v AS SELECT count(*) AS n FROM base")
    e2 = EngineSession(spark=spark, warehouse=e.catalog.warehouse)
    assert e2.sql("SELECT * FROM v").collect()[0].n == 3
    e2.sql("INSERT INTO base VALUES (9, 'c', 1)")
    assert e2.sql("SELECT * FROM v").collect()[0].n == 4


def test_view_drop_and_metadata(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_v4")
    e.sql("CREATE VIEW v AS SELECT id FROM base")
    rows = {
        (r.table_name, r.table_type)
        for r in e.sql(
            "SELECT table_name, table_type FROM information_schema.tables"
        ).collect()
    }
    assert ("v", "VIEW") in rows and ("base", "BASE TABLE") in rows
    [d] = e.sql(
        "SELECT view_definition FROM information_schema.views"
        " WHERE table_name = 'v'"
    ).collect()
    assert d.view_definition == "SELECT id FROM base"
    shown = {r[0] for r in e.sql("SHOW TABLES").collect()}
    assert "v" in shown
    e.sql("DROP VIEW v")
    with pytest.raises(Exception):
        e.sql("SELECT * FROM v").collect()
    e.sql("DROP VIEW IF EXISTS v")  # idempotent with IF EXISTS
    with pytest.raises(KeyError):
        e.sql("DROP VIEW v")


def test_view_name_collision_with_table(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_v5")
    with pytest.raises(ValueError, match="table named"):
        e.sql("CREATE VIEW base AS SELECT 1 AS a")


def test_view_unbinds_when_base_dropped(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_v6")
    e.sql("CREATE TABLE tmp_t (a BIGINT)")
    e.sql("INSERT INTO tmp_t VALUES (1)")
    e.sql("CREATE VIEW v AS SELECT * FROM tmp_t")
    assert e.sql("SELECT * FROM v").count() == 1
    e.sql("DROP TABLE tmp_t")
    with pytest.raises(Exception):
        e.sql("SELECT * FROM v").collect()
