"""COPY TO / COPY FROM (sources/copy.py): csv/json/parquet export +
ingest through the engine's normal insert path."""

import os

import pytest

from fluss_datafusion_spark.sources.copy import parse_copy


def test_parse_copy_forms():
    assert parse_copy("COPY t TO '/tmp/x.csv'") == ("t", "TO", "/tmp/x.csv", {})
    src, d, p, o = parse_copy(
        "COPY db.t TO '/tmp/x' (FORMAT CSV, HEADER false, DELIMITER '|')"
    )
    assert (src, d, p) == ("db.t", "TO", "/tmp/x")
    assert o == {"format": "CSV", "header": "false", "delimiter": "|"}
    src, d, p, o = parse_copy(
        "COPY (SELECT a FROM t WHERE a > 1) TO '/tmp/q' (FORMAT PARQUET, PARTITION_BY (a, b))"
    )
    assert src.startswith("(") and o["partition_by"] == ["a", "b"]
    assert parse_copy("COPY t FROM '/tmp/x.json'")[1] == "FROM"
    assert parse_copy("SELECT 1") is None


@pytest.fixture()
def cdb(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS cdb")
    yield engine
    for tbl in list(engine.catalog.databases.get("cdb", {})):
        engine.sql(f"DROP TABLE cdb.{tbl}")


def test_copy_roundtrip_csv(cdb, tmp_path):
    cdb.sql("CREATE TABLE cdb.c1 (id BIGINT NOT NULL, name STRING, v DOUBLE, PRIMARY KEY (id))")
    cdb.sql("INSERT INTO cdb.c1 VALUES (1,'a',1.5),(2,'b',2.5),(3,NULL,NULL)")
    out = str(tmp_path / "export_csv")
    n = cdb.sql(f"COPY cdb.c1 TO '{out}' (FORMAT CSV, HEADER true)").collect()[0].rows
    assert n == 3
    cdb.sql("CREATE TABLE cdb.c2 (id BIGINT NOT NULL, name STRING, v DOUBLE, PRIMARY KEY (id))")
    n = cdb.sql(f"COPY cdb.c2 FROM '{out}' (FORMAT CSV, HEADER true)").collect()[0].rows
    assert n == 3
    got = {(r.id, r.name, r.v) for r in cdb.sql("SELECT * FROM cdb.c2").collect()}
    assert got == {(1, "a", 1.5), (2, "b", 2.5), (3, None, None)}


def test_copy_to_count_observed_from_writing_plan(cdb, tmp_path, spark):
    """ADVICE r5: the reported row count comes from observe() metrics on
    the writing plan, not a second scan of the source — the contract is
    reported == what actually landed, even for sampled queries."""
    out = str(tmp_path / "export_rand")
    n = cdb.sql(
        f"COPY (SELECT id FROM range(1000) WHERE rand(42) < 0.5)"
        f" TO '{out}' (FORMAT PARQUET)"
    ).collect()[0].rows
    landed = spark.read.parquet(out).count()
    assert n == landed


def test_copy_query_to_json_and_back(cdb, tmp_path):
    cdb.sql("CREATE TABLE cdb.j1 (id BIGINT NOT NULL, s STRING, PRIMARY KEY (id))")
    cdb.sql("INSERT INTO cdb.j1 VALUES (1,'x'),(2,'y'),(3,'z')")
    out = str(tmp_path / "export_json")
    n = cdb.sql(
        f"COPY (SELECT id, s FROM cdb.j1 WHERE id <= 2) TO '{out}' (FORMAT JSON)"
    ).collect()[0].rows
    assert n == 2
    cdb.sql("CREATE TABLE cdb.j2 (id BIGINT NOT NULL, s STRING, PRIMARY KEY (id))")
    cdb.sql(f"COPY cdb.j2 FROM '{out}' (FORMAT JSON)")
    assert {(r.id, r.s) for r in cdb.sql("SELECT * FROM cdb.j2").collect()} == {
        (1, "x"), (2, "y"),
    }


def test_copy_from_is_pk_upsert(cdb, tmp_path):
    cdb.sql("CREATE TABLE cdb.u1 (id BIGINT NOT NULL, s STRING, PRIMARY KEY (id))")
    cdb.sql("INSERT INTO cdb.u1 VALUES (1,'old'),(2,'keep')")
    out = str(tmp_path / "upsert_parquet")
    cdb.sql("CREATE TABLE cdb.u_src (id BIGINT NOT NULL, s STRING, PRIMARY KEY (id))")
    cdb.sql("INSERT INTO cdb.u_src VALUES (1,'new'),(3,'add')")
    cdb.sql(f"COPY cdb.u_src TO '{out}' (FORMAT PARQUET)")
    cdb.sql(f"COPY cdb.u1 FROM '{out}' (FORMAT PARQUET)")
    got = {(r.id, r.s) for r in cdb.sql("SELECT * FROM cdb.u1").collect()}
    assert got == {(1, "new"), (2, "keep"), (3, "add")}


def test_copy_partition_by_layout(cdb, tmp_path):
    cdb.sql("CREATE TABLE cdb.p1 (id BIGINT NOT NULL, g STRING, PRIMARY KEY (id))")
    cdb.sql("INSERT INTO cdb.p1 VALUES (1,'a'),(2,'b'),(3,'a')")
    out = str(tmp_path / "part_parquet")
    cdb.sql(f"COPY cdb.p1 TO '{out}' (FORMAT PARQUET, PARTITION_BY (g))")
    assert os.path.isdir(os.path.join(out, "g=a")) and os.path.isdir(
        os.path.join(out, "g=b")
    )


def test_copy_from_column_mismatch_raises(cdb, tmp_path):
    cdb.sql("CREATE TABLE cdb.m1 (id BIGINT NOT NULL, s STRING, PRIMARY KEY (id))")
    cdb.sql("INSERT INTO cdb.m1 VALUES (1,'x')")
    out = str(tmp_path / "mm_parquet")
    cdb.sql(f"COPY (SELECT id, s, 1 AS extra FROM cdb.m1) TO '{out}' (FORMAT PARQUET)")
    with pytest.raises(ValueError, match="unexpected.*extra"):
        cdb.sql(f"COPY cdb.m1 FROM '{out}' (FORMAT PARQUET)")


def test_copy_unknown_format_raises(cdb, tmp_path):
    cdb.sql("CREATE TABLE cdb.f1 (id BIGINT NOT NULL, PRIMARY KEY (id))")
    with pytest.raises(ValueError, match="unknown or missing format"):
        cdb.sql(f"COPY cdb.f1 TO '{tmp_path}/x.xlsx'")


def test_copy_orc_roundtrip(spark, tmp_path):
    from fluss_datafusion_spark import EngineSession

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_orc"))
    e.sql("CREATE TABLE oc1 (id BIGINT NOT NULL, v DOUBLE, PRIMARY KEY (id))")
    e.sql("INSERT INTO oc1 SELECT id, id * 1.5e0 AS v FROM range(50)")
    out = str(tmp_path / "orc_out")
    n = e.sql(f"COPY oc1 TO '{out}' (FORMAT ORC)").collect()[0]["rows"]
    assert n == 50
    e.sql("CREATE TABLE oc2 (id BIGINT NOT NULL, v DOUBLE, PRIMARY KEY (id))")
    e.sql(f"COPY oc2 FROM '{out}' (FORMAT ORC)")
    got = e.sql("SELECT count(*) AS n, sum(v) AS sv FROM oc2").collect()[0]
    assert (got["n"], got["sv"]) == (50, sum(i * 1.5 for i in range(50)))
