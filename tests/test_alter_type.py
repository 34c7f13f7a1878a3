"""ALTER TABLE ... ALTER COLUMN ... TYPE — type widening via schema
evolution (catalog.alter_column_type): the spec records the wider type,
Spark 4's parquet readers upcast old files at scan time, no rewrite."""

import pytest

from fluss_datafusion_spark import EngineSession


def _mk(spark, tmp_path, name):
    return EngineSession(spark=spark, warehouse=str(tmp_path / name))


def test_widen_int_to_bigint_reads_old_files(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_at1")
    e.sql("CREATE TABLE t1 (id BIGINT NOT NULL, n INT, PRIMARY KEY (id))")
    e.sql("INSERT INTO t1 VALUES (1, 5), (2, 7)")
    e.sql("ALTER TABLE t1 ALTER COLUMN n TYPE BIGINT")
    # old files upcast in place; new writes exceed int range
    e.sql("INSERT INTO t1 VALUES (3, 5000000000)")
    rows = {r.id: r.n for r in e.sql("SELECT id, n FROM t1").collect()}
    assert rows == {1: 5, 2: 7, 3: 5000000000}
    [t] = [
        r.data_type
        for r in e.sql("DESCRIBE t1").collect()
        if r.column_name == "n"
    ]
    assert t.lower() == "bigint"


def test_widen_float_to_double_and_int_to_double(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_at2")
    e.sql("CREATE TABLE t2 (id BIGINT NOT NULL, f FLOAT, n INT,"
          " PRIMARY KEY (id))")
    e.sql("INSERT INTO t2 VALUES (1, 1.5, 3)")
    e.sql("ALTER TABLE t2 ALTER COLUMN f TYPE DOUBLE")
    e.sql("ALTER TABLE t2 ALTER COLUMN n SET DATA TYPE DOUBLE")
    row = e.sql("SELECT f, n FROM t2").collect()[0]
    assert row.f == 1.5 and row.n == 3.0
    assert dict(e.sql("SELECT * FROM t2").dtypes)["n"] == "double"


def test_widen_refusals(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_at3")
    e.sql(
        "CREATE TABLE t3 (id INT NOT NULL, b BIGINT, s STRING, g INT,"
        " PRIMARY KEY (id)) PARTITIONED BY (g)"
        " DISTRIBUTED BY (id) INTO 2 BUCKETS"
    )
    with pytest.raises(ValueError, match="widening"):
        e.sql("ALTER TABLE t3 ALTER COLUMN b TYPE INT")  # narrowing
    with pytest.raises(ValueError, match="widening"):
        e.sql("ALTER TABLE t3 ALTER COLUMN s TYPE BIGINT")  # cross-class
    with pytest.raises(ValueError, match="hash layouts"):
        e.sql("ALTER TABLE t3 ALTER COLUMN id TYPE BIGINT")  # PK+bucket
    with pytest.raises(ValueError, match="hash layouts"):
        e.sql("ALTER TABLE t3 ALTER COLUMN g TYPE BIGINT")  # partition
    with pytest.raises(KeyError):
        e.sql("ALTER TABLE t3 ALTER COLUMN nope TYPE BIGINT")


def test_widen_survives_update_compact_and_reattach(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_at4")
    e.sql("CREATE TABLE t4 (id BIGINT NOT NULL, n INT, PRIMARY KEY (id))")
    e.sql("INSERT INTO t4 VALUES (1, 10), (2, 20)")
    e.sql("ALTER TABLE t4 ALTER COLUMN n TYPE BIGINT")
    # merge-on-read across mixed-width files
    e.sql("UPDATE t4 SET n = 6000000000 WHERE id = 2")
    got = {r.id: r.n for r in e.sql("SELECT * FROM t4").collect()}
    assert got == {1: 10, 2: 6000000000}
    # compaction rewrites at the wider type; history floor intact
    e.catalog.compact("t4")
    got = {r.id: r.n for r in e.sql("SELECT * FROM t4").collect()}
    assert got == {1: 10, 2: 6000000000}
    # a fresh session re-attaches the widened spec
    e2 = EngineSession(spark=spark, warehouse=e.catalog.warehouse)
    got = {r.id: r.n for r in e2.sql("SELECT * FROM t4").collect()}
    assert got == {1: 10, 2: 6000000000}
    assert dict(e2.sql("SELECT * FROM t4").dtypes)["n"] == "bigint"


def test_widen_is_noop_for_same_type(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_at5")
    e.sql("CREATE TABLE t5 (id BIGINT NOT NULL, n INT, PRIMARY KEY (id))")
    e.sql("ALTER TABLE t5 ALTER COLUMN n TYPE INT")
    assert dict(e.sql("SELECT * FROM t5").dtypes)["n"] == "int"


def test_widen_with_time_travel(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_at6")
    e.sql("CREATE TABLE t6 (id BIGINT NOT NULL, n INT, PRIMARY KEY (id))")
    e.sql("INSERT INTO t6 VALUES (1, 1)")
    anchor = e.catalog.current_seq("t6")
    e.sql("ALTER TABLE t6 ALTER COLUMN n TYPE BIGINT")
    e.sql("INSERT INTO t6 VALUES (2, 9000000000)")
    old = e.catalog.read("t6", as_of_seq=anchor).collect()
    assert [(r.id, r.n) for r in old] == [(1, 1)]
