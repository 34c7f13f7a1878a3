"""ALTER TABLE RENAME COLUMN via column mapping: no data rewrite, reads
translate at the boundary, refusals for load-bearing columns, and
survival across upsert / maintenance / clone / session re-attach."""

import pytest

from fluss_datafusion_spark import EngineSession


def _mk(spark, tmp_path, name):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / name))
    e.sql(
        "CREATE TABLE t (id BIGINT NOT NULL, val BIGINT, note STRING,"
        " PRIMARY KEY (id))"
    )
    e.sql("INSERT INTO t VALUES (1, 10, 'a'), (2, 20, 'b')")
    return e


def test_rename_column_reads_and_writes(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_rc1")
    e.sql("ALTER TABLE t RENAME COLUMN val TO amount")
    got = sorted((r.id, r.amount, r.note)
                 for r in e.sql("SELECT id, amount, note FROM t").collect())
    assert got == [(1, 10, "a"), (2, 20, "b")]
    # writes under the NEW name upsert correctly over pre-rename rows
    e.sql("INSERT INTO t VALUES (1, 11, 'a2'), (3, 30, 'c')")
    got = sorted((r.id, r.amount) for r in e.sql("SELECT id, amount FROM t").collect())
    assert got == [(1, 11), (2, 20), (3, 30)]
    # the old name is gone
    with pytest.raises(Exception):
        e.sql("SELECT val FROM t").collect()


def test_rename_column_no_file_rewrite_and_maintenance(spark, tmp_path):
    import os

    e = _mk(spark, tmp_path, "wh_rc2")
    path = os.path.join(e.catalog.warehouse, "fluss", "t")
    mtimes_before = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    }
    e.sql("ALTER TABLE t RENAME COLUMN val TO amount")
    mtimes_after = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    }
    assert mtimes_before == mtimes_after  # pure metadata change

    # optimize + compact rewrite under PHYSICAL names; reads stay logical
    e.catalog.optimize("t")
    assert sorted(r.amount for r in e.sql("SELECT amount FROM t").collect()) == [10, 20]
    e.sql("INSERT INTO t VALUES (2, 21, 'b2')")
    e.catalog.compact("t")
    got = sorted((r.id, r.amount) for r in e.sql("SELECT id, amount FROM t").collect())
    assert got == [(1, 10), (2, 21)]
    # and a further rename chains (amount -> total) after the rewrite
    e.sql("ALTER TABLE t RENAME COLUMN amount TO total")
    assert sorted(r.total for r in e.sql("SELECT total FROM t").collect()) == [10, 21]


def test_rename_column_refusals(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_rc3")
    with pytest.raises(ValueError, match="load-bearing"):
        e.catalog.rename_column("t", "id", "key")
    with pytest.raises(ValueError, match="already exists"):
        e.catalog.rename_column("t", "val", "note")
    with pytest.raises(KeyError):
        e.catalog.rename_column("t", "nope", "x")
    e.sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (val > 0)")
    with pytest.raises(ValueError, match="v_pos"):
        e.catalog.rename_column("t", "val", "amount")


def test_rename_column_survives_reattach_and_clone(spark, tmp_path):
    wh = str(tmp_path / "wh_rc4")
    e = EngineSession(spark=spark, warehouse=wh)
    e.sql("CREATE TABLE t (id BIGINT NOT NULL, val BIGINT, PRIMARY KEY (id))")
    e.sql("INSERT INTO t VALUES (1, 10)")
    e.sql("ALTER TABLE t RENAME COLUMN val TO amount")
    e.sql("CREATE TABLE t2 CLONE t")
    assert [r.amount for r in e.sql("SELECT amount FROM t2").collect()] == [10]
    e2 = EngineSession(spark=spark, warehouse=wh)
    assert [r.amount for r in e2.sql("SELECT amount FROM t").collect()] == [10]
    spec = e2.catalog.get_table("t")
    assert spec.column("amount").physical_name == "val"


def test_rename_column_skipping_scan_still_prunes(spark, tmp_path):
    """Log-table file skipping translates the logical predicate column
    to the physical manifest key."""
    from fluss_datafusion_spark.catalog import skipping
    from fluss_datafusion_spark.catalog.catalog import _parquet_files

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_rc5"))
    e.sql("CREATE TABLE logs (x BIGINT, s STRING)")
    for i in range(3):
        e.sql(f"INSERT INTO logs VALUES ({i * 100}, 'a'), ({i * 100 + 9}, 'b')")
    e.sql("ALTER TABLE logs RENAME COLUMN x TO metric")
    got = sorted(
        r.metric
        for r in e.catalog.read("logs", predicate="metric BETWEEN 100 AND 109").collect()
    )
    assert got == [100, 109]
    path = e.catalog.table_path(e.catalog.get_table("logs"))
    files = sorted(_parquet_files(path))
    kept = skipping.prune(
        path, files, "metric BETWEEN 100 AND 109", None,
        rename_map={"metric": "x"},
    )
    assert len(kept) < len(files)


def test_add_column_refuses_recycled_physical_name(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_rc6")
    e.sql("ALTER TABLE t RENAME COLUMN val TO amount")
    with pytest.raises(ValueError, match="physical"):
        e.sql("ALTER TABLE t ADD COLUMN val BIGINT")
    e.sql("ALTER TABLE t ADD COLUMN val2 BIGINT")  # fresh name fine
