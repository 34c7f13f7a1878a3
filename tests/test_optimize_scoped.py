"""Partition-scoped OPTIMIZE (r7): ``OPTIMIZE t WHERE p = 'x' [ZORDER
BY ...]`` rewrites ONLY the matching partition directories — other
partitions' files are byte-untouched, the commit dir and spec never
move, and the maintenance window shrinks to the scoped subtree."""

import os

import pytest

from fluss_datafusion_spark import EngineSession


def _files_under(path):
    return {
        os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and "_file_stats" not in r
    }


def _mk(spark, tmp_path, name):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / name))
    e.sql(
        "CREATE TABLE pt (id BIGINT NOT NULL, p STRING, v BIGINT,"
        " PRIMARY KEY (id)) PARTITIONED BY (p)"
    )
    rid = 0
    for batch in range(3):  # 3 small files per partition
        vals = ", ".join(
            f"({rid + i}, '{part}', {(rid + i) * 10})"
            for i, part in enumerate(["a", "b", "c"])
        )
        e.sql(f"INSERT INTO pt VALUES {vals}")
        rid += 3
    return e


def test_scoped_optimize_rewrites_only_matching_partition(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_so1")
    path = e.catalog.table_path(e.catalog.get_table("pt"))
    before = _files_under(path)
    before_rows = sorted(tuple(r) for r in e.sql("SELECT * FROM pt").collect())

    n = e.sql("OPTIMIZE pt WHERE p = 'a'").collect()[0]["n_files"]
    assert n >= 1

    after = _files_under(path)
    # p=a rewritten: none of its old files survive
    assert not any("p=a" in f for f in set(before) & set(after))
    # p=b / p=c byte-untouched (same files, same mtimes)
    for f, mt in before.items():
        if "p=b" in f or "p=c" in f:
            assert after.get(f) == mt, f"untargeted partition touched: {f}"
    # data identical; seq history intact (no counter reset)
    assert sorted(tuple(r) for r in e.sql("SELECT * FROM pt").collect()) == before_rows
    seqs = sorted(
        r["__seq__"]
        for r in e.sql("SELECT DISTINCT __seq__ FROM pt$history").collect()
    )
    assert seqs == [1, 2, 3]
    # time travel across the scoped rewrite still resolves
    assert e.catalog.read("pt", as_of_seq=1).count() == 3
    # and further writes keep working
    e.sql("INSERT INTO pt VALUES (99, 'a', 990)")
    assert e.sql("SELECT count(*) AS n FROM pt").collect()[0].n == 10


def test_scoped_optimize_in_list_and_consolidation(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_so2")
    path = e.catalog.table_path(e.catalog.get_table("pt"))
    n_a_before = len([f for f in _files_under(path) if "p=a" in f])
    assert n_a_before == 3
    e.sql("OPTIMIZE pt WHERE p IN ('a', 'b')")
    files = _files_under(path)
    assert len([f for f in files if "p=a" in f]) == 1, "consolidated"
    assert len([f for f in files if "p=b" in f]) == 1
    assert len([f for f in files if "p=c" in f]) == 3, "out of scope"
    assert e.sql("SELECT count(*) AS n FROM pt").collect()[0].n == 9


def test_scoped_optimize_refusals(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_so3")
    with pytest.raises(ValueError, match="partition columns"):
        e.sql("OPTIMIZE pt WHERE v = 10")  # not a partition column
    with pytest.raises(ValueError, match="cannot scope"):
        e.sql("OPTIMIZE pt WHERE p = 'a' OR p = 'b'")  # OR unsupported
    e2 = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_so3b"))
    e2.sql("CREATE TABLE flat (id BIGINT, v BIGINT)")
    e2.sql("INSERT INTO flat VALUES (1, 1)")
    with pytest.raises(ValueError, match="partitioned table"):
        e2.sql("OPTIMIZE flat WHERE id = 1")


def test_scoped_optimize_missing_partition_is_noop(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_so4")
    path = e.catalog.table_path(e.catalog.get_table("pt"))
    before = _files_under(path)
    assert e.sql("OPTIMIZE pt WHERE p = 'zzz'").collect()[0]["n_files"] == 0
    assert _files_under(path) == before


def test_scoped_optimize_zorder_within_partition(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_so5")
    e.sql("OPTIMIZE pt WHERE p = 'a' ZORDER BY (v)")
    got = sorted(
        tuple(r) for r in e.sql("SELECT id, p, v FROM pt WHERE p = 'a'").collect()
    )
    assert len(got) == 3 and all(r[1] == "a" for r in got)
    # stamps survive: time travel anchors below still resolve
    assert e.catalog.read("pt", as_of_seq=2).count() == 6
