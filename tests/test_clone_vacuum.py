"""CLONE TABLE (shallow/deep) and VACUUM: snapshot independence, history
and floor carry-over, hardlink vs byte-copy, swap-leftover cleanup."""

import os

import pytest

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.catalog.ddl import parse_clone, parse_vacuum


def _mk(spark, tmp_path, name):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / name))
    e.sql(
        "CREATE TABLE src (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))"
    )
    e.sql("INSERT INTO src VALUES (1, 'a'), (2, 'b')")
    e.sql("INSERT INTO src VALUES (2, 'b2'), (3, 'c')")  # update + insert
    return e


def _rows(e, table):
    return sorted((r.id, r.v) for r in e.sql(f"SELECT * FROM {table}").collect())


def test_parse_clone_and_vacuum():
    assert parse_clone("CREATE TABLE t2 CLONE t1") == ("t2", "t1", False, False)
    assert parse_clone("CREATE TABLE t2 SHALLOW CLONE t1") == ("t2", "t1", False, False)
    assert parse_clone("CREATE TABLE IF NOT EXISTS d.t2 DEEP CLONE `t1`;") == ("d.t2", "t1", True, True)
    assert parse_clone("CREATE TABLE t2 (x INT)") is None
    assert parse_vacuum("VACUUM t1") == "t1"
    assert parse_vacuum("VACUUM TABLE d.t1;") == "d.t1"
    assert parse_vacuum("SELECT 1") is None


def test_shallow_clone_snapshot_and_divergence(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_clone1")
    e.sql("CREATE TABLE dst CLONE src")
    assert _rows(e, "dst") == [(1, "a"), (2, "b2"), (3, "c")]

    # divergence: each side's writes are invisible to the other
    e.sql("INSERT INTO dst VALUES (4, 'd')")
    e.sql("INSERT INTO src VALUES (1, 'a9')")
    assert _rows(e, "dst") == [(1, "a"), (2, "b2"), (3, "c"), (4, "d")]
    assert _rows(e, "src") == [(1, "a9"), (2, "b2"), (3, "c")]

    # upsert history carried over: the clone's pre-clone version anchors
    # still resolve (seq 1 = first INSERT batch)
    v1 = sorted(
        (r.id, r.v) for r in e.sql("SELECT id, v FROM dst$v1").collect()
    )
    assert v1 == [(1, "a"), (2, "b")]


def test_shallow_clone_survives_source_rewrite(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_clone2")
    e.sql("CREATE TABLE dst CLONE src")
    # source optimize/compact swap the source DIRECTORY; the clone's
    # hardlinked inodes must keep its data intact
    e.catalog.optimize("src")
    e.catalog.compact("src")
    e.sql("INSERT INTO src VALUES (9, 'z')")
    assert _rows(e, "dst") == [(1, "a"), (2, "b2"), (3, "c")]
    assert (9, "z") in _rows(e, "src") and (9, "z") not in _rows(e, "dst")


def test_clone_seq_continues_not_reused(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_clone3")
    e.sql("CREATE TABLE dst CLONE src")
    # a post-clone write must take a HIGHER seq than any cloned row,
    # or upsert last-wins ordering would break
    e.sql("INSERT INTO dst VALUES (1, 'new')")
    assert (1, "new") in _rows(e, "dst")


def test_deep_clone_copies_bytes(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_clone4")
    e.sql("CREATE TABLE dsh CLONE src")
    e.sql("CREATE TABLE ddp DEEP CLONE src")
    wh = e.catalog.warehouse

    def links(table):
        out = []
        for root, _d, files in os.walk(os.path.join(wh, "fluss", table)):
            out += [os.stat(os.path.join(root, f)).st_nlink
                    for f in files if f.endswith(".parquet")]
        return out

    assert links("dsh") and all(n >= 2 for n in links("dsh"))
    assert links("ddp") and all(n == 1 for n in links("ddp"))
    assert _rows(e, "ddp") == _rows(e, "dsh") == _rows(e, "src")


def test_clone_carries_compaction_floor(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_clone5")
    e.catalog.compact("src")
    e.sql("CREATE TABLE dst CLONE src")
    with pytest.raises(Exception, match="compact"):
        e.catalog.read("dst", as_of_seq=1)


def test_clone_refuses_existing_target(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_clone6")
    e.sql("CREATE TABLE dst CLONE src")
    with pytest.raises(ValueError, match="already exists"):
        e.catalog.clone_table("src", "dst")
    # IF NOT EXISTS is a no-op success
    out = e.sql("CREATE TABLE IF NOT EXISTS dst CLONE src").collect()
    assert out == []
    assert _rows(e, "dst") == [(1, "a"), (2, "b2"), (3, "c")]


def test_vacuum_removes_swap_leftovers_only(spark, tmp_path):
    e = _mk(spark, tmp_path, "wh_vac")
    path = os.path.join(e.catalog.warehouse, "fluss", "src")
    os.makedirs(path + ".old", exist_ok=True)
    with open(os.path.join(path + ".old", "junk.parquet"), "w") as fh:
        fh.write("x")
    os.makedirs(path + ".optimize", exist_ok=True)
    with open(os.path.join(path, "_file_stats.json.tmp"), "w") as fh:
        fh.write("{}")
    removed = e.sql("VACUUM src").collect()[0][0]
    assert removed == 3
    assert not os.path.exists(path + ".old")
    assert not os.path.exists(path + ".optimize")
    assert _rows(e, "src") == [(1, "a"), (2, "b2"), (3, "c")]
    assert e.sql("VACUUM src").collect()[0][0] == 0
