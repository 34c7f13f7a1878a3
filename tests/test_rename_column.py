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
    with pytest.raises(ValueError, match="already exists"):
        e.catalog.rename_column("t", "val", "note")
    with pytest.raises(KeyError):
        e.catalog.rename_column("t", "nope", "x")
    e.sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (val > 0)")
    with pytest.raises(ValueError, match="v_pos"):
        e.catalog.rename_column("t", "val", "amount")


def test_rename_pk_column_full_lifecycle(spark, tmp_path):
    """r7 (VERDICT r6 item 4): PK columns rename through the same
    persisted physical_name mapping — merge semantics stay keyed by the
    on-disk physical column across upsert / point ops / compaction /
    time travel / session reattach."""
    e = _mk(spark, tmp_path, "wh_rc_pk")
    e.sql("ALTER TABLE t RENAME COLUMN id TO key")
    # upserts under the new PK name collide with pre-rename rows
    e.sql("INSERT INTO t VALUES (1, 11, 'a2'), (3, 30, 'c')")
    got = sorted((r.key, r.val) for r in e.sql("SELECT key, val FROM t").collect())
    assert got == [(1, 11), (2, 20), (3, 30)]
    # point lookup + point delete by the new name
    assert e.catalog.lookup("t", 3).collect()[0]["val"] == 30
    e.sql("DELETE FROM t WHERE key = 2")
    assert {r.key for r in e.sql("SELECT key FROM t").collect()} == {1, 3}
    # time travel across the rename resolves old state under new names
    tt = {r["key"]: r["val"]
          for r in e.catalog.read("t", as_of_seq=1).collect()}
    assert tt == {1: 10, 2: 20}
    # compaction keeps the mapping (merged files still store the
    # physical name; the spec translates)
    e.catalog.compact("t")
    got = sorted((r.key, r.val) for r in e.sql("SELECT key, val FROM t").collect())
    assert got == [(1, 11), (3, 30)]
    # no data file carries the logical name
    import fluss_datafusion_spark.catalog.catalog as C
    spec = e.catalog.get_table("t")
    for f in C._parquet_files(e.catalog.table_path(spec)):
        import pyarrow.parquet as pq
        assert "key" not in pq.read_schema(f).names
        assert "id" in pq.read_schema(f).names
    # a fresh session re-attaches the mapping from _spec.json
    e2 = EngineSession(spark=spark, warehouse=e.catalog.warehouse)
    got = sorted((r.key, r.val) for r in e2.sql("SELECT key, val FROM t").collect())
    assert got == [(1, 11), (3, 30)]
    e2.sql("INSERT INTO t VALUES (1, 12, 'a3')")
    assert e2.catalog.lookup("t", 1).collect()[0]["val"] == 12


def test_rename_composite_pk_component(spark, tmp_path):
    """One component of a composite PK renames; composite lookups,
    MERGE (on= must name the logical PK), and upsert identity all
    follow."""
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_rc_cpk"))
    e.sql(
        "CREATE TABLE c2 (a BIGINT NOT NULL, b BIGINT NOT NULL, v STRING,"
        " PRIMARY KEY (a, b))"
    )
    e.sql("INSERT INTO c2 VALUES (1, 1, 'x'), (1, 2, 'y')")
    e.sql("ALTER TABLE c2 RENAME COLUMN b TO sub")
    e.sql("INSERT INTO c2 VALUES (1, 2, 'y2')")  # upsert over (1,2)
    got = sorted((r.a, r.sub, r.v) for r in e.sql("SELECT * FROM c2").collect())
    assert got == [(1, 1, "x"), (1, 2, "y2")]
    assert e.catalog.lookup("c2", {"a": 1, "sub": 2}).collect()[0]["v"] == "y2"
    res = e.sql(
        "MERGE INTO c2 USING (SELECT 1 AS a, 1 AS sub, 'x2' AS v) s"
        " ON c2.a = s.a AND c2.sub = s.sub"
        " WHEN MATCHED THEN UPDATE SET v = s.v"
    ).collect()[0]
    assert res.upserted == 1
    assert e.catalog.lookup("c2", {"a": 1, "sub": 1}).collect()[0]["v"] == "x2"


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


# -- layout-column renames (r6: partition/bucket column mapping) --------------


def _mk_layout(spark, tmp_path, name):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / name))
    e.sql(
        "CREATE TABLE lt (id BIGINT NOT NULL, region STRING, grp BIGINT,"
        " v BIGINT, PRIMARY KEY (id))"
        " PARTITIONED BY (region) DISTRIBUTED BY (grp) INTO 4 BUCKETS"
    )
    e.sql(
        "INSERT INTO lt VALUES (1, 'eu', 1, 10), (2, 'eu', 2, 20),"
        " (3, 'us', 1, 30), (4, 'us', 2, 40)"
    )
    return e


def test_rename_partition_column_reads_writes_dirs(spark, tmp_path):
    import os

    e = _mk_layout(spark, tmp_path, "wh_rlp1")
    e.sql("ALTER TABLE lt RENAME COLUMN region TO zone")
    # reads under the new name, partition values intact
    got = sorted((r.id, r.zone) for r in e.sql("SELECT id, zone FROM lt").collect())
    assert got == [(1, "eu"), (2, "eu"), (3, "us"), (4, "us")]
    # filters on the renamed partition column still partition-prune
    assert e.sql("SELECT count(*) AS n FROM lt WHERE zone = 'eu'").collect()[0].n == 2
    # writes under the new name land in the ORIGINAL directory layout
    e.sql("INSERT INTO lt VALUES (5, 'ap', 1, 50)")
    path = os.path.join(e.catalog.warehouse, "fluss", "lt")
    dirs = {d for d in os.listdir(path) if "=" in d}
    assert dirs == {"region=eu", "region=us", "region=ap"}, (
        "directory names keep the physical column name"
    )
    got = sorted((r.id, r.zone, r.v) for r in e.sql("SELECT id, zone, v FROM lt").collect())
    assert got == [(1, "eu", 10), (2, "eu", 20), (3, "us", 30), (4, "us", 40), (5, "ap", 50)]
    # upserts across the rename still merge per key
    e.sql("INSERT INTO lt VALUES (1, 'eu', 1, 11)")
    assert e.sql("SELECT v FROM lt WHERE id = 1").collect()[0].v == 11


def test_rename_bucket_column_pruning_and_colocation(spark, tmp_path):
    e = _mk_layout(spark, tmp_path, "wh_rlp2")
    e.sql("ALTER TABLE lt RENAME COLUMN grp TO bucket_key")
    got = sorted((r.id, r.bucket_key) for r in e.sql("SELECT id, bucket_key FROM lt").collect())
    assert got == [(1, 1), (2, 2), (3, 1), (4, 2)]
    # PK point lookup (bucket-pruned path) still answers
    row = e.catalog.lookup("lt", 2).collect()
    assert len(row) == 1 and row[0].bucket_key == 2
    # writes bucket by the SAME hash: old and new rows for one key value
    # land in the same __bkt__ directory (pre/post-rename colocation)
    e.sql("INSERT INTO lt VALUES (6, 'eu', 1, 60)")
    import os

    path = os.path.join(e.catalog.warehouse, "fluss", "lt")
    bkt_of = {}
    for root, _dirs, files in os.walk(path):
        if "__bkt__=" in root and any(f.endswith(".parquet") for f in files):
            bkt = [p for p in root.split(os.sep) if p.startswith("__bkt__=")][0]
            for r in e.spark.read.parquet(root).collect():
                if "bucket_key" in r.__fields__ or "grp" in r.__fields__:
                    key = r["grp"] if "grp" in r.__fields__ else r["bucket_key"]
                    bkt_of.setdefault(key, set()).add(bkt)
    assert all(len(v) == 1 for v in bkt_of.values()), (
        "each bucket-key value lives in exactly one bucket dir across the rename",
        bkt_of,
    )


def test_rename_layout_column_show_partitions_and_reattach(spark, tmp_path):
    e = _mk_layout(spark, tmp_path, "wh_rlp3")
    e.sql("ALTER TABLE lt RENAME COLUMN region TO zone")
    rows = e.sql("SHOW PARTITIONS lt").collect()
    quals = {r.partition_qualified_name for r in rows}
    assert quals == {"zone=eu", "zone=us"}, (
        "SHOW PARTITIONS translates directory names to the logical name",
        quals,
    )
    # a fresh session over the same warehouse sees the mapping
    e2 = EngineSession(spark=spark, warehouse=e.catalog.warehouse)
    got = sorted((r.id, r.zone) for r in e2.sql("SELECT id, zone FROM lt").collect())
    assert got == [(1, "eu"), (2, "eu"), (3, "us"), (4, "us")]
    e2.sql("INSERT INTO lt VALUES (9, 'eu', 1, 90)")
    assert e2.sql("SELECT count(*) AS n FROM lt WHERE zone = 'eu'").collect()[0].n == 3


def test_rename_layout_column_maintenance_and_skipping(spark, tmp_path):
    from fluss_datafusion_spark.catalog import skipping
    from fluss_datafusion_spark.catalog.catalog import _parquet_files

    e = _mk_layout(spark, tmp_path, "wh_rlp4")
    e.sql("ALTER TABLE lt RENAME COLUMN region TO zone")
    e.sql("ALTER TABLE lt RENAME COLUMN v TO amount")
    # OPTIMIZE and COMPACT keep the physical directory layout working
    e.catalog.optimize("lt")
    got = sorted((r.id, r.zone, r.amount) for r in e.sql("SELECT id, zone, amount FROM lt").collect())
    assert got == [(1, "eu", 10), (2, "eu", 20), (3, "us", 30), (4, "us", 40)]
    e.sql("INSERT INTO lt VALUES (1, 'eu', 1, 11)")
    e.catalog.compact("lt")
    got = sorted((r.id, r.amount) for r in e.sql("SELECT id, amount FROM lt").collect())
    assert got == [(1, 11), (2, 20), (3, 30), (4, 40)]
    # skipping prune translates renamed PK-allowed predicate names; a
    # predicate on the renamed non-PK column keeps all files (PK rule)
    spec = e.catalog.get_table("lt")
    path = e.catalog.table_path(spec)
    files = sorted(_parquet_files(path))
    kept = skipping.prune(
        path, files, "amount = 11", None,
        rename_map={"amount": "v", "zone": "region"},
    )
    assert len(kept) <= len(files)
    rows = e.catalog.read("lt", predicate="id = 2").collect()
    assert len(rows) == 1 and rows[0].amount == 20
