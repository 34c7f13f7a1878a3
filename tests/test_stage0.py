"""Stage 0: the reference README's own demo sequence end-to-end
(/root/reference/README.md "Usage Examples"):

    CREATE TABLE user (id BIGINT NOT NULL, name STRING, PRIMARY KEY(id));
    INSERT INTO user VALUES (1, 'alice');
    SELECT * FROM user WHERE id = 1;

plus the PK-upsert quirks list from SURVEY.md §2.
"""

import pytest


@pytest.fixture()
def fresh_engine(spark, tmp_path):
    from fluss_datafusion_spark import EngineSession

    return EngineSession(spark=spark, warehouse=str(tmp_path / "warehouse"))


def test_readme_demo_sequence(fresh_engine):
    e = fresh_engine
    e.sql("CREATE TABLE user (id BIGINT NOT NULL, name STRING, PRIMARY KEY (id));")
    result = e.sql("INSERT INTO user VALUES (1, 'alice')").collect()
    assert result[0]["count"] == 1
    rows = e.sql("SELECT * FROM user WHERE id = 1").collect()
    assert len(rows) == 1
    assert rows[0]["id"] == 1 and rows[0]["name"] == "alice"


def test_insert_is_upsert(fresh_engine):
    """Duplicate-PK inserts keep the last row (src/provider.rs:411-441)."""
    e = fresh_engine
    e.sql("CREATE TABLE u2 (id BIGINT NOT NULL, name STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO u2 VALUES (1, 'alice'), (2, 'bob')")
    e.sql("INSERT INTO u2 VALUES (1, 'ALICE2')")
    rows = {r["id"]: r["name"] for r in e.sql("SELECT * FROM u2").collect()}
    assert rows == {1: "ALICE2", 2: "bob"}


def test_upsert_within_single_batch_last_wins(fresh_engine):
    e = fresh_engine
    e.sql("CREATE TABLE u3 (id BIGINT NOT NULL, name STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO u3 VALUES (7, 'first'), (7, 'second'), (7, 'third')")
    rows = e.sql("SELECT * FROM u3").collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "third"


def test_log_table_append_keeps_duplicates(fresh_engine):
    e = fresh_engine
    e.sql("CREATE TABLE logt (id BIGINT, name STRING)")
    e.sql("INSERT INTO logt VALUES (1, 'a')")
    e.sql("INSERT INTO logt VALUES (1, 'a')")
    assert e.sql("SELECT * FROM logt").count() == 2


def test_point_lookup_single_pk_only(fresh_engine):
    """Lookup path restricted to single-column PKs (src/provider.rs:144-146)."""
    e = fresh_engine
    e.sql(
        "CREATE TABLE u4 (id BIGINT NOT NULL, region STRING NOT NULL, name STRING, "
        "PRIMARY KEY (id, region))"
    )
    e.sql("INSERT INTO u4 VALUES (1, 'us', 'alice')")
    with pytest.raises(ValueError):
        e.catalog.lookup("u4", 1)
    # but the composite-PK table still upserts correctly
    e.sql("INSERT INTO u4 VALUES (1, 'us', 'alice2'), (1, 'eu', 'alice3')")
    rows = {(r["id"], r["region"]): r["name"] for r in e.sql("SELECT * FROM u4").collect()}
    assert rows == {(1, "us"): "alice2", (1, "eu"): "alice3"}


def test_insert_select_and_column_list(fresh_engine, testdata):
    e = fresh_engine
    e.sql("CREATE TABLE top_nations (nk INT NOT NULL, nname STRING, PRIMARY KEY (nk))")
    res = e.sql(
        "INSERT INTO top_nations SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5"
    ).collect()
    assert res[0]["count"] == 5
    e.sql("INSERT INTO top_nations (nk) VALUES (99)")
    rows = {r["nk"]: r["nname"] for r in e.sql("SELECT * FROM top_nations").collect()}
    assert rows[99] is None and len(rows) == 6


def test_partitioned_bucketed_create_and_insert(fresh_engine):
    e = fresh_engine
    e.sql(
        "CREATE TABLE events_partitioned ("
        " user_id BIGINT, event_type STRING, value DOUBLE, dt STRING, region STRING)"
        " PARTITIONED BY (dt, region)"
        " DISTRIBUTED BY (user_id) INTO 4 BUCKETS"
    )
    e.sql(
        "INSERT INTO events_partitioned VALUES "
        "(1, 'click', 1.0, '2024-01-15', 'US'), "
        "(2, 'view', 2.0, '2024-01-15', 'EU'), "
        "(3, 'click', 3.0, '2024-01-16', 'US')"
    )
    spec = e.catalog.get_table("events_partitioned")
    assert spec.partition_keys == ["dt", "region"]
    assert spec.num_buckets == 4
    assert e.sql("SELECT * FROM events_partitioned").count() == 3
    # partition pruning works through the Hive layout
    us = e.sql("SELECT * FROM events_partitioned WHERE dt = '2024-01-15' AND region = 'US'")
    assert us.count() == 1


def test_typed_all_roundtrip(fresh_engine):
    """DDL type-coverage table from FIXTURES.md."""
    e = fresh_engine
    e.sql(
        "CREATE TABLE typed_all ("
        " b BOOLEAN, t TINYINT, s SMALLINT, i INT, l BIGINT NOT NULL,"
        " f FLOAT, d DOUBLE, str STRING, bin BINARY,"
        " dt DATE, ts TIMESTAMP, dec DECIMAL(10,2),"
        " PRIMARY KEY (l))"
    )
    e.sql(
        "INSERT INTO typed_all VALUES (true, 1, 2, 3, 4, 1.5, 2.5, 'x', X'0102',"
        " DATE '2024-01-01', TIMESTAMP '2024-01-01 10:00:00', 12.34)"
    )
    row = e.sql("SELECT * FROM typed_all").collect()[0]
    assert row["l"] == 4 and row["str"] == "x"
    assert str(row["dec"]) == "12.34"


def test_compaction_preserves_state(fresh_engine):
    e = fresh_engine
    e.sql("CREATE TABLE c1 (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    for i in range(5):
        e.sql(f"INSERT INTO c1 VALUES (1, 'v{i}'), ({i + 10}, 'x')")
    before = sorted((r["id"], r["v"]) for r in e.sql("SELECT * FROM c1").collect())
    e.catalog.compact("c1")
    after = sorted((r["id"], r["v"]) for r in e.sql("SELECT * FROM c1").collect())
    assert before == after
    assert dict(after)[1] == "v4"


def test_composite_pk_lookup_and_time_travel(fresh_engine):
    e = fresh_engine
    e.sql(
        "CREATE TABLE cpk (a BIGINT NOT NULL, b STRING NOT NULL, v DOUBLE,"
        " PRIMARY KEY (a, b)) DISTRIBUTED BY (a, b) INTO 4 BUCKETS"
    )
    e.sql("INSERT INTO cpk VALUES (1, 'x', 1.0), (1, 'y', 2.0), (2, 'x', 3.0)")
    seq1 = e.catalog.current_seq("cpk")
    e.sql("INSERT INTO cpk VALUES (1, 'x', 10.0)")  # upsert same composite key

    # composite lookup returns the latest version
    row = e.catalog.lookup("cpk", {"a": 1, "b": "x"}).collect()
    assert [(r["a"], r["b"], r["v"]) for r in row] == [(1, "x", 10.0)]
    # scalar key on a composite-PK table is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        e.catalog.lookup("cpk", 1)
    with _pytest.raises(ValueError):
        e.catalog.lookup("cpk", {"a": 1})

    # time travel: state as of the first statement still sees v=1.0
    old = {
        (r["a"], r["b"]): r["v"]
        for r in e.catalog.read("cpk", as_of_seq=seq1).collect()
    }
    assert old[(1, "x")] == 1.0 and len(old) == 3
    now = {
        (r["a"], r["b"]): r["v"] for r in e.catalog.read("cpk").collect()
    }
    assert now[(1, "x")] == 10.0


def test_compaction_preserves_time_travel_anchors(fresh_engine):
    """compact() must keep post-compaction anchors exact (monotonic seq)
    and refuse anchors whose history it discarded."""
    e = fresh_engine
    e.sql("CREATE TABLE tt (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO tt VALUES (1, 'a')")          # seq 1
    e.sql("INSERT INTO tt VALUES (1, 'b'), (2, 'x')")  # seq 2
    anchor = e.catalog.current_seq("tt")               # 2
    e.catalog.compact("tt")
    e.sql("INSERT INTO tt VALUES (1, 'c')")            # seq 3 (monotonic)

    # anchor taken at seq 2 still returns the seq-2 state after compaction
    got = {r["id"]: r["v"] for r in e.catalog.read("tt", as_of_seq=anchor).collect()}
    assert got == {1: "b", 2: "x"}
    # current state sees the post-compaction write
    now = {r["id"]: r["v"] for r in e.catalog.read("tt").collect()}
    assert now == {1: "c", 2: "x"}
    # history below the compaction floor is refused, not silently wrong
    import pytest as _pytest

    with _pytest.raises(ValueError, match="compaction"):
        e.catalog.read("tt", as_of_seq=1)
    # lookup on an empty bucketed table returns empty, not a crash
    e.sql(
        "CREATE TABLE ebt (id BIGINT NOT NULL, PRIMARY KEY (id))"
        " DISTRIBUTED BY (id) INTO 4 BUCKETS"
    )
    assert e.catalog.lookup("ebt", 1).count() == 0


def test_pk_changelog_emits_insert_and_update_ops(fresh_engine):
    """read_changelog derives the Fluss change stream (+I / -U / +U)
    from the PK log: first write per key is +I, each overwrite retracts
    the old row (-U) and asserts the new one (+U)."""
    e = fresh_engine
    e.sql("CREATE TABLE kv (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO kv VALUES (1, 'a'), (2, 'b')")
    e.sql("INSERT INTO kv VALUES (1, 'a2')")
    e.sql("INSERT INTO kv VALUES (1, 'a3'), (3, 'c')")

    rows = sorted(
        e.catalog.read_changelog("kv").collect(),
        # within one change the retraction precedes the new image
        key=lambda r: (r["change_seq"], r["change_sub"], r["op"] != "-U"),
    )
    got = [(r["op"], r["id"], r["v"]) for r in rows]
    assert got == [
        ("+I", 1, "a"),
        ("+I", 2, "b"),
        ("-U", 1, "a"),
        ("+U", 1, "a2"),
        ("-U", 1, "a2"),
        ("+U", 1, "a3"),
        ("+I", 3, "c"),
    ]

    # changelog replay reconstructs the snapshot: last +I/+U per key
    finals = {}
    for op, k, v in got:
        if op in ("+I", "+U"):
            finals[k] = v
    snapshot = {r["id"]: r["v"] for r in e.sql("SELECT * FROM kv").collect()}
    assert finals == snapshot

    # log tables have no changelog (every row is an insert)
    e.sql("CREATE TABLE logt (x BIGINT)")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="primary-key"):
        e.catalog.read_changelog("logt")


def test_delete_tombstone_lifecycle(fresh_engine):
    """DELETE appends a tombstone: reads/lookups hide the key, time
    travel before the delete still sees it, re-insert revives it, the
    changelog shows +I/-D/+I, and compaction physically drops
    tombstones while keeping live rows."""
    e = fresh_engine
    e.sql("CREATE TABLE kv (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO kv VALUES (1, 'a'), (2, 'b')")
    seq_before_delete = e.catalog.current_seq("kv")

    assert e.sql("DELETE FROM kv WHERE id = 1").collect()[0]["count"] == 1
    assert {r["id"] for r in e.sql("SELECT * FROM kv").collect()} == {2}
    assert e.catalog.lookup("kv", 1).count() == 0
    # time travel to before the delete still sees the row
    assert e.catalog.read("kv", as_of_seq=seq_before_delete).count() == 2

    # changelog: +I a, +I b, -D a
    ops = sorted(
        (r["change_seq"], r["op"], r["id"])
        for r in e.catalog.read_changelog("kv").collect()
    )
    assert ops == [(1, "+I", 1), (1, "+I", 2), (2, "-D", 1)]
    # the -D carries the deleted image, not nulls
    drow = [r for r in e.catalog.read_changelog("kv").collect() if r["op"] == "-D"][0]
    assert drow["v"] == "a"

    # re-insert revives the key as a fresh +I
    e.sql("INSERT INTO kv VALUES (1, 'a2')")
    assert e.catalog.lookup("kv", 1).collect()[0]["v"] == "a2"
    ops = [r["op"] for r in e.catalog.read_changelog("kv").collect() if r["id"] == 1]
    assert sorted(ops) == ["+I", "+I", "-D"]

    # delete again, then compact: tombstone physically gone, live row kept
    e.sql("DELETE FROM kv WHERE id = 1")
    e.catalog.compact("kv")
    assert {r["id"] for r in e.sql("SELECT * FROM kv").collect()} == {2}
    assert e.catalog.read_changelog("kv").count() == 1  # only +I of id=2 survives

    # delete of an absent key: recorded, but emits no change and hides nothing
    e.catalog.delete("kv", 99)
    assert {r["id"] for r in e.sql("SELECT * FROM kv").collect()} == {2}
    assert e.catalog.read_changelog("kv").filter("id = 99").count() == 0

    # log tables refuse DELETE
    e.sql("CREATE TABLE logt (x BIGINT)")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="primary-key"):
        e.catalog.delete("logt", 1)


def test_changelog_system_table_sql(spark, tmp_path):
    """`SELECT ... FROM t$changelog` exposes the change view in plain
    SQL (the lakehouse system-table convention)."""
    from fluss_datafusion_spark import EngineSession

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_systbl"))
    e.sql("CREATE TABLE bal (id BIGINT NOT NULL, v BIGINT, PRIMARY KEY (id))")
    e.sql("INSERT INTO bal VALUES (1, 10)")
    e.sql("INSERT INTO bal VALUES (1, 20)")

    # -U and +U of one overwrite share change stamps (they ship in the
    # same commit); 'op DESC' puts the retraction first ('-' > '+')
    ops = [
        (r["op"], r["v"])
        for r in e.sql(
            "SELECT op, v FROM bal$changelog ORDER BY change_seq, op DESC"
        ).collect()
    ]
    assert ops == [("+I", 10), ("-U", 10), ("+U", 20)]
    # aggregations over the system table work too
    n = e.sql("SELECT count(*) AS n FROM bal$changelog WHERE op = '+U'").collect()
    assert n[0]["n"] == 1


def test_history_and_time_travel_system_tables(spark, tmp_path):
    """t$history exposes the raw stamped log; t$v<N> time-travels to
    statement sequence N — both in plain SQL via the $ binder."""
    from fluss_datafusion_spark import EngineSession

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_tt"))
    e.sql("CREATE TABLE acct2 (id BIGINT NOT NULL, v BIGINT, PRIMARY KEY (id))")
    e.sql("INSERT INTO acct2 VALUES (1, 10)")   # seq 1
    e.sql("INSERT INTO acct2 VALUES (1, 20)")   # seq 2
    e.sql("INSERT INTO acct2 VALUES (2, 5)")    # seq 3

    # history: every write with its stamps, pre-merge
    hist = e.sql(
        "SELECT __seq__, id, v FROM acct2$history ORDER BY __seq__"
    ).collect()
    assert [(r["__seq__"], r["id"], r["v"]) for r in hist] == [
        (1, 1, 10), (2, 1, 20), (3, 2, 5),
    ]

    # time travel: as of seq 1 only the first write is visible
    assert {
        (r["id"], r["v"]) for r in e.sql("SELECT id, v FROM acct2$v1").collect()
    } == {(1, 10)}
    assert {
        (r["id"], r["v"]) for r in e.sql("SELECT id, v FROM acct2$v2").collect()
    } == {(1, 20)}
    # and the current table is unaffected
    assert e.sql("SELECT count(*) AS n FROM acct2").collect()[0]["n"] == 2


def test_insert_overwrite_replaces_and_self_references(fresh_engine):
    """INSERT OVERWRITE replaces the table's contents; a self-referencing
    overwrite reads the PRE-overwrite state (input materialized before
    the truncate)."""
    e = fresh_engine
    e.sql("CREATE TABLE ow (id BIGINT NOT NULL, v BIGINT, PRIMARY KEY (id))")
    e.sql("INSERT INTO ow VALUES (1, 10), (2, 20), (3, 30)")

    res = e.sql("INSERT OVERWRITE ow VALUES (7, 70)").collect()
    assert res[0]["count"] == 1
    assert {(r["id"], r["v"]) for r in e.sql("SELECT * FROM ow").collect()} == {(7, 70)}

    # self-referencing rewrite: double every value
    e.sql("INSERT INTO ow VALUES (8, 80)")
    e.sql("INSERT OVERWRITE TABLE ow SELECT id, v * 2 FROM ow")
    assert {(r["id"], r["v"]) for r in e.sql("SELECT * FROM ow").collect()} == {
        (7, 140), (8, 160),
    }
    # history restarted: the changelog shows only the overwrite's inserts
    ops = {r["op"] for r in e.sql("SELECT op FROM ow$changelog").collect()}
    assert ops == {"+I"}


def test_insert_by_name(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS bndb")
    engine.sql(
        "CREATE TABLE bndb.bn (id BIGINT NOT NULL, a STRING, b DOUBLE,"
        " PRIMARY KEY (id))"
    )
    # reordered + partial column set: aligns by name, b fills NULL
    engine.sql("INSERT INTO bndb.bn BY NAME SELECT 'x' AS a, 1 AS id")
    engine.sql("INSERT INTO bndb.bn BY NAME SELECT 2.5 AS b, 2 AS id, 'y' AS a")
    got = {(r.id, r.a, r.b) for r in engine.sql("SELECT * FROM bndb.bn").collect()}
    assert got == {(1, "x", None), (2, "y", 2.5)}
    # unknown column rejects instead of landing positionally
    import pytest as _pytest

    with _pytest.raises(Exception, match="unknown"):
        engine.sql("INSERT INTO bndb.bn BY NAME SELECT 3 AS id, 'z' AS nope")
    # omitting the PK still rejects
    with _pytest.raises(Exception, match="primary-key"):
        engine.sql("INSERT INTO bndb.bn BY NAME SELECT 'w' AS a")
    engine.sql("DROP TABLE bndb.bn")
