"""Round-2 catalog/session fixes (VERDICT + ADVICE findings): USE <db>
routing, db-qualified temp views, INSERT single-job count, insert_sql
PK/NOT NULL column-list enforcement, lazy table_stats, and the
changelog-after-compaction contract."""

import pytest


def test_use_database_and_qualified_views(engine):
    e = engine
    e.sql("CREATE DATABASE dbx")
    e.sql("CREATE DATABASE dby")
    e.sql("CREATE TABLE dbx.kv_use (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("CREATE TABLE dby.kv_use (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO dbx.kv_use VALUES (1, 'x')")
    e.sql("INSERT INTO dby.kv_use VALUES (1, 'y')")

    # db-qualified SELECT resolves each table independently
    assert e.sql("SELECT v FROM dbx.kv_use").collect()[0][0] == "x"
    assert e.sql("SELECT v FROM dby.kv_use").collect()[0][0] == "y"

    # USE switches the bare-name binding mid-session
    e.sql("USE dbx")
    assert e.sql("SELECT v FROM kv_use").collect()[0][0] == "x"
    assert [r[0] for r in e.sql("SHOW TABLES").collect()] == ["kv_use"]
    e.sql("USE dby")
    assert e.sql("SELECT v FROM kv_use").collect()[0][0] == "y"

    # the reference's SET default_schema spelling works too
    e.sql("SET datafusion.catalog.default_schema = 'dbx'")
    assert e.sql("SELECT v FROM kv_use").collect()[0][0] == "x"

    # dropping dbx's table must not clobber dby's same-named view
    e.sql("DROP TABLE dbx.kv_use")
    assert e.sql("SELECT v FROM dby.kv_use").collect()[0][0] == "y"
    e.sql("USE dby")
    assert e.sql("SELECT v FROM kv_use").collect()[0][0] == "y"
    e.sql("DROP TABLE dby.kv_use")

    # unqualified CREATE under USE lands in the CURRENT database (the
    # DDL parser must receive the session default, not the constant)
    e.sql("USE dbx")
    e.sql("CREATE TABLE local_t (id BIGINT NOT NULL, PRIMARY KEY (id))")
    assert e.catalog.has_table("dbx.local_t")
    assert not e.catalog.has_table("fluss.local_t")
    e.sql("INSERT INTO local_t VALUES (5)")
    assert e.sql("SELECT id FROM local_t").collect()[0][0] == 5
    e.sql("DROP TABLE local_t")
    e.catalog.set_default_database("fluss")


def test_use_unknown_database_raises(engine):
    with pytest.raises(KeyError):
        engine.catalog.set_default_database("nope_no_such_db")


def test_insert_sql_rejects_omitted_pk_column(engine):
    e = engine
    e.sql(
        "CREATE TABLE strict_ins (id BIGINT NOT NULL, v STRING, "
        "n BIGINT NOT NULL, PRIMARY KEY (id))"
    )
    with pytest.raises(ValueError, match="primary-key/NOT NULL"):
        e.sql("INSERT INTO strict_ins (v) VALUES ('a')")
    with pytest.raises(ValueError, match="primary-key/NOT NULL"):
        e.sql("INSERT INTO strict_ins (id, v) VALUES (1, 'a')")  # omits NOT NULL n
    # full column list (any order) is fine; nullable columns may be omitted
    e.sql("INSERT INTO strict_ins (n, id) VALUES (10, 1)")
    row = e.sql("SELECT * FROM strict_ins").collect()[0]
    assert (row["id"], row["v"], row["n"]) == (1, None, 10)
    e.sql("DROP TABLE strict_ins")


def test_insert_select_runs_one_job(engine):
    """VERDICT finding 4: insert() must not execute the input plan twice
    (count-then-write).  The committed count comes from parquet footers."""
    e = engine
    sc = e.spark.sparkContext
    e.sql("CREATE TABLE ins_once (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    src = e.spark.range(100).selectExpr("id", "CAST(id AS STRING) AS v")
    src.createOrReplaceTempView("ins_once_src")
    sc.setJobGroup("ins-once", "insert single job probe")
    try:
        count = e.catalog.insert("ins_once", e.spark.sql("SELECT * FROM ins_once_src"))
    finally:
        sc.setJobGroup(None, None)
    assert count == 100
    jobs = sc.statusTracker().getJobIdsForGroup("ins-once")
    assert len(jobs) == 1, f"INSERT ran {len(jobs)} jobs: {jobs}"
    e.sql("DROP TABLE ins_once")


def test_changelog_after_compaction_contract(engine):
    """After compact() the changelog is snapshot+incremental: surviving
    pre-compaction images surface as +I (history is gone — that is what
    compaction means), post-compaction writes still emit exact -U/+U."""
    e = engine
    e.sql("CREATE TABLE cl_cmp (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO cl_cmp VALUES (1, 'v1')")
    e.sql("INSERT INTO cl_cmp VALUES (1, 'v2'), (2, 'w1')")

    full = [(r["op"], r["id"], r["v"]) for r in
            e.catalog.read_changelog("cl_cmp").orderBy("change_seq", "change_sub", "op").collect()]
    assert ("-U", 1, "v1") in full and ("+U", 1, "v2") in full

    e.catalog.compact("cl_cmp")
    # full history is gone; the strict flag makes that explicit
    with pytest.raises(ValueError, match="snapshot\\+incremental"):
        e.catalog.read_changelog("cl_cmp", require_full_history=True)

    # snapshot: each surviving key is one +I with its surviving image
    snap = {(r["op"], r["id"], r["v"]) for r in e.catalog.read_changelog("cl_cmp").collect()}
    assert snap == {("+I", 1, "v2"), ("+I", 2, "w1")}

    # incremental on top of the snapshot stays exact
    e.sql("INSERT INTO cl_cmp VALUES (1, 'v3')")
    after = [(r["op"], r["id"], r["v"]) for r in
             e.catalog.read_changelog("cl_cmp").orderBy("change_seq", "change_sub", "op").collect()]
    assert ("-U", 1, "v2") in after and ("+U", 1, "v3") in after
    e.sql("DROP TABLE cl_cmp")


def test_table_stats_lazy_vs_exact(engine):
    """ADVICE: metadata queries must not scan every PK table's log.
    include_stats=False leaves PK row_count NULL (no Spark job); log
    tables are exact either way via parquet footers."""
    from fluss_datafusion_spark.catalog import information_schema

    e = engine
    e.sql("CREATE TABLE stats_pk (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("CREATE TABLE stats_log (id BIGINT, v STRING)")
    e.sql("INSERT INTO stats_pk VALUES (1, 'a'), (1, 'b'), (2, 'c')")
    e.sql("INSERT INTO stats_log VALUES (1, 'a'), (2, 'b')")

    information_schema.register_views(e.catalog, include_stats=False)
    rows = {r["table_name"]: r["row_count"] for r in
            e.spark.sql("SELECT * FROM information_schema_table_stats").collect()}
    assert rows["stats_pk"] is None  # no merge job was run
    assert rows["stats_log"] == 2    # footer-exact, still no Spark job

    # the SQL front door computes exact stats when the view is queried
    rows = {r["table_name"]: r["row_count"] for r in
            e.sql("SELECT table_name, row_count FROM information_schema.table_stats").collect()}
    assert rows["stats_pk"] == 2     # merged (upserted) logical count
    assert rows["stats_log"] == 2
    e.sql("DROP TABLE stats_pk")
    e.sql("DROP TABLE stats_log")


def test_warehouse_reattach_recovers_tables_and_seq(spark, tmp_path):
    """A new session over an existing warehouse must see its tables
    (spec persisted as _spec.json inside the table dir — Spark ignores
    _-prefixed files), keep upsert ordering (seq recovered from the
    log's max stamp), and preserve the compaction time-travel floor."""
    from fluss_datafusion_spark import EngineSession

    wh = str(tmp_path / "wh_attach")
    a = EngineSession(spark=spark, warehouse=wh)
    a.sql("CREATE TABLE kv (k BIGINT NOT NULL, v STRING, PRIMARY KEY (k))")
    a.sql("INSERT INTO kv VALUES (1, 'v1')")
    a.sql("INSERT INTO kv VALUES (1, 'v2')")  # seq 2 wins
    a.sql("CREATE DATABASE other")
    a.sql("CREATE TABLE other.t2 (x BIGINT NOT NULL, PRIMARY KEY (x))")

    b = EngineSession(spark=spark, warehouse=wh)
    assert b.catalog.has_table("kv") and b.catalog.has_table("other.t2")
    assert {r["k"]: r["v"] for r in b.sql("SELECT * FROM kv").collect()} == {1: "v2"}
    # upsert ordering survives the restart: the recovered counter stamps
    # ABOVE the existing log, so the new write wins
    b.sql("INSERT INTO kv VALUES (1, 'v3')")
    assert {r["k"]: r["v"] for r in b.sql("SELECT * FROM kv").collect()} == {1: "v3"}

    # schema evolution survives too
    b.sql("ALTER TABLE kv ADD COLUMN note STRING")
    c = EngineSession(spark=spark, warehouse=wh)
    assert [col.name for col in c.catalog.get_table("kv").columns] == ["k", "v", "note"]

    # compaction floor is persisted: a fresh session refuses pre-floor
    # time travel instead of silently serving partial history
    c.catalog.compact("kv")
    d = EngineSession(spark=spark, warehouse=wh)
    import pytest as _pytest

    with _pytest.raises(Exception):
        d.catalog.read("kv", as_of_seq=1)


def test_optimize_consolidates_small_files_preserving_history(spark, tmp_path):
    """optimize() rewrites many tiny commit files into few, while every
    row, upsert ordering, time travel, and the changelog survive
    byte-identically (unlike compact, which collapses history)."""
    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.catalog.catalog import _parquet_files

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_opt"))
    e.sql("CREATE TABLE tiny (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    for i in range(6):  # 6 tiny commits -> many small files
        e.sql(f"INSERT INTO tiny VALUES ({i % 3}, 'v{i}')")

    path = e.catalog.table_path(e.catalog.get_table("tiny"))
    before_files = len(_parquet_files(path))
    before_rows = {r["id"]: r["v"] for r in e.sql("SELECT * FROM tiny").collect()}
    before_changelog = sorted(
        (r["op"], r["id"], r["v"])
        for r in e.catalog.read_changelog("tiny").select("op", "id", "v").collect()
    )
    before_travel = {
        r["id"]: r["v"] for r in e.catalog.read("tiny", as_of_seq=3).collect()
    }

    n_after = e.catalog.optimize("tiny")
    assert n_after < before_files

    assert {r["id"]: r["v"] for r in e.sql("SELECT * FROM tiny").collect()} == before_rows
    assert sorted(
        (r["op"], r["id"], r["v"])
        for r in e.catalog.read_changelog("tiny").select("op", "id", "v").collect()
    ) == before_changelog
    assert {
        r["id"]: r["v"] for r in e.catalog.read("tiny", as_of_seq=3).collect()
    } == before_travel
    # upserts continue to win after the rewrite
    e.sql("INSERT INTO tiny VALUES (0, 'latest')")
    assert e.sql("SELECT v FROM tiny WHERE id = 0").collect()[0]["v"] == "latest"


def test_optimize_and_compact_sql_statements(spark, tmp_path):
    """OPTIMIZE [TABLE] t and COMPACT TABLE t route through the session
    like the other engine DDL."""
    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.catalog.catalog import _parquet_files

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_maint"))
    e.sql("CREATE TABLE m (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    for i in range(4):
        e.sql(f"INSERT INTO m VALUES ({i}, 'x{i}')")
    path = e.catalog.table_path(e.catalog.get_table("m"))
    before = len(_parquet_files(path))
    out = e.sql("OPTIMIZE m").collect()
    assert out[0]["n_files"] < before
    assert e.sql("SELECT count(*) AS n FROM m").collect()[0]["n"] == 4

    e.sql("COMPACT TABLE m")
    # compacted: one image per key, changelog collapsed to +I rows
    ops = {r["op"] for r in e.sql("SELECT op FROM m$changelog").collect()}
    assert ops == {"+I"}


def test_rename_preserves_compaction_floor(spark, tmp_path):
    """ADVICE r3: rename must migrate the compaction floor with the seq
    counter, so time travel below the floor and require_full_history
    still REFUSE on the renamed table instead of serving partial
    post-compaction state — in this session and after a restart."""
    from fluss_datafusion_spark import EngineSession

    wh = str(tmp_path / "wh_ren_floor")
    e = EngineSession(spark=spark, warehouse=wh)
    e.sql("CREATE TABLE rf (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO rf VALUES (1, 'v1')")
    e.sql("INSERT INTO rf VALUES (1, 'v2')")
    e.catalog.compact("rf")
    e.sql("ALTER TABLE rf RENAME TO rf2")

    with pytest.raises(ValueError, match="compaction"):
        e.catalog.read("rf2", as_of_seq=1)
    with pytest.raises(ValueError, match="snapshot\\+incremental"):
        e.catalog.read_changelog("rf2", require_full_history=True)
    # the floor must also be persisted under the NEW name
    e2 = EngineSession(spark=spark, warehouse=wh)
    with pytest.raises(ValueError, match="compaction"):
        e2.catalog.read("rf2", as_of_seq=1)


def test_swap_dirs_not_attached_as_tables(spark, tmp_path):
    """A crash mid-optimize/compact can leave `<table>.old` /
    `<table>.optimize` dirs with a _spec.json inside; a new session must
    attach only the live table."""
    import os
    import shutil

    from fluss_datafusion_spark import EngineSession

    wh = str(tmp_path / "wh_swapdirs")
    e = EngineSession(spark=spark, warehouse=wh)
    e.sql("CREATE TABLE sw (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO sw VALUES (1, 'a')")
    path = e.catalog.table_path(e.catalog.get_table("sw"))
    shutil.copytree(path, path + ".old")
    shutil.copytree(path, path + ".optimize")

    e2 = EngineSession(spark=spark, warehouse=wh)
    names = {r["table_name"] for r in
             e2.sql("SELECT table_name FROM information_schema.tables").collect()}
    assert "sw" in names and "sw.old" not in names and "sw.optimize" not in names
    assert e2.sql("SELECT count(*) AS n FROM sw").collect()[0]["n"] == 1
    # optimize still swaps cleanly with a stale .old dir present
    e2.catalog.optimize("sw")
    assert not os.path.exists(path + ".old")
    assert e2.sql("SELECT count(*) AS n FROM sw").collect()[0]["n"] == 1


def test_auto_compaction_policy(spark, tmp_path):
    """compaction.auto-after = N: the table compacts itself once N
    statements pile above the floor; reads stay identical, history
    below the new floor is gone (the documented retention trade-off)."""
    import pytest as _pytest

    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.catalog.catalog import _parquet_files

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_autocompact"))
    e.sql(
        "CREATE TABLE ac (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))"
        " WITH ('compaction.auto-after' = '3')"
    )
    e.sql("INSERT INTO ac VALUES (1, 'a')")
    e.sql("INSERT INTO ac VALUES (1, 'b'), (2, 'x')")
    assert e.catalog._floor.get("fluss.ac", 0) == 0
    e.sql("INSERT INTO ac VALUES (1, 'c')")  # 3rd statement -> compact
    assert e.catalog._floor.get("fluss.ac", 0) == 3
    got = {(r.id, r.v) for r in e.sql("SELECT * FROM ac").collect()}
    assert got == {(1, "c"), (2, "x")}
    # history below the floor is discarded
    with _pytest.raises(ValueError, match="compaction"):
        e.catalog.read("ac", as_of_seq=1)
    # the counter keeps rising; next compaction at floor+3
    e.sql("INSERT INTO ac VALUES (3, 'z')")
    assert e.catalog._floor.get("fluss.ac", 0) == 3
    assert (3, "z") in {(r.id, r.v) for r in e.sql("SELECT * FROM ac").collect()}
    e.sql("INSERT INTO ac VALUES (4, 'w')")
    e.sql("INSERT INTO ac VALUES (5, 'q')")  # seq 6 = floor 3 + 3 -> compact
    assert e.catalog._floor.get("fluss.ac", 0) == 6


def test_auto_compaction_bad_property_raises_at_ddl_time(spark, tmp_path):
    """ADVICE r5: a malformed compaction.auto-after must fail the
    CREATE, not a later write after its files are appended and the
    commit recorded (data persisted, statement errors).  A bad value
    that somehow reaches the write path is treated as disabled."""
    import pytest as _pytest

    from fluss_datafusion_spark import EngineSession

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_autocompact2"))
    with _pytest.raises(ValueError, match="integer statement count"):
        e.sql(
            "CREATE TABLE acb (id BIGINT NOT NULL, PRIMARY KEY (id))"
            " WITH ('compaction.auto-after' = 'soon')"
        )
    # write path tolerates a bad value injected post-DDL: DML succeeds,
    # auto-compaction simply stays off
    e.sql("CREATE TABLE acc (id BIGINT NOT NULL, PRIMARY KEY (id))")
    e.catalog.get_table("acc").properties["compaction.auto-after"] = "soon"
    e.sql("INSERT INTO acc VALUES (1)")
    assert e.sql("SELECT count(*) AS n FROM acc").collect()[0]["n"] == 1
    assert e.catalog._floor.get("fluss.acc", 0) == 0


def test_deferred_compaction_skips_vanished_tables(spark, tmp_path):
    """ADVICE r5: a table dropped inside a defer_auto_compact guard must
    not raise KeyError at guard exit (which would mask the statement's
    real result) — the queued compaction is skipped silently."""
    from fluss_datafusion_spark import EngineSession

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_defer_drop"))
    e.sql(
        "CREATE TABLE dv (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))"
        " WITH ('compaction.auto-after' = '1')"
    )
    with e.catalog.defer_auto_compact():
        e.sql("INSERT INTO dv VALUES (1, 'a')")  # queues fluss.dv
        assert e.catalog._compaction_deferred == {"fluss.dv"}
        e.catalog.drop_table("dv")
    # guard exit reached without KeyError; nothing left behind
    assert e.catalog._compaction_deferred is None
    assert "dv" not in e.catalog.list_tables("fluss")


def test_auto_compaction_defers_inside_multi_append_statements(spark, tmp_path):
    """A MERGE that crosses the auto-compact threshold must not compact
    BETWEEN its live and tombstone appends (the second append's plan
    may hold pre-compact file listings); the compaction runs at the
    statement boundary instead."""
    from fluss_datafusion_spark import EngineSession

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_defer"))
    e.sql(
        "CREATE TABLE d (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))"
        " WITH ('compaction.auto-after' = '2')"
    )
    e.sql("INSERT INTO d VALUES (1, 'a'), (2, 'b'), (3, 'c')")  # seq 1
    # seq 2 is ONE fused MERGE append (update + delete under one seq,
    # r7) -> threshold crossed mid-statement; guard must defer the
    # compaction to the statement boundary
    res = e.sql(
        "MERGE INTO d USING (SELECT 1 AS id, 'a2' AS v UNION ALL"
        " SELECT 3, NULL) s ON d.id = s.id"
        " WHEN MATCHED AND s.v IS NULL THEN DELETE"
        " WHEN MATCHED THEN UPDATE SET v = s.v"
    ).collect()[0]
    assert (res.upserted, res.deleted) == (1, 1)
    got = {(r.id, r.v) for r in e.sql("SELECT * FROM d").collect()}
    assert got == {(1, "a2"), (2, "b")}
    # the deferred compaction DID run at the boundary
    assert e.catalog._floor.get("fluss.d", 0) >= 2
    assert e.catalog._compaction_deferred is None
