"""CLI tests: render format, OK-on-empty quirk, meta-commands, -e path."""

from fluss_datafusion_spark.cli import CliSession, render


def _cli(spark, tmp_path):
    from fluss_datafusion_spark import EngineSession

    return CliSession(engine=EngineSession(spark=spark, warehouse=str(tmp_path / "wh")))


def test_empty_result_prints_ok(spark, tmp_path):
    cli = _cli(spark, tmp_path)
    cli.execute("CREATE TABLE t0 (id BIGINT NOT NULL, PRIMARY KEY (id))")
    assert cli.execute("SELECT * FROM t0") == "OK"


def test_demo_sequence_renders_table(spark, tmp_path):
    cli = _cli(spark, tmp_path)
    cli.execute("CREATE TABLE u (id BIGINT NOT NULL, name STRING, PRIMARY KEY (id));")
    out = cli.execute("INSERT INTO u VALUES (1, 'alice')")
    assert "count" in out and "1 row(s)" in out
    out = cli.execute("SELECT * FROM u WHERE id = 1")
    assert "alice" in out and "+" in out


def test_nested_columns_render_as_json(spark, tmp_path):
    cli = _cli(spark, tmp_path)
    out = cli.execute("SELECT array(1, 2, 3) AS arr, named_struct('a', 1) AS st")
    assert "[1,2,3]" in out
    assert '{"a":1}' in out


def test_meta_commands(spark, tmp_path):
    cli = _cli(spark, tmp_path)
    cli.execute("CREATE TABLE m1 (id BIGINT)")
    assert "m1" in cli.meta("\\dt")
    assert "Available commands" in cli.meta("\\?")
    assert cli.meta("\\q") is None
    assert "Unknown command" in cli.meta("\\x")


def test_error_is_reported_not_raised(spark, tmp_path):
    cli = _cli(spark, tmp_path)
    out = cli.execute("SELECT * FROM nonexistent_table_xyz")
    assert out.startswith("Error:")


def test_null_rendering(spark, tmp_path):
    cli = _cli(spark, tmp_path)
    out = cli.execute("SELECT CAST(NULL AS INT) AS x")
    assert "NULL" in out


def test_describe_meta_alias(spark, tmp_path):
    cli = _cli(spark, tmp_path)
    cli.execute(
        "CREATE TABLE dsc (id BIGINT NOT NULL, name STRING, PRIMARY KEY (id))"
    )
    out = cli.meta("\\d dsc")
    assert "id" in out and "name" in out and "bigint" in out.lower()
    # bare \d lists tables (postgres habit)
    assert "dsc" in cli.meta("\\d")


def test_tab_completion_candidates(spark, tmp_path):
    cli = _cli(spark, tmp_path)
    cli.execute("CREATE TABLE comp_orders (id BIGINT)")
    cli.execute("CREATE TABLE comp_customers (id BIGINT)")
    # keyword completion is case-insensitive on input, upper-cased output
    assert "SELECT" in cli.completions("sel")
    assert "SHOW" in cli.completions("SH")
    # table names from the live catalog
    got = cli.completions("comp_")
    assert "comp_orders" in got and "comp_customers" in got
    # meta-commands complete with the backslash kept
    assert set(cli.completions("\\d")) >= {"\\dt", "\\d"}
    # no spurious matches
    assert cli.completions("zzz_nothing") == []


def test_sql_native_text_functions_match_column_api(spark, tmp_path):
    """The CREATE FUNCTION macros must compute exactly what the Column
    API computes (same formulas, Catalyst-inlined)."""
    from pyspark.sql import functions as F

    from fluss_datafusion_spark.functions import text as tx

    cli = _cli(spark, tmp_path)  # EngineSession registers the functions
    cli.engine.load_testdata("/root/testdata/sf0.001")
    sql_rows = cli.engine.sql(
        "SELECT doc_id, token_count(text) AS tc, bpe_token_count(text) AS bc,"
        " round(quality_score(text), 9) AS q, doc_fingerprint(text) AS fp,"
        " prefix_fingerprint(text, 5) AS pfp FROM documents"
    ).collect()
    col_rows = (
        cli.engine.spark.table("documents")
        .select(
            "doc_id",
            tx.token_count(F.col("text")).alias("tc"),
            tx.bpe_ish_token_count(F.col("text")).alias("bc"),
            F.round(tx.quality_score(F.col("text")), 9).alias("q"),
            tx.fingerprint(F.col("text")).alias("fp"),
            tx.prefix_fingerprint(F.col("text"), 5).alias("pfp"),
        )
        .collect()
    )
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, col_rows))
    assert len(sql_rows) > 0


def test_timing_toggle(spark, tmp_path):
    cli = _cli(spark, tmp_path)
    assert "on" in cli.meta("\\timing")
    out = cli.execute("SELECT 1 AS x")
    assert "Time: " in out and out.strip().endswith("s")
    assert "off" in cli.meta("\\timing")
    assert "Time: " not in cli.execute("SELECT 1 AS x")
    # errors don't get a timing line
    cli.meta("\\timing")
    assert "Time: " not in cli.execute("SELECT * FROM no_such_tbl")


def test_cli_warehouse_persists_across_sessions(spark, tmp_path):
    """--warehouse makes the CLI durable: a second session over the same
    directory sees the first one's tables."""
    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.cli import CliSession

    wh = str(tmp_path / "cli_wh")
    one = CliSession(engine=EngineSession(spark=spark, warehouse=wh))
    one.execute("CREATE TABLE notes (id BIGINT NOT NULL, body STRING, PRIMARY KEY (id))")
    one.execute("INSERT INTO notes VALUES (1, 'hello')")

    two = CliSession(engine=EngineSession(spark=spark, warehouse=wh))
    out = two.execute("SELECT body FROM notes WHERE id = 1")
    assert "hello" in out
