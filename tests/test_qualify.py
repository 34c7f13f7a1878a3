"""QUALIFY clause rewrite: string-level tests + execution vs DuckDB.

The reference dialect (DataFusion) has no QUALIFY; neither does Spark.
We add it via the string rewriter (the reference's own mechanism for
SHOW commands, src/sql/rewriter.rs:19-77), so `rewrite_sql` must turn a
QUALIFY query into a windowed subquery Spark executes, and DuckDB —
which supports QUALIFY natively — is the execution oracle.
"""

import duckdb
import pytest

from fluss_datafusion_spark.sql.qualify import QUALIFY_FLAG, has_qualify, rewrite_qualify
from fluss_datafusion_spark.sql.rewriter import rewrite_sql


# ---------------------------------------------------------------------------
# pure string-level
# ---------------------------------------------------------------------------


def test_no_qualify_identity():
    sql = "SELECT a, b FROM t WHERE a > 1 ORDER BY b"
    assert rewrite_qualify(sql) == sql
    assert rewrite_sql(sql) == sql


def test_qualify_in_string_literal_untouched():
    sql = "SELECT 'we QUALIFY leads' AS s, a FROM t"
    assert not has_qualify(sql)
    assert rewrite_qualify(sql) == sql


def test_qualify_in_backtick_identifier_untouched():
    sql = "SELECT `QUALIFY` FROM t"
    assert rewrite_qualify(sql) == sql


def test_basic_shape():
    out = rewrite_qualify(
        "SELECT a, rank() OVER (ORDER BY b) AS r FROM t QUALIFY r <= 2"
    )
    assert out == (
        f"SELECT * EXCEPT ({QUALIFY_FLAG}) FROM (SELECT a, rank() OVER "
        f"(ORDER BY b) AS r, (r <= 2) AS {QUALIFY_FLAG} FROM t) "
        f"WHERE {QUALIFY_FLAG}"
    )


def test_tail_preserved():
    out = rewrite_qualify(
        "SELECT a FROM t QUALIFY row_number() OVER (ORDER BY a) <= 5 "
        "ORDER BY a LIMIT 3"
    )
    assert out.endswith("ORDER BY a LIMIT 3")
    assert "QUALIFY " not in out.upper().replace(QUALIFY_FLAG.upper(), "")


def test_distinct_moves_to_outer():
    out = rewrite_qualify(
        "SELECT DISTINCT g FROM t QUALIFY count(*) OVER (PARTITION BY g) > 1"
    )
    assert out.startswith(f"SELECT DISTINCT * EXCEPT ({QUALIFY_FLAG})")
    assert "SELECT g, (count(*) OVER (PARTITION BY g) > 1)" in out


def test_cte_prefix_preserved():
    out = rewrite_qualify(
        "WITH c AS (SELECT a, b FROM t) "
        "SELECT a FROM c QUALIFY row_number() OVER (ORDER BY b) = 1"
    )
    assert out.startswith("WITH c AS (SELECT a, b FROM t) SELECT * EXCEPT")


def test_subquery_qualify_rewritten():
    out = rewrite_qualify(
        "SELECT x.a FROM (SELECT a FROM t QUALIFY rank() OVER (ORDER BY a) = 1) x"
    )
    assert "QUALIFY" not in out.upper().replace(QUALIFY_FLAG.upper(), "")
    assert out.startswith("SELECT x.a FROM (SELECT * EXCEPT")


def test_set_op_branch_raises():
    with pytest.raises(ValueError, match="set operation"):
        rewrite_qualify(
            "SELECT a FROM t QUALIFY rank() OVER (ORDER BY a) = 1 "
            "UNION ALL SELECT a FROM u"
        )


def test_star_except_not_mistaken_for_set_op():
    out = rewrite_qualify(
        "SELECT * EXCEPT (b) FROM t QUALIFY row_number() OVER (ORDER BY a) = 1"
    )
    assert "SELECT * EXCEPT (b), (row_number() OVER (ORDER BY a) = 1)" in out


def test_missing_predicate_raises():
    with pytest.raises(ValueError, match="predicate"):
        rewrite_qualify("SELECT a FROM t QUALIFY ORDER BY a")


# ---------------------------------------------------------------------------
# execution: Spark (rewritten) vs DuckDB (native QUALIFY)
# ---------------------------------------------------------------------------

_QUERIES = [
    # alias reference
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders
    QUALIFY rnk <= 2
    """,
    # window fn directly in the predicate, over a non-selected column
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
    """,
    # QUALIFY combined with WHERE + GROUP BY + HAVING + ORDER/LIMIT tail
    """
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_totalprice > 1000
    GROUP BY o_custkey
    HAVING count(*) >= 1
    QUALIFY rank() OVER (ORDER BY count(*) DESC, o_custkey) <= 10
    ORDER BY n_orders DESC, o_custkey
    LIMIT 5
    """,
]


@pytest.mark.parametrize("sql", _QUERIES)
def test_execution_matches_duckdb(spark, testdata, sql):
    got = {
        tuple(r)
        for r in spark.sql(rewrite_sql(sql)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{testdata}/orders.parquet')"
    )
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    con.close()
    assert got == want
    assert len(got) > 0


def test_engine_session_executes_qualify(engine, testdata):
    """The FlussSession.sql path applies the rewrite to engine tables."""
    import pyspark.sql.functions as F

    engine.sql("CREATE DATABASE IF NOT EXISTS qdb")
    engine.sql(
        "CREATE TABLE qdb.qt (id INT, grp STRING, val DOUBLE, PRIMARY KEY (id))"
    )
    engine.sql(
        "INSERT INTO qdb.qt VALUES (1,'a',5.0),(2,'a',9.0),(3,'b',1.0),(4,'b',7.0)"
    )
    rows = engine.sql(
        "SELECT id, grp FROM qdb.qt "
        "QUALIFY row_number() OVER (PARTITION BY grp ORDER BY val DESC) = 1"
    ).collect()
    assert {(r.id, r.grp) for r in rows} == {(2, "a"), (4, "b")}
    engine.sql("DROP TABLE qdb.qt")
