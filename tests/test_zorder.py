"""Z-order clustering (operators/zorder.py + OPTIMIZE ... ZORDER BY).

Hard signals: the Morton interleave matches a pure-Python reference
bit-for-bit; a z-ordered rewrite actually SKIPS files for point
predicates on every clustering column (measured from real parquet
footer min/max stats, against a single-column sort as the control);
table contents and upsert history survive the rewrite byte-identically.
"""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.operators import zorder


def _py_morton(values, k, bits=16):
    z = 0
    for i, v in enumerate(values):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * k + i)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 42)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b",
        zorder.interleave_bits([F.col("a"), F.col("b")]).alias("z"),
    ).collect()
    for r in got:
        assert r["z"] == _py_morton((r["a"], r["b"]), 2), (r["a"], r["b"])


def test_interleave_three_columns(spark):
    df = spark.createDataFrame([(3, 5, 9)], "a long, b long, c long")
    z = df.select(
        zorder.interleave_bits([F.col("a"), F.col("b"), F.col("c")]).alias("z")
    ).collect()[0]["z"]
    assert z == _py_morton((3, 5, 9), 3)


def _file_stats(path, col):
    """Per-parquet-file (min, max) for ``col`` from footer metadata."""
    stats = []
    for root, _dirs, names in os.walk(path):
        for f in names:
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, f))
            idx = md.schema.names.index(col)
            lo = hi = None
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx).statistics
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            stats.append((lo, hi))
    return stats


def _files_hit(stats, point):
    return sum(1 for lo, hi in stats if lo <= point <= hi)


@pytest.fixture()
def grid_engine(spark, tmp_path):
    """A log table over an independent 2-D grid — the worst case for
    single-column sorting, the showcase for z-ordering."""
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_z"))
    e.sql("CREATE TABLE grid (x BIGINT, y BIGINT, payload STRING)")
    df = (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).alias("x"),
            # bit-reverse-ish decorrelation so insertion order is sorted
            # by NEITHER column
            F.pmod(F.col("id") * 7919, F.lit(256)).alias("y"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
    )
    df.createOrReplaceTempView("grid_src")
    e.sql("INSERT INTO grid SELECT * FROM grid_src")
    return e


def test_zorder_skips_files_on_both_columns(grid_engine):
    e = grid_engine
    path = e.catalog.table_path(e.catalog.get_table("grid"))

    # Control: small-file rewrite WITHOUT clustering.
    e.catalog.optimize("grid", target_file_bytes=64 * 1024)
    plain_x = _file_stats(path, "x")
    n_files = len(plain_x)
    assert n_files >= 8, "fixture must produce enough files to measure"

    # Z-ordered rewrite.
    n_after = e.catalog.optimize(
        "grid", target_file_bytes=64 * 1024, zorder_by=["x", "y"]
    )
    zx, zy = _file_stats(path, "x"), _file_stats(path, "y")
    assert n_after == len(zx)

    # A point predicate on EITHER column must prune most files: a
    # 16-file z-curve splits each axis into ~4 bands, so <= ~40% of
    # files can contain any given x (or y) value; the unclustered
    # control contains it in EVERY file.
    for point in (0, 100, 255):
        assert _files_hit(plain_x, point) == n_files  # control: no skipping
        assert _files_hit(zx, point) <= 0.5 * len(zx), (
            point, _files_hit(zx, point), len(zx))
        assert _files_hit(zy, point) <= 0.5 * len(zy), (
            point, _files_hit(zy, point), len(zy))


def test_zorder_preserves_contents(grid_engine):
    e = grid_engine
    before = e.sql(
        "SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,"
        " count(DISTINCT payload) AS dp FROM grid"
    ).collect()[0]
    e.sql("OPTIMIZE grid ZORDER BY (x, y)")
    after = e.sql(
        "SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,"
        " count(DISTINCT payload) AS dp FROM grid"
    ).collect()[0]
    assert tuple(before) == tuple(after)


def test_zorder_sql_form_and_parse(spark, tmp_path):
    from fluss_datafusion_spark.catalog.ddl import parse_maintenance

    assert parse_maintenance("OPTIMIZE t ZORDER BY (a, b)") == (
        "optimize", "t", ["a", "b"], None, "zorder")
    assert parse_maintenance("OPTIMIZE TABLE db.t ZORDER BY (`c`)") == (
        "optimize", "db.t", ["c"], None, "zorder")
    assert parse_maintenance("OPTIMIZE t") == (
        "optimize", "t", None, None, "zorder")
    assert parse_maintenance("OPTIMIZE t WHERE p = 'x'") == (
        "optimize", "t", None, "p = 'x'", "zorder")
    assert parse_maintenance("OPTIMIZE t WHERE p IN ('x','y') ZORDER BY (a)") == (
        "optimize", "t", ["a"], "p IN ('x','y')", "zorder")
    assert parse_maintenance("OPTIMIZE t HILBERT BY (a, b)") == (
        "optimize", "t", ["a", "b"], None, "hilbert")

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_zsql"))
    e.sql("CREATE TABLE zt (a BIGINT, b DOUBLE)")
    e.sql("INSERT INTO zt VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    n = e.sql("OPTIMIZE zt ZORDER BY (a, b)").collect()[0]["n_files"]
    assert n >= 1
    assert e.sql("SELECT count(*) AS n FROM zt").collect()[0]["n"] == 3


def test_zorder_pk_table_preserves_history(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_zpk"))
    e.sql("CREATE TABLE kv (k BIGINT NOT NULL, v BIGINT, PRIMARY KEY (k))")
    e.sql("INSERT INTO kv VALUES (1, 10), (2, 20)")
    e.sql("INSERT INTO kv VALUES (1, 11)")  # overwrite k=1
    anchor = e.catalog.current_seq("kv")
    e.sql("DELETE FROM kv WHERE k = 2")
    e.sql("OPTIMIZE kv ZORDER BY (k, v)")
    now = {(r.k, r.v) for r in e.sql("SELECT * FROM kv").collect()}
    assert now == {(1, 11)}
    past = {
        (r.k, r.v)
        for r in e.catalog.read("kv", as_of_seq=anchor).collect()
    }
    assert past == {(1, 11), (2, 20)}  # time travel intact post-rewrite


def test_zorder_rejects_internal_and_missing_columns(grid_engine):
    with pytest.raises(ValueError, match="not in table"):
        grid_engine.catalog.optimize("grid", zorder_by=["nope"])
    e = grid_engine
    e.sql("CREATE TABLE pkz (k BIGINT NOT NULL, v BIGINT, PRIMARY KEY (k))")
    e.sql("INSERT INTO pkz VALUES (1, 1)")
    with pytest.raises(ValueError, match="internal"):
        e.catalog.optimize("pkz", zorder_by=["__seq__"])


def test_zorder_string_column_clusters_equality(spark):
    # Strings hash into the bit space: equal values share a z-band.
    df = spark.createDataFrame(
        [("alpha", 1), ("beta", 2), ("alpha", 3)], "s string, n long"
    )
    out = df.select(
        "s", zorder.zorder_key(df, ["s", "n"]).alias("z")
    ).collect()
    by_s = {}
    for r in out:
        by_s.setdefault(r["s"], []).append(r["z"] & 0x5555555555555555)
    # the s-contributed (even) bits are identical for equal strings
    assert len(set(by_s["alpha"])) == 1
