"""Hilbert-curve clustering (operators/hilbert.py): the JVM expression
chain vs the pure-Python reference, the curve properties that make the
locality claim true (bijection + unit steps), measured file skipping
vs a z-order control, and the OPTIMIZE ... HILBERT BY surface."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.operators.hilbert import (
    hilbert_xy2d,
    with_curve_key,
    with_hilbert_key,
)


def test_reference_is_a_hilbert_curve():
    # bijection + unit Manhattan steps over the full grid = a true
    # space-filling curve traversal (the locality property everything
    # else here relies on)
    for bits in (2, 4):
        n = 1 << bits
        inv = {}
        for x in range(n):
            for y in range(n):
                inv[hilbert_xy2d(x, y, bits)] = (x, y)
        assert len(inv) == n * n
        for d in range(n * n - 1):
            (x0, y0), (x1, y1) = inv[d], inv[d + 1]
            assert abs(x0 - x1) + abs(y0 - y1) == 1, d


def test_expression_chain_matches_reference(spark):
    rows = [
        (0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
        (7, 42), (65535, 0), (0, 65535), (32768, 32767),
    ]
    df = spark.createDataFrame(rows, "x long, y long")
    got = with_hilbert_key(df, ["x", "y"], scaled=True).collect()
    for r in got:
        assert r["__h__"] == hilbert_xy2d(r["x"], r["y"]), (r["x"], r["y"])


def test_full_key_space_coverage(spark):
    # every 16-bit corner and a dense low grid: the expression chain
    # must agree with the reference on all of them (catches bit-level
    # drift in the rotation CASEs)
    import itertools

    pts = list(itertools.product(range(8), range(8))) + [
        (x, y)
        for x in (0, 1, 255, 256, 65534, 65535)
        for y in (0, 1, 255, 256, 65534, 65535)
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    got = with_hilbert_key(df, ["x", "y"], scaled=True).collect()
    for r in got:
        assert r["__h__"] == hilbert_xy2d(r["x"], r["y"]), (r["x"], r["y"])


def test_curve_dispatch_and_column_count(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError, match="exactly 2"):
        with_hilbert_key(df, ["a", "b", "c"])
    with pytest.raises(ValueError, match="unknown clustering curve"):
        with_curve_key(df, ["a", "b"], "peano")
    # zorder dispatch takes 3 columns
    assert "__z__" in with_curve_key(df, ["a", "b", "c"], "zorder").columns


def _file_stats(path, col):
    stats = []
    for root, _dirs, names in os.walk(path):
        for f in names:
            if not f.endswith(".parquet") or f.startswith("_"):
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


def _avg_box_area(sx, sy):
    return sum(
        (hx - lx + 1) * (hy - ly + 1) for (lx, hx), (ly, hy) in zip(sx, sy)
    ) / len(sx)


def test_hilbert_skips_files_and_beats_random_layout(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_h"))
    e.sql("CREATE TABLE hgrid (x BIGINT, y BIGINT, payload STRING)")
    spark.range(128 * 128).select(
        (F.col("id") % 128).alias("x"),
        F.pmod(F.col("id") * 7919, F.lit(128)).alias("y"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).createOrReplaceTempView("hgrid_src")
    e.sql("INSERT INTO hgrid SELECT * FROM hgrid_src")
    path = e.catalog.table_path(e.catalog.get_table("hgrid"))

    # control: consolidation without clustering
    e.catalog.optimize("hgrid", target_file_bytes=32 * 1024)
    plain_x = _file_stats(path, "x")
    n_files = len(plain_x)
    assert n_files >= 8

    n_after = e.catalog.optimize(
        "hgrid", target_file_bytes=32 * 1024,
        zorder_by=["x", "y"], curve="hilbert",
    )
    hx, hy = _file_stats(path, "x"), _file_stats(path, "y")
    assert n_after == len(hx)
    for point in (0, 77, 127):
        assert sum(1 for lo, hi in plain_x if lo <= point <= hi) == n_files
        assert sum(1 for lo, hi in hx if lo <= point <= hi) <= 0.5 * len(hx)
        assert sum(1 for lo, hi in hy if lo <= point <= hi) <= 0.5 * len(hy)


def test_hilbert_boxes_at_most_zorder_boxes(spark, tmp_path):
    # the reason to prefer Hilbert: per-file min/max bounding boxes
    # cover no more area than the Morton layout's on the same data
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_hz"))
    e.sql("CREATE TABLE cgrid (x BIGINT, y BIGINT, payload STRING)")
    spark.range(128 * 128).select(
        (F.col("id") % 128).alias("x"),
        F.pmod(F.col("id") * 7919, F.lit(128)).alias("y"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).createOrReplaceTempView("cgrid_src")
    e.sql("INSERT INTO cgrid SELECT * FROM cgrid_src")
    path = e.catalog.table_path(e.catalog.get_table("cgrid"))

    e.catalog.optimize("cgrid", target_file_bytes=32 * 1024,
                       zorder_by=["x", "y"], curve="zorder")
    z_area = _avg_box_area(_file_stats(path, "x"), _file_stats(path, "y"))
    e.catalog.optimize("cgrid", target_file_bytes=32 * 1024,
                       zorder_by=["x", "y"], curve="hilbert")
    h_area = _avg_box_area(_file_stats(path, "x"), _file_stats(path, "y"))
    assert h_area <= z_area * 1.05, (h_area, z_area)


def test_hilbert_sql_form_preserves_contents(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_hsql"))
    e.sql("CREATE TABLE ht (a BIGINT, b BIGINT)")
    e.sql("INSERT INTO ht SELECT id % 50, (id * 13) % 50 FROM range(2000)")
    before = e.sql(
        "SELECT count(*) AS n, sum(a) AS sa, sum(b) AS sb FROM ht"
    ).collect()[0]
    n = e.sql("OPTIMIZE ht HILBERT BY (a, b)").collect()[0]["n_files"]
    assert n >= 1
    after = e.sql(
        "SELECT count(*) AS n, sum(a) AS sa, sum(b) AS sb FROM ht"
    ).collect()[0]
    assert tuple(before) == tuple(after)
