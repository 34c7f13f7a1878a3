"""Distributed manifest prune (catalog/skipping.py — VERDICT r5 #1).

Past DISTRIBUTED_PRUNE_MIN_BYTES of chunk store, prune() evaluates the
predicate against the manifest AS A DATAFRAME: stat rows for predicate
columns only, later-chunk-wins per (file, column), Arrow-batched
exclusion reusing the exact driver kernels, and only excluded file
NAMES return to the driver — the full per-file stats dict (bloom
bitsets included) never materializes in driver memory."""

import os

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.catalog import skipping
from fluss_datafusion_spark.catalog.catalog import _parquet_files


@pytest.fixture()
def chunked_engine(spark, tmp_path, monkeypatch):
    """A chunk-store table (threshold forced low) with interleaved
    high-cardinality ids (bloom targets) and a range column (min/max
    target); distributed prune forced on."""
    monkeypatch.setattr(skipping, "CHUNK_THRESHOLD", 2)
    monkeypatch.setattr(skipping, "DISTRIBUTED_PRUNE_MIN_BYTES", 0)
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_dprune"))
    e.sql(
        "CREATE TABLE docs (doc_id STRING, nid BIGINT, band BIGINT, body STRING)"
        " WITH ('bloom.columns' = 'doc_id,nid')"
    )
    # 6 writes: ids interleave mod 6 (blooms are the only id signal);
    # band is contiguous per file (min/max prunes it cleanly)
    for j in range(6):
        spark.range(1536).filter(F.col("id") % 6 == j).select(
            F.md5(F.col("id").cast("string")).alias("doc_id"),
            F.col("id").alias("nid"),
            F.lit(j).cast("long").alias("band"),
            F.lit("x").alias("body"),
        ).coalesce(1).createOrReplaceTempView("dprune_batch")
        e.sql("INSERT INTO docs SELECT * FROM dprune_batch")
    path = e.catalog.table_path(e.catalog.get_table("docs"))
    assert skipping._chunk_files(path), "chunk store must be active"
    assert not os.path.exists(os.path.join(path, skipping.MANIFEST))
    return e


def _md5_of(spark, i):
    return spark.range(1).select(F.md5(F.lit(str(i)))).collect()[0][0]


def test_distributed_prune_never_loads_driver_dict(
    spark, chunked_engine, monkeypatch
):
    """The hard guarantee: with the distributed path active, the
    driver-side full-manifest load is NEVER called during a predicated
    read — patched to raise, the read still answers correctly and still
    skips files."""
    e = chunked_engine
    path = e.catalog.table_path(e.catalog.get_table("docs"))
    files = sorted(_parquet_files(path))
    assert len(files) == 6

    def _boom(*a, **k):
        raise AssertionError("driver-side manifest load ran during prune")

    monkeypatch.setattr(skipping, "load", _boom)
    # bloom-only exclusion (min/max spans everything for doc_id)
    target = _md5_of(spark, 17)  # id 17 -> file j=5
    kept = skipping.prune(path, files, f"doc_id = '{target}'", None, spark=spark)
    assert len(kept) == 1
    rows = e.catalog.read("docs", predicate=f"doc_id = '{target}'").collect()
    assert len(rows) == 1 and rows[0].nid == 17
    # min/max exclusion
    kept = skipping.prune(path, files, "band = 2", None, spark=spark)
    assert len(kept) == 1
    assert e.catalog.read("docs", predicate="band = 2").count() == 256


def test_distributed_matches_driver_prune_exactly(spark, chunked_engine):
    """Same kernels, same answers: distributed and driver prune agree on
    every predicate shape (equality/IN blooms, ranges, cross-typed
    literals, absent values, unknown columns)."""
    e = chunked_engine
    path = e.catalog.table_path(e.catalog.get_table("docs"))
    files = sorted(_parquet_files(path))
    target = _md5_of(spark, 20)
    predicates = [
        f"doc_id = '{target}'",
        "nid = 23",
        "nid IN (23, 24, 25)",
        "nid = 999999",
        "band >= 4",
        "band BETWEEN 1 AND 2",
        "nid = '23'",          # cross-typed: bloom type guard keeps all
        "band = 2 AND nid = 20",
        "no_such_col = 5",
        "nid > 100",           # range on an interleaved column: keeps all
    ]
    for pred in predicates:
        driver = skipping.prune(path, files, pred, None)
        dist = skipping.prune(path, files, pred, None, spark=spark)
        assert dist == driver, f"paths diverge on {pred!r}"


def test_distributed_prune_later_chunk_wins(spark, tmp_path, monkeypatch):
    """A (file, column) stat re-harvested in a later chunk supersedes
    the earlier row — stale bounds must not exclude a file whose fresh
    bounds keep it (mirrors _load_chunks replay order)."""
    monkeypatch.setattr(skipping, "DISTRIBUTED_PRUNE_MIN_BYTES", 0)
    table_path = str(tmp_path / "t")
    os.makedirs(table_path)
    f = "part-0.parquet"
    skipping._write_chunk(table_path, {f: {"n": [0, 10]}})
    skipping._write_chunk(table_path, {f: {"n": [0, 100]}})  # re-harvest
    files = [os.path.join(table_path, f)]
    # driver replay: later chunk wins -> n=50 is inside [0, 100] -> kept
    assert skipping.prune(table_path, files, "n = 50", None) == files
    assert skipping.prune(table_path, files, "n = 50", None, spark=spark) == files
    # and a value outside the fresh bounds still excludes
    assert skipping.prune(table_path, files, "n = 500", None, spark=spark) == []


def test_small_chunk_stores_stay_on_the_driver(spark, tmp_path, monkeypatch):
    """Below DISTRIBUTED_PRUNE_MIN_BYTES the driver dict load is cheaper
    than a Spark job — the distributed path must not engage."""
    monkeypatch.setattr(skipping, "CHUNK_THRESHOLD", 2)
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_small"))
    e.sql("CREATE TABLE s (n BIGINT, v STRING)")
    for j in range(3):
        spark.range(j * 10, (j + 1) * 10).select(
            F.col("id").alias("n"), F.lit("x").alias("v")
        ).coalesce(1).createOrReplaceTempView("s_src")
        e.sql("INSERT INTO s SELECT * FROM s_src")
    path = e.catalog.table_path(e.catalog.get_table("s"))
    assert skipping._chunk_files(path)
    assert not skipping._distributable(path)  # tiny store: driver path

    def _boom(*a, **k):
        raise AssertionError("distributed prune ran on a tiny store")

    monkeypatch.setattr(skipping, "_prune_distributed", _boom)
    files = sorted(_parquet_files(path))
    kept = skipping.prune(path, files, "n = 5", None, spark=spark)
    assert len(kept) == 1


def _num_files_read(df):
    """Sum of the executed scan's numFiles metrics (file-prune proof)."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numFiles"):
            total += m.apply("numFiles").value()
    return total


def test_directory_read_prune_never_enumerates_files(
    spark, chunked_engine, monkeypatch
):
    """r7 (VERDICT r6 item 6): on a chunk-store table, read(predicate=)
    hands Spark the table DIRECTORY plus a pushed _metadata.file_path
    exclusion filter — the driver never walks the table for a file
    list (patched to raise), and the scan's numFiles metric proves
    whole files are pruned at listing, not filtered row-wise."""
    import fluss_datafusion_spark.catalog.catalog as C

    e = chunked_engine
    spec = e.catalog.get_table("docs")
    path = e.catalog.table_path(spec)
    n_all = len(sorted(_parquet_files(path)))
    assert n_all == 6

    def _boom(*a, **k):
        raise AssertionError(
            "driver-side file enumeration ran during a chunk-store "
            "predicated read"
        )

    monkeypatch.setattr(C, "_parquet_files", _boom)
    monkeypatch.setattr(skipping, "load", _boom)

    # min/max exclusion: band is contiguous per file -> 1 of 6 survives
    df = e.catalog.read("docs", predicate="band = 2")
    assert _num_files_read(df) == 1
    assert df.count() == 256

    # bloom exclusion on the high-cardinality id
    target = _md5_of(spark, 17)
    df = e.catalog.read("docs", predicate=f"doc_id = '{target}'")
    assert _num_files_read(df) == 1
    rows = df.collect()
    assert len(rows) == 1 and rows[0].nid == 17

    # a predicate excluding nothing reads the bare directory (no filter,
    # still no enumeration)
    df = e.catalog.read("docs", predicate="band >= 0")
    assert _num_files_read(df) == 6
    assert df.count() == 6 * 256


def test_excluded_literal_cap_switches_to_anti_join(
    spark, chunked_engine, monkeypatch
):
    """r8 (VERDICT r7 item 4): a selective predicate excluding MOST
    files must not embed an O(n-excluded) In-literal — past the cap the
    excluded names stay distributed and the read anti-joins them on
    _metadata.file_path.  Same answers, no driver-side name list, and
    the plan carries no giant literal."""
    import fluss_datafusion_spark.catalog.catalog as C

    e = chunked_engine
    spec = e.catalog.get_table("docs")
    path = e.catalog.table_path(spec)

    # cap below the excluded count (5 of 6 files excluded) -> DF path
    monkeypatch.setattr(skipping, "EXCLUDED_LITERAL_CAP", 2)
    real = skipping.excluded_relpaths(spark, path, "band = 2", None)
    from pyspark.sql import DataFrame

    assert isinstance(real, DataFrame), "past the cap a DataFrame returns"

    def _boom(*a, **k):
        raise AssertionError("driver-side file enumeration during read")

    monkeypatch.setattr(C, "_parquet_files", _boom)
    monkeypatch.setattr(skipping, "load", _boom)

    df = e.catalog.read("docs", predicate="band = 2")
    # correctness: identical rows to the literal path
    assert df.count() == 256
    assert df.agg(F.min("band"), F.max("band")).collect()[0] == (2, 2)
    # the executed plan must NOT contain a file-path In-literal; the
    # exclusion rides a join instead
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "file_path IN" not in plan
    assert "Join" in plan

    # under the cap (default): the literal path still listing-prunes
    monkeypatch.setattr(skipping, "EXCLUDED_LITERAL_CAP", 100_000)
    df2 = e.catalog.read("docs", predicate="band = 3")
    assert _num_files_read(df2) == 1
    assert df2.count() == 256
