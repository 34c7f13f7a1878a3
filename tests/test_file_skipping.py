"""File-level data skipping (catalog/skipping.py + read(predicate=)).

Hard signals: a z-clustered table's skipping scan provably opens FEWER
files than the listing (measured from the pruned list itself) while
returning exactly ``read().filter(pred)``; PK tables refuse to prune on
mutable columns (the merge-on-read soundness rule) and still answer
correctly; files written after the manifest are kept; partition-dir
columns survive an explicit-file-list read.
"""

import os

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.catalog import skipping
from fluss_datafusion_spark.catalog.catalog import _parquet_files


# -- predicate parsing ------------------------------------------------------


def test_parse_simple_conjunction():
    got = skipping.parse_conjuncts("x = 5 AND y >= 2.5 AND name = 'a''b'")
    assert got == [("x", "=", 5), ("y", ">=", 2.5), ("name", "=", "a'b")]


def test_parse_between_in_flip_and_parens():
    got = skipping.parse_conjuncts(
        "x BETWEEN 3 AND 7 AND y IN (1, 2, 3) AND (10 > z)"
    )
    assert ("x", "between", (3, 7)) in got
    assert ("y", "in", [1, 2, 3]) in got
    assert ("z", "<", 10) in got


def test_parse_top_level_or_prunes_nothing():
    assert skipping.parse_conjuncts("x = 1 OR y = 2") == []


def test_parse_nested_or_keeps_other_conjuncts():
    got = skipping.parse_conjuncts("(x = 1 OR x = 2) AND y = 3")
    assert got == [("y", "=", 3)]


def test_parse_skips_complex_conjuncts():
    got = skipping.parse_conjuncts(
        "length(s) > 3 AND x IS NOT NULL AND x < 9"
    )
    assert got == [("x", "<", 9)]


def test_parse_literal_containing_keywords():
    got = skipping.parse_conjuncts("note = 'a AND b OR c' AND x = 1")
    assert got == [("note", "=", "a AND b OR c"), ("x", "=", 1)]


def test_exclusion_logic():
    b = [10, 20]
    assert skipping._excludes(b, "=", 5) and skipping._excludes(b, "=", 25)
    assert not skipping._excludes(b, "=", 10)
    assert skipping._excludes(b, "<", 10) and not skipping._excludes(b, "<", 11)
    assert skipping._excludes(b, "<=", 9) and not skipping._excludes(b, "<=", 10)
    assert skipping._excludes(b, ">", 20) and not skipping._excludes(b, ">", 19)
    assert skipping._excludes(b, ">=", 21) and not skipping._excludes(b, ">=", 20)
    assert skipping._excludes(b, "between", (21, 30))
    assert not skipping._excludes(b, "between", (15, 30))
    assert skipping._excludes(b, "in", [1, 2, 30])
    assert not skipping._excludes(b, "in", [1, 15])
    # type mismatch: never exclude
    assert not skipping._excludes(b, "=", "x")
    assert not skipping._excludes(["a", "c"], "=", 5)


# -- end-to-end on tables ---------------------------------------------------


@pytest.fixture()
def grid_engine(spark, tmp_path):
    """Log table over a decorrelated 2-D grid, z-clustered — the same
    fixture shape as test_zorder.py, plus a post-OPTIMIZE append so an
    unknown file is in play."""
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_skip"))
    e.sql("CREATE TABLE grid (x BIGINT, y BIGINT, payload STRING)")
    df = (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).alias("x"),
            (F.col("id") / 256).cast("long").alias("y"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
    )
    df.createOrReplaceTempView("grid_skip_src")
    e.sql("INSERT INTO grid SELECT * FROM grid_skip_src")
    e.catalog.optimize("grid", target_file_bytes=64 * 1024, zorder_by=["x", "y"])
    return e


def _pruned_count(e, table, pred):
    spec = e.catalog.get_table(table)
    path = e.catalog.table_path(spec)
    files = sorted(_parquet_files(path))
    allowed = list(spec.primary_key) if spec.has_primary_key else None
    return len(skipping.prune(path, files, pred, allowed)), len(files)


def test_skipping_scan_opens_fewer_files_and_matches(grid_engine):
    e = grid_engine
    pred = "x BETWEEN 10 AND 20 AND y BETWEEN 10 AND 20"
    kept, total = _pruned_count(e, "grid", pred)
    assert total >= 8
    assert kept < total, "z-clustered range predicate must skip files"

    got = {
        (r.x, r.y, r.payload)
        for r in e.catalog.read("grid", predicate=pred).collect()
    }
    want = {
        (r.x, r.y, r.payload)
        for r in e.catalog.read("grid").filter(pred).collect()
    }
    assert got == want and len(want) == 11 * 11


def test_point_predicate_skips(grid_engine):
    kept, total = _pruned_count(grid_engine, "grid", "x = 7")
    assert kept <= 0.6 * total
    n = grid_engine.catalog.read("grid", predicate="x = 7").count()
    assert n == 256


def test_empty_range_reads_zero_files(grid_engine):
    kept, _ = _pruned_count(grid_engine, "grid", "x > 300")
    assert kept == 0
    assert grid_engine.catalog.read("grid", predicate="x > 300").count() == 0


def test_append_after_optimize_is_kept_and_visible(grid_engine):
    e = grid_engine
    e.sql("INSERT INTO grid VALUES (999, 999, 'late')")
    # the new file has x=999 stats harvested at write time, so a low-x
    # predicate still skips it; a matching predicate finds it
    rows = e.catalog.read("grid", predicate="x = 999").collect()
    assert [(r.x, r.y, r.payload) for r in rows] == [(999, 999, "late")]
    kept, total = _pruned_count(e, "grid", "x = 999")
    assert kept < total


def test_unknown_files_are_kept(grid_engine, tmp_path):
    e = grid_engine
    spec = e.catalog.get_table("grid")
    path = e.catalog.table_path(spec)
    os.remove(os.path.join(path, skipping.MANIFEST))
    kept, total = _pruned_count(e, "grid", "x = 7")
    assert kept == total  # no manifest: nothing pruned, nothing lost
    assert e.catalog.read("grid", predicate="x = 7").count() == 256
    assert e.catalog.refresh_file_stats("grid") == total
    kept, _ = _pruned_count(e, "grid", "x = 7")
    assert kept < total


def test_pk_table_prunes_only_on_pk_columns(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_skip_pk"))
    e.sql("CREATE TABLE kv (k BIGINT NOT NULL, v BIGINT, PRIMARY KEY (k))")
    src = spark.range(4096).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v")
    )
    src.createOrReplaceTempView("kv_skip_src")
    e.sql("INSERT INTO kv SELECT * FROM kv_skip_src")
    e.catalog.optimize("kv", target_file_bytes=8 * 1024, zorder_by=["k"])
    # overwrite one key: its latest version lives in a NEW small file
    e.sql("INSERT INTO kv VALUES (17, 9999)")

    # v is mutable -> must NOT prune on it, or the k=17 overwrite's old
    # file would be kept while... (the failure mode pruning must avoid)
    kept, total = _pruned_count(e, "kv", "v = 9999")
    assert kept == total
    rows = e.catalog.read("kv", predicate="v = 9999").collect()
    assert [(r.k, r.v) for r in rows] == [(17, 9999)]

    # k is the PK -> pruning allowed and sound across versions
    kept, total = _pruned_count(e, "kv", "k = 17")
    assert kept < total
    rows = e.catalog.read("kv", predicate="k = 17").collect()
    assert [(r.k, r.v) for r in rows] == [(17, 9999)]

    # tombstones resolve through the pruned scan too
    e.sql("DELETE FROM kv WHERE k = 17")
    assert e.catalog.read("kv", predicate="k = 17").count() == 0


def test_partitioned_bucketed_table_with_skipping(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_skip_pb"))
    e.sql(
        "CREATE TABLE pb (k BIGINT NOT NULL, region STRING NOT NULL,"
        " amt BIGINT, PRIMARY KEY (k, region))"
        " PARTITIONED BY (region) DISTRIBUTED BY (k) INTO 4 BUCKETS"
    )
    src = spark.range(2000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("r"), (F.col("id") % 3).cast("string")).alias("region"),
        (F.col("id") * 10).alias("amt"),
    )
    src.createOrReplaceTempView("pb_skip_src")
    e.sql("INSERT INTO pb SELECT * FROM pb_skip_src")
    pred = "k BETWEEN 100 AND 120"
    got = e.catalog.read("pb", predicate=pred)
    # partition-dir column survives the explicit-file-list read
    assert set(got.columns) == {"k", "region", "amt"}
    rows = {(r.k, r.region, r.amt) for r in got.collect()}
    want = {
        (i, f"r{i % 3}", i * 10) for i in range(100, 121)
    }
    assert rows == want


def test_partitioned_log_table_zorder_prunes_within_partitions(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_skip_pl"))
    e.sql(
        "CREATE TABLE plog (k BIGINT, region STRING, amt BIGINT)"
        " PARTITIONED BY (region)"
    )
    src = spark.range(20000).select(
        F.pmod(F.col("id") * 7919, F.lit(20000)).alias("k"),
        F.concat(F.lit("r"), (F.col("id") % 2).cast("string")).alias("region"),
        (F.col("id") * 10).alias("amt"),
    )
    src.createOrReplaceTempView("plog_skip_src")
    e.sql("INSERT INTO plog SELECT * FROM plog_skip_src")
    e.catalog.optimize("plog", target_file_bytes=16 * 1024, zorder_by=["k"])
    pred = "k BETWEEN 100 AND 200"
    kept, total = _pruned_count(e, "plog", pred)
    assert total >= 6
    assert kept < total, "z-slices within partition dirs must skip"
    got = {(r.k, r.region, r.amt) for r in e.catalog.read("plog", predicate=pred).collect()}
    want = {
        ((i * 7919) % 20000, f"r{i % 2}", i * 10)
        for i in range(20000)
        if 100 <= (i * 7919) % 20000 <= 200
    }
    assert got == want


def test_time_travel_with_predicate(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_skip_tt"))
    e.sql("CREATE TABLE t (k BIGINT NOT NULL, v BIGINT, PRIMARY KEY (k))")
    e.sql("INSERT INTO t VALUES (1, 10), (2, 20)")
    anchor = e.catalog.current_seq("t")
    e.sql("INSERT INTO t VALUES (1, 11)")
    rows = e.catalog.read("t", as_of_seq=anchor, predicate="k = 1").collect()
    assert [(r.k, r.v) for r in rows] == [(1, 10)]


def test_string_column_stats_prune(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_skip_s"))
    e.sql("CREATE TABLE logs (day STRING, msg STRING)")
    src = spark.range(5000).select(
        F.concat(
            F.lit("2026-01-"),
            F.lpad(((F.col("id") % 28) + 1).cast("string"), 2, "0"),
        ).alias("day"),
        F.md5(F.col("id").cast("string")).alias("msg"),
    )
    src.createOrReplaceTempView("logs_skip_src")
    e.sql("INSERT INTO logs SELECT * FROM logs_skip_src")
    e.catalog.optimize("logs", target_file_bytes=32 * 1024, zorder_by=["day"])
    pred = "day = '2026-01-05'"
    kept, total = _pruned_count(e, "logs", pred)
    assert kept < total
    n = e.catalog.read("logs", predicate=pred).count()
    assert n == len([i for i in range(5000) if i % 28 == 4])


# -- chunked parquet manifest store -----------------------------------------


def _mini_parquet(spark, path, lo, hi):
    spark.createDataFrame(
        [(i, f"s{i}") for i in range(lo, hi + 1)], "x bigint, s string"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    return sorted(_parquet_files(path))


def test_chunk_store_migration_and_equivalence(spark, tmp_path, monkeypatch):
    """Past the threshold, add_files migrates the JSON manifest into
    immutable parquet chunks; load() is identical before and after."""
    monkeypatch.setattr(skipping, "CHUNK_THRESHOLD", 3)
    table = str(tmp_path / "chunk_tbl")
    os.makedirs(table)
    files = []
    for i in range(2):
        files += _mini_parquet(spark, os.path.join(table, f"d{i}"), i * 10, i * 10 + 5)
    skipping.add_files(table, files)  # 2 entries: stays JSON
    assert os.path.exists(os.path.join(table, skipping.MANIFEST))
    before = skipping.load(table)
    assert len(before) == 2

    f3 = _mini_parquet(spark, os.path.join(table, "d2"), 100, 105)
    skipping.add_files(table, f3)  # 3 entries: migrates to chunks
    assert not os.path.exists(os.path.join(table, skipping.MANIFEST))
    assert skipping._chunk_files(table)
    after = skipping.load(table)
    assert set(after) == set(before) | {os.path.relpath(f3[0], table)}
    for k, v in before.items():
        assert after[k] == v  # values survive the JSON->parquet migration
    assert after[os.path.relpath(f3[0], table)]["x"] == [100, 105]

    # appends go to NEW chunks; existing chunks are never rewritten
    chunk0 = skipping._chunk_files(table)[0]
    mtime0 = os.path.getmtime(chunk0)
    f4 = _mini_parquet(spark, os.path.join(table, "d3"), 7, 9)
    skipping.add_files(table, f4)
    assert len(skipping._chunk_files(table)) == 2
    assert os.path.getmtime(chunk0) == mtime0
    assert skipping.load(table)[os.path.relpath(f4[0], table)]["x"] == [7, 9]


def test_chunk_store_merge_and_rebuild(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(skipping, "CHUNK_THRESHOLD", 1)
    monkeypatch.setattr(skipping, "CHUNK_MERGE_AT", 4)
    table = str(tmp_path / "merge_tbl")
    os.makedirs(table)
    all_files = []
    for i in range(6):
        fs = _mini_parquet(spark, os.path.join(table, f"d{i}"), i, i)
        all_files += fs
        skipping.add_files(table, fs)
    # 6 appends with merge-at-4: the store must have collapsed
    assert len(skipping._chunk_files(table)) <= 4
    loaded = skipping.load(table)
    assert len(loaded) == 6
    assert loaded[os.path.relpath(all_files[5], table)]["x"] == [5, 5]

    # rebuild on a chunked table replaces everything with one chunk
    n = skipping.rebuild(table, all_files[:2])
    assert n == 2
    assert len(skipping._chunk_files(table)) == 1
    assert len(skipping.load(table)) == 2


def test_chunk_store_prune_and_read_path(spark, tmp_path, monkeypatch):
    """End-to-end through the catalog: a log table whose manifest lives
    in the chunk store still prunes files and answers correctly."""
    monkeypatch.setattr(skipping, "CHUNK_THRESHOLD", 1)
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_chunks"))
    e.sql("CREATE TABLE logs (x BIGINT NOT NULL, s STRING)")
    for i in range(4):
        e.sql(
            f"INSERT INTO logs VALUES ({i * 100}, 'a'), ({i * 100 + 9}, 'b')"
        )
    path = e.catalog.table_path(e.catalog.get_table("logs"))
    assert skipping._chunk_files(path)  # store went chunked
    all_files = sorted(_parquet_files(path))
    kept = skipping.prune(path, all_files, "x BETWEEN 200 AND 209")
    assert len(kept) < len(all_files)
    got = sorted(
        (r.x, r.s)
        for r in e.catalog.read("logs", predicate="x BETWEEN 200 AND 209").collect()
    )
    assert got == [(200, "a"), (209, "b")]


def test_chunk_store_roundtrips_sums_and_blooms(tmp_path):
    """r12: harvested per-file integer sums (SUMS_KEY) survive the
    chunked-manifest serialization exactly, alongside bounds and
    blooms — a consumer reading the chunk store must see the same
    entries the JSON manifest would have held."""
    from fluss_datafusion_spark.catalog import skipping

    root = str(tmp_path / "tbl")
    import os

    os.makedirs(root, exist_ok=True)
    entries = {
        "part-0.parquet": {
            "a": [1, 9],
            skipping.SUMS_KEY: {"a": [10, 2], "b": [-5, 3]},
        },
        "part-1.parquet": {
            "a": [10, 20],
            skipping.SUMS_KEY: {"a": [30, 2]},
        },
        "part-2.parquet": {"a": [21, 30]},  # no sums: absent, not {}
    }
    skipping._write_chunk(root, entries)
    got = skipping._load_chunks(root)
    assert got == entries


# -- rebuild sums carry-forward (r13) ---------------------------------------


def test_rebuild_carries_forward_sums_for_surviving_files(tmp_path, monkeypatch):
    """rebuild() must NOT re-read files whose manifest entry already
    carries sums: a compaction touching 1% of files re-harvests only
    that 1% (uuid part names make a surviving relpath byte-identical)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tp = str(tmp_path / "tbl")
    os.makedirs(tp)

    def write(name, vals):
        p = os.path.join(tp, name)
        pq.write_table(
            pa.table({"k": pa.array(vals, pa.int64())}), p
        )
        return p

    f1 = write("part-aaaa-local.snappy.parquet", [1, 2, 3])
    f2 = write("part-bbbb-local.snappy.parquet", [10, 20])
    assert skipping.rebuild(tp, [f1, f2]) == 2
    m0 = skipping.load(tp)
    assert m0[os.path.basename(f1)][skipping.SUMS_KEY] == {"k": [6, 3]}

    # second rebuild: one new file, f1 survives, f2 rewritten away
    f3 = write("part-cccc-local.snappy.parquet", [100])
    calls = []
    real = skipping._harvest_entry

    def counting(table_path, f, *a, **k):
        calls.append(os.path.basename(f))
        return real(table_path, f, *a, **k)

    monkeypatch.setattr(skipping, "_harvest_entry", counting)
    assert skipping.rebuild(tp, [f1, f3]) == 2
    assert calls == [os.path.basename(f3)], (
        "surviving file was re-harvested")
    m1 = skipping.load(tp)
    assert set(m1) == {os.path.basename(f1), os.path.basename(f3)}
    assert m1[os.path.basename(f1)][skipping.SUMS_KEY] == {"k": [6, 3]}
    assert m1[os.path.basename(f3)][skipping.SUMS_KEY] == {"k": [100, 1]}
    assert m1[os.path.basename(f1)]["k"] == [1, 3]  # bounds intact

    # a bloom request the old entry can't satisfy forces re-harvest
    calls.clear()
    assert skipping.rebuild(tp, [f1, f3], bloom_columns=["k"]) == 2
    assert sorted(calls) == sorted(
        [os.path.basename(f1), os.path.basename(f3)]
    )
    # ... and once blooms are in the manifest, they carry forward too
    calls.clear()
    assert skipping.rebuild(tp, [f1, f3], bloom_columns=["k"]) == 2
    assert calls == []
