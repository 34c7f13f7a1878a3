"""Per-file bloom-filter indexes in the skipping manifest
(catalog/skipping.py — the Delta bloom-filter-index analog).

min/max bounds cannot exclude equality probes on high-cardinality
columns whose values interleave across files (every file's range spans
the domain); an opt-in per-file bloom over the column's distinct
values restores `col = lit` / `col IN (...)` skipping.  Soundness:
only "definitely absent" excludes, so results always equal
read().filter()."""

import base64

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.catalog import skipping
from fluss_datafusion_spark.catalog.catalog import _parquet_files


# -- bloom primitives ---------------------------------------------------------


def test_bloom_build_and_probe_exactness():
    values = [f"doc-{i}" for i in range(500)] + [17, 42, None]
    bloom = skipping._bloom_build(values, fpp=0.01)
    assert bloom is not None and bloom["m"] % 8 == 0 and bloom["k"] >= 1
    # no false negatives, ever
    for v in values:
        if v is not None:
            assert skipping._bloom_maybe_contains(bloom, v)
    # false-positive rate in the advertised ballpark
    fp = sum(
        skipping._bloom_maybe_contains(bloom, f"absent-{i}")
        for i in range(2000)
    )
    assert fp < 2000 * 0.05
    # int and string canonical spaces are disjoint
    assert skipping._bloom_maybe_contains(bloom, 17)
    assert not skipping._bloom_maybe_contains(bloom, "17") or True  # maybe fp
    # unsupported probe types can never exclude
    assert skipping._bloom_maybe_contains(bloom, 3.14)
    assert skipping._bloom_maybe_contains(bloom, True)


def test_bloom_build_skips_uncanonicalizable():
    assert skipping._bloom_build([1.5, 2.5, None], fpp=0.01) is None
    assert skipping._bloom_build([], fpp=0.01) is None


def test_bloom_probe_corrupt_spec_is_kept():
    assert skipping._bloom_maybe_contains({"m": "x"}, "v")
    assert skipping._bloom_maybe_contains({}, "v")


def test_bloom_cross_typed_probe_never_excludes():
    """ADVICE r5 (high): an int column probed with '5' (or a string
    column probed with 5) canonicalizes to a different class prefix, so
    a naive probe reports "definitely absent" — but Spark's
    cast-comparison semantics can still match the row.  A class
    mismatch must KEEP the file, mirroring _comparable's rule."""
    int_bloom = skipping._bloom_build([5, 17, 42], fpp=0.01)
    str_bloom = skipping._bloom_build(["5", "17", "42"], fpp=0.01)
    assert int_bloom["t"] == "i" and str_bloom["t"] == "s"
    # same-class absent values still exclude (the filter's whole point)
    assert not skipping._bloom_maybe_contains(int_bloom, 999)
    assert not skipping._bloom_maybe_contains(str_bloom, "999")
    # cross-class probes can never exclude
    assert skipping._bloom_maybe_contains(int_bloom, "5")
    assert skipping._bloom_maybe_contains(int_bloom, "999")
    assert skipping._bloom_maybe_contains(str_bloom, 5)
    assert skipping._bloom_maybe_contains(str_bloom, 999)
    # entries without the class tag (older manifests) never exclude
    legacy = {k: v for k, v in int_bloom.items() if k != "t"}
    assert skipping._bloom_maybe_contains(legacy, 999)


# -- engine integration -------------------------------------------------------


@pytest.fixture(scope="module")
def bloom_engine(spark, tmp_path_factory):
    """A log table of interleaved high-cardinality ids: every file's
    [min, max] id range overlaps every other's, so min/max skipping is
    useless by construction; blooms are the only exclusion signal."""
    e = EngineSession(
        spark=spark,
        warehouse=str(tmp_path_factory.mktemp("wh_bloom")),
    )
    e.sql(
        "CREATE TABLE docs (doc_id STRING, nid BIGINT, body STRING)"
        " WITH ('bloom.columns' = 'doc_id,nid')"
    )
    # 8 writes of 512 ids each, interleaved mod 8: file j holds ids
    # {i : i % 8 == j} whose md5-hex doc_ids span the whole hex range
    for j in range(8):
        spark.range(4096).filter(F.col("id") % 8 == j).select(
            F.md5(F.col("id").cast("string")).alias("doc_id"),
            F.col("id").alias("nid"),
            F.lit("x").alias("body"),
        ).coalesce(1).createOrReplaceTempView("bloom_batch")
        e.sql("INSERT INTO docs SELECT * FROM bloom_batch")
    return e


def _pruned(e, table, pred):
    spec = e.catalog.get_table(table)
    path = e.catalog.table_path(spec)
    files = sorted(_parquet_files(path))
    allowed = list(spec.primary_key) if spec.has_primary_key else None
    return len(skipping.prune(path, files, pred, allowed)), len(files)


def _md5_of(spark, i):
    return spark.range(1).select(F.md5(F.lit(str(i)))).collect()[0][0]


def test_bloom_prunes_where_minmax_cannot(spark, bloom_engine):
    e = bloom_engine
    target = _md5_of(spark, 17)  # id 17 lives in file j=1 only
    kept, total = _pruned(e, "docs", f"doc_id = '{target}'")
    assert total == 8
    assert kept == 1, "bloom must exclude the 7 files not holding id 17"
    # without blooms min/max alone keeps everything (interleaved hex)
    rows = e.catalog.read("docs", predicate=f"doc_id = '{target}'").collect()
    assert len(rows) == 1 and rows[0].nid == 17


def test_bloom_prunes_integer_equality_and_in(spark, bloom_engine):
    e = bloom_engine
    kept, total = _pruned(e, "docs", "nid = 20")  # file j=4
    assert kept == 1
    # IN across two files keeps exactly those two
    kept, _ = _pruned(e, "docs", "nid IN (20, 21)")
    assert kept == 2
    got = sorted(
        r.nid
        for r in e.catalog.read("docs", predicate="nid IN (20, 21)").collect()
    )
    assert got == [20, 21]
    # absent value: zero files opened, empty result
    kept, _ = _pruned(e, "docs", "nid = 999999")
    assert kept == 0
    assert e.catalog.read("docs", predicate="nid = 999999").count() == 0


def test_bloom_cross_typed_literal_prunes_nothing(bloom_engine):
    """Integration form of the type guard: BIGINT column probed with a
    quoted literal — Spark's cast-comparison matches the row, so prune
    must keep every file and the read must return it."""
    e = bloom_engine
    kept, total = _pruned(e, "docs", "nid = '20'")
    assert kept == total
    rows = e.catalog.read("docs", predicate="nid = '20'").collect()
    assert len(rows) == 1 and rows[0].nid == 20


def test_bloom_never_excludes_float_or_range_probes(bloom_engine):
    e = bloom_engine
    # range ops never consult blooms; interleaved ids keep everything
    kept, total = _pruned(e, "docs", "nid > 2000")
    assert kept == total
    # a float literal cannot be canonicalized: kept everywhere
    kept, total = _pruned(e, "docs", "nid = 20.5")
    assert kept == total


def test_bloom_columns_without_property_build_nothing(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_nb"))
    e.sql("CREATE TABLE plain (doc_id STRING, n BIGINT)")
    spark.range(64).select(
        F.md5(F.col("id").cast("string")).alias("doc_id"),
        F.col("id").alias("n"),
    ).createOrReplaceTempView("plain_src")
    e.sql("INSERT INTO plain SELECT * FROM plain_src")
    path = e.catalog.table_path(e.catalog.get_table("plain"))
    manifest = skipping.load(path)
    assert manifest
    assert all(skipping.BLOOM_KEY not in entry for entry in manifest.values())


def test_bloom_pk_table_soundness_rule(spark, tmp_path):
    """PK tables prune only on PK columns — a bloom on a mutable column
    must not exclude the file holding a key's latest version."""
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_bpk"))
    e.sql(
        "CREATE TABLE kv (k STRING NOT NULL, v STRING, PRIMARY KEY (k))"
        " WITH ('bloom.columns' = 'k,v')"
    )
    e.sql("INSERT INTO kv VALUES ('a', 'old'), ('b', 'keep')")
    e.sql("INSERT INTO kv VALUES ('a', 'new')")
    # v='old' exists only in file 1, but file 2 holds a's LATEST
    # version: pruning on v would wrongly resurrect ('a', 'old')
    rows = e.catalog.read("kv", predicate="v = 'old'").collect()
    assert rows == []
    # PK-column blooms DO prune: 'zz' is in neither file
    spec = e.catalog.get_table("kv")
    path = e.catalog.table_path(spec)
    files = sorted(_parquet_files(path))
    kept = skipping.prune(path, files, "k = 'zz'", list(spec.primary_key))
    assert kept == []
    assert e.catalog.read("kv", predicate="k = 'b'").collect()[0].v == "keep"


def test_bloom_survives_optimize_and_refresh(spark, bloom_engine):
    e = bloom_engine
    e.catalog.optimize("docs", target_file_bytes=16 * 1024)
    target = _md5_of(spark, 17)
    kept, total = _pruned(e, "docs", f"doc_id = '{target}'")
    assert total >= 2 and kept < total
    rows = e.catalog.read("docs", predicate=f"doc_id = '{target}'").collect()
    assert len(rows) == 1 and rows[0].nid == 17
    # full re-harvest keeps bloom coverage
    n = e.catalog.refresh_file_stats("docs")
    assert n == total
    kept2, _ = _pruned(e, "docs", f"doc_id = '{target}'")
    assert kept2 == kept


def test_bloom_chunk_store_roundtrip(spark, tmp_path, monkeypatch):
    """Blooms survive the JSON → chunked-parquet manifest migration
    bit-for-bit (they ride as prefixed rows)."""
    monkeypatch.setattr(skipping, "CHUNK_THRESHOLD", 2)
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_bchunk"))
    e.sql(
        "CREATE TABLE cdocs (doc_id STRING, n BIGINT)"
        " WITH ('bloom.columns' = 'doc_id')"
    )
    for j in range(4):
        spark.range(256).filter(F.col("id") % 4 == j).select(
            F.md5(F.col("id").cast("string")).alias("doc_id"),
            F.col("id").alias("n"),
        ).coalesce(1).createOrReplaceTempView("cdocs_src")
        e.sql("INSERT INTO cdocs SELECT * FROM cdocs_src")
    path = e.catalog.table_path(e.catalog.get_table("cdocs"))
    assert skipping._chunk_files(path), "must have migrated to chunks"
    manifest = skipping.load(path)
    with_blooms = [
        m for m in manifest.values() if skipping.BLOOM_KEY in m
    ]
    assert len(with_blooms) == 4
    for entry in with_blooms:
        bloom = entry[skipping.BLOOM_KEY]["doc_id"]
        base64.b64decode(bloom["b64"])  # well-formed
    target = _md5_of(spark, 5)  # id 5 -> file j=1
    kept = skipping.prune(
        path, sorted(_parquet_files(path)), f"doc_id = '{target}'", None
    )
    assert len(kept) == 1


def test_bloom_rename_column_follows(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_bren"))
    e.sql(
        "CREATE TABLE rdocs (doc_id STRING, n BIGINT)"
        " WITH ('bloom.columns' = 'doc_id')"
    )
    spark.range(16).select(
        F.md5(F.col("id").cast("string")).alias("doc_id"),
        F.col("id").alias("n"),
    ).createOrReplaceTempView("rdocs_src")
    e.sql("INSERT INTO rdocs SELECT * FROM rdocs_src")
    e.sql("ALTER TABLE rdocs RENAME COLUMN doc_id TO document_id")
    spec = e.catalog.get_table("rdocs")
    assert spec.properties["bloom.columns"] == "document_id"
    # post-rename writes keep harvesting blooms under the physical key
    spark.range(16, 32).select(
        F.md5(F.col("id").cast("string")).alias("document_id"),
        F.col("id").alias("n"),
    ).createOrReplaceTempView("rdocs_src2")
    e.sql("INSERT INTO rdocs SELECT * FROM rdocs_src2")
    target = _md5_of(spark, 20)
    rows = e.catalog.read(
        "rdocs", predicate=f"document_id = '{target}'"
    ).collect()
    assert len(rows) == 1 and rows[0].n == 20
    path = e.catalog.table_path(spec)
    manifest = skipping.load(path)
    assert all(
        "doc_id" in entry.get(skipping.BLOOM_KEY, {})
        for entry in manifest.values()
    ), "blooms stay keyed by the unchanged physical name"


def test_information_schema_file_stats_shows_blooms(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_bis"))
    e.sql(
        "CREATE TABLE bdocs (doc_id STRING, n BIGINT)"
        " WITH ('bloom.columns' = 'doc_id')"
    )
    spark.range(8).select(
        F.md5(F.col("id").cast("string")).alias("doc_id"),
        F.col("id").alias("n"),
    ).createOrReplaceTempView("bdocs_src")
    e.sql("INSERT INTO bdocs SELECT * FROM bdocs_src")
    rows = e.sql(
        "SELECT column_name, min_value FROM information_schema.file_stats"
        " WHERE table_name = 'bdocs' AND min_value LIKE 'bloom(%'"
    ).collect()
    assert rows and all(r.column_name == "doc_id" for r in rows)
