"""Continuous media ingest with perceptual dedup
(operators/incremental.media_ingest_sink): end-to-end drop decisions
across micro-batches, appended == rebuilt index equality, undecodable
payload quarantine, and metrics accounting."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.functions.multimodal import (
    image_dhash_stats,
    synthesize_gradient_bmp_media,
)
from fluss_datafusion_spark.operators.incremental import (
    media_ingest_sink,
    write_hamming_index,
)


def _media(spark, lo, hi):
    return synthesize_gradient_bmp_media(
        spark.range(lo, hi).select(F.col("id").alias("doc_id"))
    )


def _write_chunks(media_df, out_dir, bounds):
    """One mtime-ordered parquet file per (lo, hi) id range."""
    os.makedirs(out_dir, exist_ok=True)
    base = time.time()
    for i, (lo, hi) in enumerate(bounds):
        pdf = (
            media_df.filter(
                (F.col("media_id") >= lo) & (F.col("media_id") < hi)
            )
            .toPandas()
            .sort_values("media_id")
        )
        fp = os.path.join(out_dir, f"b{i:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), fp)
        os.utime(fp, (base + i, base + i))
    return out_dir


def _stream(spark, replay):
    return (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )


def _setup(spark, tmp, index_ids=25):
    """Index over unperturbed ids [0, index_ids); engine table ready."""
    media = _media(spark, 0, 200)
    hashes = image_dhash_stats(media).select("media_id", "dhash")
    index = str(tmp / "idx")
    write_hamming_index(
        hashes.filter(F.col("media_id") < index_ids),
        "media_id",
        "dhash",
        index,
    )
    e = EngineSession(spark=spark, warehouse=str(tmp / "wh"))
    e.sql(
        "CREATE TABLE media_tbl (media_id BIGINT NOT NULL, width INT,"
        " height INT, dhash BIGINT, ahash BIGINT, PRIMARY KEY (media_id))"
    )
    return media, index, e


def test_media_ingest_end_to_end(spark, tmp_path):
    """Two batches: batch-0 clusters seen in the index drop at Hamming 1;
    unseen clusters survive and are appended; batch-1 then drops
    ENTIRELY — half against the original index, half at Hamming 0
    against batch-0's survivors."""
    media, index, e = _setup(spark, tmp_path)
    replay = _write_chunks(
        media, str(tmp_path / "replay"), ((100, 150), (150, 200))
    )
    metrics = []
    media_ingest_sink(
        _stream(spark, replay),
        e.catalog,
        "media_tbl",
        index,
        str(tmp_path / "ckpt"),
        metrics=metrics,
    ).awaitTermination()

    got = sorted(
        r.media_id for r in e.sql("SELECT media_id FROM media_tbl").collect()
    )
    assert got == list(range(125, 150))
    assert metrics == [
        {"batch_id": 0, "n_in": 50, "n_filtered": 0, "n_dropped": 25,
         "n_kept": 25},
        {"batch_id": 1, "n_in": 50, "n_filtered": 0, "n_dropped": 50,
         "n_kept": 0},
    ]
    # survivors' fingerprints are faithful: table rows == direct derivation
    want = {
        r.media_id: (r.width, r.height, r.dhash)
        for r in image_dhash_stats(media)
        .filter(F.col("media_id").between(125, 149))
        .collect()
    }
    rows = e.sql(
        "SELECT media_id, width, height, dhash FROM media_tbl"
    ).collect()
    assert {r.media_id: (r.width, r.height, r.dhash) for r in rows} == want


def test_media_ingest_appended_equals_rebuilt(spark, tmp_path):
    """The index after ingest equals one rebuilt from scratch over
    (original corpus + survivors) — the pure-append discipline."""
    media, index, e = _setup(spark, tmp_path)
    replay = _write_chunks(
        media, str(tmp_path / "replay"), ((100, 150), (150, 200))
    )
    media_ingest_sink(
        _stream(spark, replay),
        e.catalog,
        "media_tbl",
        index,
        str(tmp_path / "ckpt"),
    ).awaitTermination()

    rebuilt = str(tmp_path / "rebuilt")
    final_ids = F.col("media_id") < 25
    write_hamming_index(
        image_dhash_stats(media)
        .filter(final_ids | F.col("media_id").between(125, 149))
        .select("media_id", "dhash"),
        "media_id",
        "dhash",
        rebuilt,
    )
    for store in ("hashes", "buckets"):
        a = spark.read.parquet(os.path.join(index, store))
        b = spark.read.parquet(os.path.join(rebuilt, store))
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), store


def test_media_ingest_undecodable_quarantined(spark, tmp_path):
    """Garbage payloads are filtered: never inserted, never indexed,
    counted in n_filtered."""
    media, index, e = _setup(spark, tmp_path)
    pdf = (
        media.filter(F.col("media_id").between(125, 129))
        .toPandas()
        .sort_values("media_id")
    )
    pdf.loc[pdf["media_id"] == 127, "payload"] = b"\x00not-an-image"
    replay = str(tmp_path / "replay")
    os.makedirs(replay)
    fp = os.path.join(replay, "b00000.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), fp)

    metrics = []
    media_ingest_sink(
        _stream(spark, replay),
        e.catalog,
        "media_tbl",
        index,
        str(tmp_path / "ckpt"),
        metrics=metrics,
    ).awaitTermination()

    got = sorted(
        r.media_id for r in e.sql("SELECT media_id FROM media_tbl").collect()
    )
    assert got == [125, 126, 128, 129]
    assert metrics == [
        {"batch_id": 0, "n_in": 5, "n_filtered": 1, "n_dropped": 0,
         "n_kept": 4},
    ]
    idx_ids = {
        r["__id__"]
        for r in spark.read.parquet(os.path.join(index, "hashes")).collect()
    }
    assert 127 not in idx_ids and {125, 126, 128, 129} <= idx_ids


def test_media_ingest_transform_hook(spark, tmp_path):
    """A payload-level transform (size gate) runs before fingerprinting
    and its drops count as filtered."""
    media, index, e = _setup(spark, tmp_path)
    replay = _write_chunks(media, str(tmp_path / "replay"), ((125, 135),))

    def gate(df):
        # keep even ids only — a stand-in for any payload curation rule
        return df.filter(F.col("media_id") % 2 == 0)

    metrics = []
    media_ingest_sink(
        _stream(spark, replay),
        e.catalog,
        "media_tbl",
        index,
        str(tmp_path / "ckpt"),
        transform=gate,
        metrics=metrics,
    ).awaitTermination()
    got = sorted(
        r.media_id for r in e.sql("SELECT media_id FROM media_tbl").collect()
    )
    assert got == [126, 128, 130, 132, 134]
    assert metrics == [
        {"batch_id": 0, "n_in": 10, "n_filtered": 5, "n_dropped": 0,
         "n_kept": 5},
    ]


def test_media_ingest_audio_fingerprint_hook(spark, tmp_path):
    """The same sink ingests AUDIO: fingerprint=audio_fingerprint with
    hash_col='afp' — gain-variant chord copies dedup against the
    indexed corpus exactly like images do."""
    from fluss_datafusion_spark.functions.multimodal import (
        audio_fingerprint,
        synthesize_chord_media,
    )
    from fluss_datafusion_spark.operators.incremental import (
        write_hamming_index,
    )

    media = synthesize_chord_media(
        spark.range(0, 60).select(F.col("id").alias("doc_id"))
    )
    fp = audio_fingerprint(media).select("media_id", "afp")
    index = str(tmp_path / "idx")
    # corpus = clusters 0..9 (ids 0..9); ingest ids 20..59
    write_hamming_index(
        fp.filter(F.col("media_id") < 10), "media_id", "afp", index
    )
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE audio_tbl (media_id BIGINT NOT NULL, afp BIGINT,"
        " n_windows INT, PRIMARY KEY (media_id))"
    )
    replay = _write_chunks(media, str(tmp_path / "replay"), ((20, 60),))
    metrics = []
    media_ingest_sink(
        _stream(spark, replay),
        e.catalog,
        "audio_tbl",
        index,
        str(tmp_path / "ckpt"),
        fingerprint=audio_fingerprint,
        hash_col="afp",
        metrics=metrics,
    ).awaitTermination()
    got = sorted(
        r.media_id for r in e.sql("SELECT media_id FROM audio_tbl").collect()
    )
    # ids 20..29 pair with indexed clusters 0..9 -> dropped; clusters
    # 10..19 appear twice in the batch (30..39 vs 50..59 collide at
    # ham 0; 20+c pairs 40+c): greater ids drop
    assert got == list(range(30, 40))
    assert metrics == [
        {"batch_id": 0, "n_in": 40, "n_filtered": 0, "n_dropped": 30,
         "n_kept": 10},
    ]


def test_hamming_store_manifest_prunes_probe_files(spark, tmp_path):
    """r11: index bucket stores are range-clustered and carry a
    skipping manifest; a probe whose touched keys live in a narrow
    slice range reads a strict subset of the store files, and a batch
    touching NO possible slice reads nothing — while appends keep the
    manifest current and results stay exact (fallback = full read)."""
    from pyspark.sql import functions as F

    from fluss_datafusion_spark.catalog import skipping
    from fluss_datafusion_spark.catalog.catalog import _parquet_files
    from fluss_datafusion_spark.operators import incremental as inc

    path = str(tmp_path / "hidx")
    # ids chosen so fingerprints (= id here) spread the 16-bit slice
    # space: slices of hash h are its four 16-bit blocks
    base = spark.range(0, 4096).select(
        F.col("id").alias("media_id"),
        (F.col("id") * 65537).alias("dhash"),  # low+high blocks vary
    )
    # a production store has many files; at test size AQE would
    # coalesce the range shuffle into one — pin the partition count so
    # the clustering (and thus the prune) is observable
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        inc.write_hamming_index(base, "media_id", "dhash", path)
    finally:
        spark.conf.set(coalesce_key, prev)
    store = path + "/buckets"
    files = sorted(_parquet_files(store))
    assert len(files) >= inc._PROBE_PRUNE_MIN_FILES
    assert len(skipping.load(store)) == len(files)

    # a 2-fingerprint batch touches <= 8 slice keys: the clustered
    # store must serve it from a strict subset of its files
    batch = spark.createDataFrame(
        [(9001, 5 * 65537), (9002, 6 * 65537)], "media_id long, dhash long"
    )
    bands = inc._hamming_bands(
        batch.select(
            F.col("media_id").alias("__id__"), F.col("dhash").alias("__h__")
        ),
        n_bands=4,
    )
    pr = inc._pruned_store_read(
        spark, store, bands.select("__band__", "__slice__"),
        ["__band__", "__slice__"],
    )
    read_files = pr.select(F.input_file_name()).distinct().count()
    assert 0 < read_files < len(files)

    # exactness end-to-end: the pruned probe finds the ham<=2 pair
    pairs = inc.incremental_hamming_pairs(
        spark.createDataFrame([(9001, 5 * 65537)], "media_id long, dhash long"),
        path, "media_id", "dhash", max_hamming=2,
    )
    assert [(r.id_a, r.id_b) for r in pairs.collect()] == [(5, 9001)]

    # appends land in the manifest; probe results stay exact after them
    inc.append_to_hamming_index(
        spark.createDataFrame(
            [(8000, 40000 * 65537)], "media_id long, dhash long"
        ),
        "media_id", "dhash", path,
    )
    assert len(skipping.load(store)) == len(_parquet_files(store))
    pairs2 = inc.incremental_hamming_pairs(
        spark.createDataFrame(
            [(9100, 40000 * 65537)], "media_id long, dhash long"
        ),
        path, "media_id", "dhash", max_hamming=2,
    )
    assert [(r.id_a, r.id_b) for r in pairs2.collect()] == [(8000, 9100)]


def test_incremental_hamming_pairs_match_bruteforce_random(spark, tmp_path):
    """r11 guard for the pruned probe path: across several random
    fingerprint corpora and batch splits (including near-dup planted
    pairs and store appends), the incremental probe must emit exactly
    the brute-force popcount pairs touching the batch."""
    import random

    from pyspark.sql import functions as F

    from fluss_datafusion_spark.operators import incremental as inc

    rng = random.Random(23)
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    for trial in range(3):
        base_h = {
            i: rng.getrandbits(63) for i in range(trial * 100, trial * 100 + 40)
        }
        # plant near-dups: some corpus-vs-batch, some batch-internal
        ids = sorted(base_h)
        batch_h = {}
        for j in range(6):
            src = ids[rng.randrange(len(ids))]
            h = base_h[src]
            if j % 2:
                h ^= 1 << rng.randrange(64)  # hamming 1
            batch_h[1000 + trial * 100 + j] = h
        batch_h[1000 + trial * 100 + 90] = rng.getrandbits(63)  # loner

        path = str(tmp_path / f"h{trial}")
        corpus_df = spark.createDataFrame(
            sorted(base_h.items()), "media_id long, dhash long"
        )
        spark.conf.set(coalesce_key, "false")
        try:
            inc.write_hamming_index(corpus_df, "media_id", "dhash", path)
        finally:
            spark.conf.set(coalesce_key, prev)
        # grow the store with an append so the probe crosses build+append
        extra = {5000 + trial: rng.getrandbits(63)}
        inc.append_to_hamming_index(
            spark.createDataFrame(
                sorted(extra.items()), "media_id long, dhash long"
            ),
            "media_id", "dhash", path,
        )
        corpus_all = {**base_h, **extra}

        batch_df = spark.createDataFrame(
            sorted(batch_h.items()), "media_id long, dhash long"
        )
        got = sorted(
            (r.id_a, r.id_b, r.ham)
            for r in inc.incremental_hamming_pairs(
                batch_df, path, "media_id", "dhash", max_hamming=2
            ).collect()
        )
        want = []
        everything = {**corpus_all, **batch_h}
        for a in sorted(everything):
            for b in sorted(everything):
                if a >= b:
                    continue
                if a not in batch_h and b not in batch_h:
                    continue  # corpus-internal pairs are never re-emitted
                ham = bin(everything[a] ^ everything[b]).count("1")
                if ham <= 2:
                    want.append((a, b, ham))
        assert got == sorted(want), (trial, got, want)
