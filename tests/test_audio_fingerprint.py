"""Audio fingerprinting (functions/multimodal.audio_fingerprint) and
Hamming near-dup over the afp column: gain invariance, cross-cluster
separation, short/undecodable handling, incremental-index reuse."""

from pyspark.sql import functions as F

from fluss_datafusion_spark.functions.multimodal import (
    audio_fingerprint,
    synthesize_chord_media,
    synthesize_tone_media,
)


def _ids(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_gain_invariance_and_separation(spark):
    media = synthesize_chord_media(_ids(spark, 100))
    rows = {r.media_id: r for r in audio_fingerprint(media).collect()}
    assert all(r.decoded_ok for r in rows.values())
    mask = (1 << 64) - 1
    for i in range(20, 100):
        # same chord, different gain and length -> identical fingerprint
        assert rows[i].afp == rows[i % 20].afp, i
    hams = [
        bin((rows[a].afp ^ rows[b].afp) & mask).count("1")
        for a in range(20)
        for b in range(a + 1, 20)
    ]
    assert min(hams) == 6  # disjoint bin triples


def test_expected_bits_set(spark):
    media = synthesize_chord_media(_ids(spark, 20))
    rows = {r.media_id: r.afp for r in audio_fingerprint(media).collect()}
    for c in range(20):
        want = 0
        for j in (3 * c + 1, 3 * c + 2, 3 * c + 3):
            want |= 1 << (64 - j)
        want = want - (1 << 64) if want >= (1 << 63) else want
        assert rows[c] == want, c


def test_window_count_and_short_clip(spark):
    media = synthesize_chord_media(_ids(spark, 6))
    rows = {
        r.media_id: r.n_windows for r in audio_fingerprint(media).collect()
    }
    assert rows == {i: 2 + i % 3 for i in range(6)}
    bad = spark.createDataFrame(
        [(0, b"RIFFnope"), (1, b"\x00" * 16)], "media_id long, payload binary"
    )
    out = {r.media_id: r for r in audio_fingerprint(bad).collect()}
    assert not out[0].decoded_ok and out[0].afp is None
    assert not out[1].decoded_ok


def test_hamming_index_roundtrip(spark, tmp_path):
    """The audio fingerprints ride the SAME persisted Hamming index the
    image path uses — probe finds the cross-batch chord copies."""
    from fluss_datafusion_spark.operators.incremental import (
        incremental_hamming_pairs,
        write_hamming_index,
    )

    media = synthesize_chord_media(_ids(spark, 60))
    fp = audio_fingerprint(media).select("media_id", "afp")
    root = str(tmp_path / "afp_idx")
    write_hamming_index(
        fp.filter(F.col("media_id") < 20), "media_id", "afp", root
    )
    pairs = incremental_hamming_pairs(
        fp.filter(F.col("media_id") >= 40),
        root,
        "media_id",
        "afp",
        max_hamming=2,
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    want = {(c, c + 40) for c in range(20)}
    assert got == want and all(r.ham == 0 for r in pairs)


def test_tone_fixture_also_fingerprints(spark):
    """Pure-tone fixture (1 bin set) still decodes; distinct tones sit
    at Hamming 2 — the reason the dedup fixture uses chords."""
    media = synthesize_tone_media(_ids(spark, 4))
    rows = {r.media_id: r for r in audio_fingerprint(media).collect()}
    assert all(r.decoded_ok for r in rows.values())
    mask = (1 << 64) - 1
    assert bin((rows[0].afp ^ rows[1].afp) & mask).count("1") == 2


def test_video_fingerprint_matches_image_dhash(spark):
    """Majority-vote video fingerprint of the gradient AVI equals the
    still gradient image's dHash for unperturbed ids (brightness
    offsets are gradient-invariant), and near-dups pair at Hamming 1."""
    from fluss_datafusion_spark.functions.multimodal import (
        image_dhash_stats,
        synthesize_gradient_avi_media,
        synthesize_gradient_bmp_media,
        video_fingerprint,
    )
    from fluss_datafusion_spark.operators.dedup import hamming_near_dup_pairs

    ids = _ids(spark, 120)
    vfp = {
        r.media_id: r
        for r in video_fingerprint(
            synthesize_gradient_avi_media(ids, cluster_mod=50)
        ).collect()
    }
    dhash = {
        r.media_id: r.dhash
        for r in image_dhash_stats(
            synthesize_gradient_bmp_media(ids, cluster_mod=50)
        ).collect()
    }
    assert all(r.decoded_ok and r.n_frames == 4 for r in vfp.values())
    for i in range(100):  # unperturbed: video fp == still-image dhash
        assert vfp[i].vfp == dhash[i], i
    mask = (1 << 64) - 1
    for c in range(20):  # perturbed copies: exactly one bit apart
        assert bin((vfp[c].vfp ^ vfp[c + 100].vfp) & mask).count("1") == 1
    pairs = hamming_near_dup_pairs(
        video_fingerprint(
            synthesize_gradient_avi_media(ids, cluster_mod=50)
        ).select("media_id", "vfp"),
        "media_id", "vfp", max_hamming=2,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    want = {
        (a, b)
        for a in range(120)
        for b in range(a + 1, 120)
        if a % 50 == b % 50
    }
    assert got == want


def test_video_ingest_sink_hook(spark, tmp_path):
    """media_ingest_sink ingests VIDEO with fingerprint=video_fingerprint
    — the third modality on the same index machinery."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.functions.multimodal import (
        synthesize_gradient_avi_media,
        video_fingerprint,
    )
    from fluss_datafusion_spark.operators.incremental import (
        media_ingest_sink,
        write_hamming_index,
    )

    media = synthesize_gradient_avi_media(_ids(spark, 60), cluster_mod=10)
    fp = video_fingerprint(media).select("media_id", "vfp")
    index = str(tmp_path / "idx")
    write_hamming_index(
        fp.filter(F.col("media_id") < 10), "media_id", "vfp", index
    )
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE video_tbl (media_id BIGINT NOT NULL, vfp BIGINT,"
        " n_frames INT, PRIMARY KEY (media_id))"
    )
    replay = str(tmp_path / "replay")
    import os as _os

    _os.makedirs(replay)
    pdf = (
        media.filter(F.col("media_id") >= 20)
        .toPandas()
        .sort_values("media_id")
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        _os.path.join(replay, "b0.parquet"),
    )
    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    media_ingest_sink(
        stream, e.catalog, "video_tbl", index, str(tmp_path / "ckpt"),
        fingerprint=video_fingerprint, hash_col="vfp",
    ).awaitTermination()
    got = sorted(
        r.media_id for r in e.sql("SELECT media_id FROM video_tbl").collect()
    )
    # every batch id's cluster (c = id % 10) is already in the index,
    # so the corpus-copy-wins rule drops the whole batch
    assert got == []
