"""Segment-level audio fingerprints + streaming clip-reuse ingest
(functions/multimodal.audio_segment_fingerprints riding
media_ingest_sink): fixed-granule segmentation, closed-form chord
bits, packed uids, quarantine, and the two-batch drop tree."""

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.functions.multimodal import (
    audio_segment_fingerprints,
    synthesize_segment_chord_media,
)


def _clips(spark, lo, hi):
    return synthesize_segment_chord_media(
        spark.range(lo, hi).select(F.col("id").alias("doc_id"))
    )


def _expect_afp(c):
    raw = sum(1 << (63 - b) for b in (3 * c, 3 * c + 1, 3 * c + 2))
    return raw - (1 << 64) if raw >= (1 << 63) else raw


def test_segment_fp_closed_form_and_structure(spark):
    """Every segment's fingerprint equals the cluster's 3-bit closed
    form (incl. cluster 0, whose top bit is the sign bit); uids pack
    64*clip + segment; granules are 4 windows at 4*s offsets."""
    fps = audio_segment_fingerprints(_clips(spark, 0, 20)).toPandas()
    assert bool(fps["decoded_ok"].all())
    assert len(fps) == sum(2 + i % 2 for i in range(20))
    for r in fps.itertuples():
        c = (int(r.audio_id) + 17 * int(r.seg_idx)) % 20
        assert r.afp == _expect_afp(c)
        assert r.media_id == 64 * r.audio_id + r.seg_idx
        assert r.start_window == 4 * r.seg_idx and r.n_windows == 4


def test_segment_fp_quarantine(spark):
    """Junk, sub-granule and over-long payloads yield one
    decoded_ok=false row; n_fft/seg_windows guards refuse."""
    junk = spark.createDataFrame(
        [(100, bytearray(b"not a wav"))], "media_id long, payload binary"
    )
    fps = audio_segment_fingerprints(junk).toPandas()
    assert list(fps["media_id"]) == [6400] and not fps["decoded_ok"].any()
    good = _clips(spark, 0, 2)
    capped = audio_segment_fingerprints(good, max_segments=1).toPandas()
    assert (~capped["decoded_ok"]).all()  # every clip has >= 2 segments
    # a clip shorter than one granule quarantines: ask for huge granules
    short = audio_segment_fingerprints(good, seg_windows=64).toPandas()
    assert (~short["decoded_ok"]).all()
    with pytest.raises(ValueError):
        audio_segment_fingerprints(good, n_fft=64)
    with pytest.raises(ValueError):
        audio_segment_fingerprints(good, seg_windows=0)


def test_audio_segment_ingest_sink_e2e(spark, tmp_path):
    """Two micro-batches of clips dedup at SEGMENT grain against the
    persisted index; expected survivors replayed in pure Python from
    the fixture arithmetic (the scene-sink test, acoustic edition)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.operators.incremental import (
        media_ingest_sink,
        write_hamming_index,
    )

    media = _clips(spark, 0, 40)
    index = str(tmp_path / "idx")
    fps = audio_segment_fingerprints(media).filter("decoded_ok")
    write_hamming_index(
        fps.filter(F.col("audio_id") < 6), "media_id", "afp", index
    )
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE aseg (media_id BIGINT NOT NULL, audio_id BIGINT,"
        " seg_idx INT, start_window INT, n_windows INT, afp BIGINT,"
        " PRIMARY KEY (media_id))"
    )
    replay = str(tmp_path / "replay")
    os.makedirs(replay)
    base = time.time()
    for i, (lo, hi) in enumerate(((20, 30), (30, 40))):
        pdf = (
            media.filter((F.col("media_id") >= lo) & (F.col("media_id") < hi))
            .toPandas()
            .sort_values("media_id")
        )
        fp = os.path.join(replay, f"b{i:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), fp)
        os.utime(fp, (base + i, base + i))
    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    media_ingest_sink(
        stream, e.catalog, "aseg", index, str(tmp_path / "ckpt"),
        fingerprint=audio_segment_fingerprints, hash_col="afp",
    ).awaitTermination()

    def cluster(i, s):
        return (i + 17 * s) % 20

    corpus = {cluster(i, s) for i in range(6) for s in range(2 + i % 2)}
    expected = []
    for lo, hi in ((20, 30), (30, 40)):
        segs = [
            (64 * i + s, cluster(i, s))
            for i in range(lo, hi)
            for s in range(2 + i % 2)
        ]
        first_uid = {}
        for uid, c in segs:
            first_uid.setdefault(c, uid)
        keep = [
            (uid, c)
            for uid, c in segs
            if c not in corpus and first_uid[c] == uid
        ]
        expected += [uid for uid, _ in keep]
        corpus |= {c for _, c in keep}

    got = sorted(
        r.media_id for r in e.sql("SELECT media_id FROM aseg").collect()
    )
    assert got == sorted(expected)
