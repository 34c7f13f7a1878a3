"""Scene-level video fingerprints + streaming scene-cut ingest
(functions/multimodal.video_scene_fingerprints,
operators/incremental.media_ingest_sink with the scene hook): the
clip-reuse dedup path — per-scene majority-vote dHash, packed scene
uids riding the generic banded-Hamming machinery unchanged."""

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.functions.multimodal import (
    image_dhash_stats,
    synthesize_gradient_bmp_media,
    synthesize_multiscene_avi_media,
    video_scene_fingerprints,
)
from fluss_datafusion_spark.operators.incremental import (
    media_ingest_sink,
    write_hamming_index,
)


def _videos(spark, lo, hi):
    return synthesize_multiscene_avi_media(
        spark.range(lo, hi).select(F.col("id").alias("doc_id"))
    )


def _cluster(i, s, shift=17, mod=50):
    return (i + shift * s) % mod


def _n_scenes(i):
    return 2 + i % 2


def test_fixture_separation_pinned():
    """The gradient-cluster pattern keeps distinct clusters FAR apart
    on both axes the pipeline depends on: >= 15 dHash bits (dedup at
    max_hamming=2 can never cross clusters) and mean |delta| >= 68
    gray levels (the scene-cut rule at threshold=10 always fires at a
    cluster change, never within a scene)."""

    def pat(c, size=16):
        g = np.zeros((size, size), dtype=np.int64)
        for y in range(size):
            for x in range(size):
                g[y, x] = (5 * x * x * (c + 1) + y * (7 + 3 * c) + 13 * x) % 251
        return g

    def dhash(g):
        ys = np.minimum(np.arange(8) * 16 // 8, 15)
        xs = np.minimum(np.arange(9) * 16 // 9, 15)
        d = g[ys][:, xs]
        return (d[:, :-1] < d[:, 1:]).ravel()

    pats = [pat(c) for c in range(50)]
    hams = [dhash(g) for g in pats]
    min_ham = min(
        int((hams[a] != hams[b]).sum())
        for a in range(50)
        for b in range(a + 1, 50)
    )
    min_diff = min(
        float(np.abs(pats[a].astype(float) - pats[b].astype(float)).mean())
        for a in range(50)
        for b in range(a + 1, 50)
    )
    assert min_ham == 15
    assert min_diff > 60.0


def test_scene_boundaries_uids_and_fp_parity(spark):
    """Scene structure is exactly the fixture's closed form — video i
    has 2 + i%2 scenes of 3 frames starting at 3s, uid = 64i + s — and
    each scene's fingerprint equals the STILL-IMAGE dHash of its
    cluster's gradient BMP (identical frames make the majority vote an
    identity), i.e. the bit formula the DuckDB oracles replay."""
    fps = video_scene_fingerprints(_videos(spark, 0, 20)).toPandas()
    assert bool(fps["decoded_ok"].all())
    rows = {
        (int(r.video_id), int(r.scene_idx)): r for r in fps.itertuples()
    }
    assert len(rows) == sum(_n_scenes(i) for i in range(20))
    for i in range(20):
        for s in range(_n_scenes(i)):
            r = rows[(i, s)]
            assert r.media_id == 64 * i + s
            assert r.start_frame == 3 * s
            assert r.n_frames == 3
    # fp parity with the still-image kernel, cluster by cluster
    clusters = sorted({_cluster(i, s) for i in range(20)
                       for s in range(_n_scenes(i))})
    bmp = synthesize_gradient_bmp_media(
        spark.createDataFrame([(c,) for c in clusters], ["doc_id"]),
        cluster_mod=50,
        perturb_at=10**9,
    )
    still = {
        int(r.media_id): int(r.dhash)
        for r in image_dhash_stats(bmp).select("media_id", "dhash").collect()
    }
    for i in range(20):
        for s in range(_n_scenes(i)):
            assert rows[(i, s)].sfp == still[_cluster(i, s)]


def test_scene_fp_undecodable_and_cap(spark):
    """Junk payloads and over-long videos yield one decoded_ok=false
    row each (quarantined downstream, never indexed)."""
    good = _videos(spark, 0, 2)
    junk = spark.createDataFrame(
        [(100, bytearray(b"not an avi"))], "media_id long, payload binary"
    )
    fps = video_scene_fingerprints(good.unionByName(junk)).toPandas()
    bad = fps[~fps["decoded_ok"]]
    assert list(bad["media_id"]) == [6400]
    assert bad["sfp"].isna().all()
    capped = video_scene_fingerprints(good, max_scenes=1).toPandas()
    # every fixture video has >= 2 scenes -> all rows quarantined
    assert (~capped["decoded_ok"]).all()


def test_scene_ingest_sink_e2e(spark, tmp_path):
    """The streaming scene-cut ingest composition: videos arrive as
    two micro-batches, each video is decoded ONCE into per-scene
    fingerprints, scenes dedup against the persisted Hamming index
    (corpus-clip-wins; batch-internal pairs drop the greater uid), and
    surviving SCENE records upsert into a PK engine table keyed by the
    packed uid.  Expected survivors are replayed in pure Python from
    the fixture's id arithmetic."""
    media = _videos(spark, 0, 60)
    index = str(tmp_path / "idx")
    scene_fps = video_scene_fingerprints(media).filter("decoded_ok")
    write_hamming_index(
        scene_fps.filter(F.col("video_id") < 10), "media_id", "sfp", index
    )
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE scene_tbl (media_id BIGINT NOT NULL, video_id BIGINT,"
        " scene_idx INT, start_frame INT, n_frames INT, sfp BIGINT,"
        " PRIMARY KEY (media_id))"
    )
    replay = str(tmp_path / "replay")
    os.makedirs(replay)
    base = time.time()
    for i, (lo, hi) in enumerate(((30, 45), (45, 60))):
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
    metrics = []
    media_ingest_sink(
        stream,
        e.catalog,
        "scene_tbl",
        index,
        str(tmp_path / "ckpt"),
        fingerprint=video_scene_fingerprints,
        hash_col="sfp",
        metrics=metrics,
    ).awaitTermination()

    # pure-Python replay of the drop rule
    corpus = {_cluster(i, s) for i in range(10) for s in range(_n_scenes(i))}
    expected = []
    for lo, hi in ((30, 45), (45, 60)):
        scenes = [
            (64 * i + s, _cluster(i, s))
            for i in range(lo, hi)
            for s in range(_n_scenes(i))
        ]
        first_uid = {}
        for uid, c in scenes:
            first_uid.setdefault(c, uid)
        keep = [
            (uid, c)
            for uid, c in scenes
            if c not in corpus and first_uid[c] == uid
        ]
        expected += [uid for uid, _ in keep]
        corpus |= {c for _, c in keep}

    got = sorted(
        r.media_id for r in e.sql("SELECT media_id FROM scene_tbl").collect()
    )
    assert got == sorted(expected)
    # per-scene columns round-tripped for a survivor
    uid = got[0]
    row = e.sql(
        f"SELECT * FROM scene_tbl WHERE media_id = {uid}"
    ).collect()[0]
    assert row.video_id == uid // 64 and row.scene_idx == uid % 64
    assert row.start_frame == 3 * (uid % 64) and row.n_frames == 3
    # metrics: n_in counts VIDEOS (sink rows in), drops at scene grain
    assert [m["batch_id"] for m in metrics] == [0, 1]
