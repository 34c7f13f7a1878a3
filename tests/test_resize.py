"""Image resize kernel (functions/multimodal.resize_pixels r6) — the
decode -> resize -> featurize pipeline step, pure numpy, documented
conventions (nearest scale-floor; bilinear half-pixel edge-clamped)."""

import numpy as np
import pytest

from fluss_datafusion_spark.functions import multimodal as mm


def test_nearest_index_math():
    px = np.arange(4 * 6 * 1, dtype=np.uint8).reshape(4, 6, 1)
    out = mm.resize_pixels(px, 2, 3, method="nearest")
    # src rows floor(0*4/2)=0, floor(1*4/2)=2; cols 0, 2, 4
    want = px[[0, 2]][:, [0, 2, 4]]
    assert np.array_equal(out, want)
    # upscale repeats samples, never goes out of range
    up = mm.resize_pixels(px, 8, 12, method="nearest")
    assert up.shape == (8, 12, 1)
    assert set(np.unique(up)) <= set(np.unique(px))


def test_constant_image_is_fixed_point_both_methods():
    px = np.full((5, 7, 3), 123, dtype=np.uint8)
    for method in ("nearest", "bilinear"):
        out = mm.resize_pixels(px, 3, 2, method=method)
        assert out.shape == (3, 2, 3) and np.all(out == 123)


def test_bilinear_preserves_linear_ramp_interior():
    """Bilinear of a linear function is the linear function — interior
    samples of a ramp land exactly on the ramp (uint16 for headroom)."""
    h, w = 8, 8
    px = (np.arange(h)[:, None, None] * 100
          + np.arange(w)[None, :, None] * 10).astype(np.uint16)
    out = mm.resize_pixels(px, 4, 4, method="bilinear")
    fy = np.clip((np.arange(4) + 0.5) * 2 - 0.5, 0, h - 1)
    fx = np.clip((np.arange(4) + 0.5) * 2 - 0.5, 0, w - 1)
    want = np.rint(fy[:, None, None] * 100 + fx[None, :, None] * 10)
    assert np.array_equal(out.astype(float), want)


def test_resize_rejects_bad_args():
    px = np.zeros((2, 2, 1), dtype=np.uint8)
    with pytest.raises(ValueError, match="at least 1x1"):
        mm.resize_pixels(px, 0, 4)
    with pytest.raises(ValueError, match="unknown resize method"):
        mm.resize_pixels(px, 2, 2, method="lanczos")


def test_image_resize_stats_end_to_end(spark, testdata):
    """Full pipeline over synthesized PNGs (Adam7 included): resized
    means equal the sampled-row closed form."""
    from fluss_datafusion_spark.session import read_table

    docs = read_table(spark, f"{testdata}/documents.parquet").limit(60)
    media = mm.synthesize_png_media(docs, id_col="doc_id")
    rows = mm.image_resize_stats(media, 8, 8, method="nearest").collect()
    assert rows and all(r.decoded_ok for r in rows)
    for r in rows:
        h = (r.media_id * 7) % 16 + 1
        ys = [min(j * h // 8, h - 1) for j in range(8)]
        want = round(sum((31 * y + r.media_id) % 256 for y in ys) / 8, 4)
        assert r.mean_r == want, (r.media_id, r.mean_r, want)
        assert (r.out_width, r.out_height) == (8, 8)
    # undecodable payloads surface as decoded_ok = False
    bad = spark.createDataFrame(
        [(1, bytearray(b"not an image"))], "media_id long, payload binary"
    )
    r = mm.image_resize_stats(bad, 4, 4).collect()[0]
    assert not r.decoded_ok and r.mean_r is None


def test_video_thumbnail_stats(spark, testdata):
    """Frame-sample -> resize -> featurize over synthesized AVIs:
    flat-color frames make the resized means exact (constant image is a
    resize fixed point), and sampling takes every 2nd frame."""
    from fluss_datafusion_spark.session import read_table

    docs = read_table(spark, f"{testdata}/documents.parquet").limit(40)
    media = mm.synthesize_avi_media(docs, id_col="doc_id", n_frames=6)
    rows = mm.video_thumbnail_stats(media, 4, 4, every=2).collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
        assert (r.width, r.height) == (4, 4)
        f, i = r.frame_index, r.media_id
        assert (r.mean_r, r.mean_g, r.mean_b) == (
            (11 * i + 29 * f) % 256,
            (13 * i + 31 * f) % 256,
            (17 * i + 37 * f) % 256,
        )
    for frames in by_media.values():
        assert sorted(r.frame_index for r in frames) == [0, 2, 4]


def test_resample_pcm_kernel():
    """Audio resample kernel: nearest picks exact samples on integer
    ratios; linear preserves linear-in-time signals; constants are
    fixed points; stereo frames move together."""
    ramp = (np.arange(10)[:, None] * 100).astype(np.int16)
    # 2:1 downsample, nearest: positions 0,2,4,... -> even samples
    down = mm.resample_pcm(ramp, 16000, 8000, method="nearest")
    assert np.array_equal(down[:, 0], ramp[::2, 0])
    # 1:2 upsample, linear: midpoints of a ramp land exactly between
    up = mm.resample_pcm(ramp, 8000, 16000, method="linear")
    assert up.shape[0] == 20
    assert np.array_equal(up[0:4, 0], np.array([0, 50, 100, 150]))
    # constant fixed point at a non-integer ratio
    const = np.full((7, 2), -123, dtype=np.int16)
    out = mm.resample_pcm(const, 12000, 16000)
    assert out.shape == (9, 2) and np.all(out == -123)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown resample method"):
        mm.resample_pcm(const, 1, 1, method="sinc")
    with _pytest.raises(ValueError, match="positive"):
        mm.resample_pcm(const, 0, 1)


def test_wav_resample_stats_end_to_end(spark, testdata):
    from fluss_datafusion_spark.session import read_table

    docs = read_table(spark, f"{testdata}/documents.parquet").limit(50)
    media = mm.synthesize_wav_media(docs, id_col="doc_id")
    rows = mm.wav_resample_stats(media, 16000).collect()
    assert rows and all(r.decoded_ok for r in rows)
    for r in rows:
        i = r.media_id
        rate = 8000 + (i % 4) * 4000
        n = i % 100 + 1
        amp = i % 2000 - 1000
        assert r.rate_in == rate and r.frames_in == n
        assert r.frames_out == max(1, round(n * 16000 / rate))
        assert r.mean_amp == float(amp) and r.rms == float(abs(amp))


def test_scene_cuts_closed_form(spark):
    from fluss_datafusion_spark.functions.multimodal import (
        avi_scene_cuts,
        synthesize_scene_avi_media,
    )
    from pyspark.sql import functions as F

    ids = spark.range(24).select(F.col("id").alias("doc_id"))
    media = synthesize_scene_avi_media(ids)
    rows = avi_scene_cuts(media, threshold=10.0).collect()
    assert len(rows) == 24  # exactly one cut per video
    for r in rows:
        assert r.cut_frame == r.media_id % 3 + 3
        assert r.diff == 40.0
        assert r.n_frames == 8


def test_scene_cuts_threshold_and_no_cuts(spark):
    from fluss_datafusion_spark.functions.multimodal import (
        avi_scene_cuts,
        synthesize_scene_avi_media,
    )
    from pyspark.sql import functions as F

    ids = spark.range(6).select(F.col("id").alias("doc_id"))
    media = synthesize_scene_avi_media(ids)
    # threshold above the jump: no boundaries at all
    assert avi_scene_cuts(media, threshold=50.0).count() == 0
