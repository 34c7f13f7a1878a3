"""Audio spectral features (functions/multimodal.py FFT pipeline).

The exact dominant-bin contract is oracle-checked in the corpus
(ns_multimodal_audio_spectral); here: band-energy concentration bounds
(quantization noise keeps shares just below 1), degraded inputs, and
multi-window averaging.
"""

from pyspark.sql import functions as F

from fluss_datafusion_spark.functions import multimodal


def _feats(spark, ids):
    base = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    media = multimodal.synthesize_tone_media(base, id_col="doc_id")
    return {
        r["media_id"]: r
        for r in multimodal.audio_spectral_features(media, n_fft=64).collect()
    }


def test_dominant_bin_and_band_concentration(spark):
    rows = _feats(spark, list(range(1, 41)))
    for i, r in rows.items():
        k = 1 + i % 20
        assert r["decoded_ok"]
        assert r["dominant_bin"] == k
        assert r["dominant_hz"] == k * 125.0
        assert r["n_windows"] == 2 + i % 6
        # bin-aligned tone: >=99% of non-DC energy in the k band (the
        # remainder is int16 quantization noise)
        band = "band_low" if k <= 10 else "band_mid"
        assert r[band] >= 0.99, (i, k, r[band])
        assert abs(r["band_low"] + r["band_mid"] + r["band_high"] - 1.0) < 1e-3


def test_short_and_invalid_payloads(spark):
    media = spark.createDataFrame(
        [(1, b"not a wav"), (2, None)], "media_id long, payload binary"
    )
    out = {
        r["media_id"]: r
        for r in multimodal.audio_spectral_features(media).collect()
    }
    assert not out[1]["decoded_ok"] and out[1]["dominant_bin"] is None
    assert not out[2]["decoded_ok"]


def test_constant_amplitude_wav_has_no_dominant_tone_energy(spark):
    # The constant-amplitude fixture is pure DC: after dropping the DC
    # bin the spectrum is ~zero everywhere, so band shares exist but the
    # clip still decodes (distinguishing silence/DC from tonal content
    # is exactly what a pipeline uses these features for).
    base = spark.createDataFrame([(99,)], "doc_id long")  # id%100+1 = 100 frames
    media = multimodal.synthesize_wav_media(base, id_col="doc_id")
    row = multimodal.audio_spectral_features(media, n_fft=64).collect()[0]
    assert row["decoded_ok"]
    assert row["n_windows"] >= 1
