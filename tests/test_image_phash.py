"""Perceptual image hashing (functions/multimodal.image_dhash_stats)
and banded Hamming near-dup pairs (operators/dedup.hamming_near_dup_
pairs): kernel vs a pure-Python reference, the one-bit perturbation
guarantee of the gradient fixture, and the pigeonhole recall bound."""

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.functions.multimodal import (
    _pack_bits_64,
    image_dhash_stats,
    synthesize_gradient_bmp_media,
)
from fluss_datafusion_spark.operators.dedup import hamming_near_dup_pairs


def _ref_gray(i, size=16, cluster_mod=50, perturb_at=100):
    c = i % cluster_mod
    g = [[(5 * x * x * (c + 1) + y * (7 + 3 * c) + 13 * x) % 251
          for x in range(size)] for y in range(size)]
    if i >= perturb_at:
        g[0][0] = 255
    return g


def _ref_dhash(i, size=16, hash_size=8):
    g = _ref_gray(i, size)
    ys = [min(r * size // hash_size, size - 1) for r in range(hash_size)]
    xs = [min(c * size // (hash_size + 1), size - 1) for c in range(hash_size + 1)]
    bits = []
    for y in ys:
        for j in range(hash_size):
            bits.append(1 if g[y][xs[j]] < g[y][xs[j + 1]] else 0)
    val = 0
    for b in bits:
        val = (val << 1) | b
    return val - (1 << 64) if val >= (1 << 63) else val


def _ids_df(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_dhash_matches_pure_python_reference(spark):
    media = synthesize_gradient_bmp_media(_ids_df(spark, 20))
    got = {r.media_id: r.dhash for r in image_dhash_stats(media).collect()}
    for i in range(20):
        assert got[i] == _ref_dhash(i), f"id {i}"


def test_fixture_one_bit_perturbation(spark):
    # same cluster: unperturbed vs perturbed differ in EXACTLY one bit
    media = synthesize_gradient_bmp_media(
        _ids_df(spark, 120), cluster_mod=50, perturb_at=100
    )
    rows = {r.media_id: r for r in image_dhash_stats(media).collect()}
    assert all(r.decoded_ok for r in rows.values())
    for c in range(20):
        base, pert = rows[c].dhash, rows[c + 100].dhash
        assert bin((base ^ pert) & ((1 << 64) - 1)).count("1") == 1
        # identical copies hash identically
        assert rows[c].dhash == rows[c + 50].dhash


def test_cross_cluster_hamming_exceeds_threshold(spark):
    # the corpus entry's closed-form oracle assumes clusters never
    # collide within the verify threshold — pin it for the fixture dims
    hashes = [_ref_dhash(i) for i in range(50)]
    m = (1 << 64) - 1
    min_ham = min(
        bin((hashes[a] ^ hashes[b]) & m).count("1")
        for a in range(50)
        for b in range(a + 1, 50)
    )
    assert min_ham > 2, min_ham


def test_hamming_pairs_end_to_end(spark):
    media = synthesize_gradient_bmp_media(
        _ids_df(spark, 40), cluster_mod=10, perturb_at=20
    )
    hashes = image_dhash_stats(media)
    pairs = hamming_near_dup_pairs(
        hashes, "media_id", "dhash", max_hamming=2
    ).collect()
    got = {(r.id_a, r.id_b): r.ham for r in pairs}
    want = {}
    for a in range(40):
        for b in range(a + 1, 40):
            if a % 10 == b % 10:
                want[(a, b)] = 0 if (a < 20) == (b < 20) else 1
    assert got == want


def test_pigeonhole_recall_guarantee(spark):
    # any pair within hamming 3 of a 4-band split MUST surface: plant
    # hashes at controlled distances, no image pipeline involved
    base = 0x0123456789ABCDEF
    rows = [
        (0, base),
        (1, base ^ 0b111),             # ham 3: found (distinct bits in one band)
        (2, base ^ (1 << 5) ^ (1 << 21) ^ (1 << 42)),  # ham 3 spread: found
        (3, base ^ (1 << 0) ^ (1 << 17) ^ (1 << 33) ^ (1 << 50)),  # ham 4
    ]
    df = spark.createDataFrame(rows, "id long, h long")
    got = {
        (r.id_a, r.id_b): r.ham
        for r in hamming_near_dup_pairs(df, "id", "h", max_hamming=3).collect()
    }
    assert got[(0, 1)] == 3
    assert got[(0, 2)] == 3
    assert (0, 3) not in got  # ham 4, every band differs -> no bucket
    # negative hash values (bit 63 set) band correctly
    neg = spark.createDataFrame(
        [(0, -1), (1, -2)], "id long, h long"  # ...1111 vs ...1110
    )
    out = hamming_near_dup_pairs(neg, "id", "h", max_hamming=1).collect()
    assert [(r.id_a, r.id_b, r.ham) for r in out] == [(0, 1, 1)]


def test_pack_bits_64_msb_first():
    import numpy as np

    bits = np.zeros(64, dtype=np.uint8)
    bits[0] = 1  # MSB -> sign bit
    assert _pack_bits_64(bits) == -(1 << 63)
    bits = np.zeros(64, dtype=np.uint8)
    bits[63] = 1
    assert _pack_bits_64(bits) == 1


# -- incremental hamming index -------------------------------------------------


def test_incremental_hamming_index_lifecycle(spark, tmp_path):
    from pyspark.sql import functions as F

    from fluss_datafusion_spark.operators.incremental import (
        append_to_hamming_index,
        incremental_hamming_pairs,
        write_hamming_index,
    )

    path = str(tmp_path / "himg")
    # clusters of 4 via id % 5 over ids 0..19 (cluster_mod=5,
    # perturb_at=10: ids 10..19 one dHash bit off their cluster base)
    media = synthesize_gradient_bmp_media(
        _ids_df(spark, 20), cluster_mod=5, perturb_at=10
    )
    hashes = image_dhash_stats(media).select("media_id", "dhash")
    corpus = hashes.filter(F.col("media_id") < 10)       # ids 0..9
    batch = hashes.filter(F.col("media_id") >= 10)       # ids 10..19
    write_hamming_index(corpus, "media_id", "dhash", path)
    got = {
        (r.id_a, r.id_b): (r.ham, r.a_new, r.b_new)
        for r in incremental_hamming_pairs(
            batch, path, "media_id", "dhash", max_hamming=2,
            keep_markers=True,
        ).collect()
    }
    want = {}
    for a in range(20):
        for b in range(a + 1, 20):
            if a % 5 == b % 5 and (a >= 10 or b >= 10):
                ham = 0 if (a < 10) == (b < 10) else 1
                want[(a, b)] = (ham, a >= 10, b >= 10)
    assert got == want  # index-internal pairs never re-emitted

    # append == rebuild: after absorbing the batch, a second batch of
    # fresh perturbed copies pairs against BOTH generations
    append_to_hamming_index(batch, "media_id", "dhash", path)
    media2 = synthesize_gradient_bmp_media(
        spark.range(20, 25).select(F.col("id").alias("doc_id")),
        cluster_mod=5,
        perturb_at=0,  # all perturbed, like ids 10..19
    )
    batch2 = image_dhash_stats(media2).select("media_id", "dhash")
    got2 = {
        (r.id_a, r.id_b): r.ham
        for r in incremental_hamming_pairs(
            batch2, path, "media_id", "dhash", max_hamming=2
        ).collect()
    }
    want2 = {}
    for b2 in range(20, 25):
        for old in range(20):
            if old % 5 == b2 % 5:
                lo, hi = min(old, b2), max(old, b2)
                want2[(lo, hi)] = 0 if old >= 10 else 1
    assert got2 == want2


def test_key_blocks_wide_keys_same_pairs(spark):
    """key_blocks=2 (32-bit Manku block-combination keys — the
    past-2^16-fingerprints regime) finds EXACTLY the pairs the narrow
    default finds at max_hamming <= n_bands - 2."""
    media = synthesize_gradient_bmp_media(_ids_df(spark, 150))
    hashes = image_dhash_stats(media).select("media_id", "dhash")
    narrow = {
        (r.id_a, r.id_b, r.ham)
        for r in hamming_near_dup_pairs(
            hashes, "media_id", "dhash", max_hamming=2
        ).collect()
    }
    wide = {
        (r.id_a, r.id_b, r.ham)
        for r in hamming_near_dup_pairs(
            hashes, "media_id", "dhash", max_hamming=2, key_blocks=2
        ).collect()
    }
    assert wide == narrow and len(narrow) > 0


def test_key_blocks_recall_exact_on_planted_pairs(spark):
    """Pigeonhole: every planted pair at distance <= 2 is found with
    key_blocks=2 over otherwise-random 64-bit hashes."""
    import hashlib

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    rows = []
    for i in range(300):
        h_u = int.from_bytes(
            hashlib.md5(f"base{i}".encode()).digest()[:8], "big"
        )
        rows.append((2 * i, signed(h_u)))
        flip = (1 << (i % 64)) | (1 << ((i * 7 + 3) % 64))
        mate_u = h_u ^ (flip if i % 3 else (1 << (i % 64)))  # ham 1 or 2
        rows.append((2 * i + 1, signed(mate_u)))
    df = spark.createDataFrame(rows, "media_id long, h long")
    got = {
        (r.id_a, r.id_b)
        for r in hamming_near_dup_pairs(
            df, "media_id", "h", max_hamming=2, key_blocks=2
        ).collect()
    }
    want = {(2 * i, 2 * i + 1) for i in range(300)}
    assert want <= got  # exact recall on planted pairs


def test_key_blocks_validation(spark):
    media = synthesize_gradient_bmp_media(_ids_df(spark, 5))
    hashes = image_dhash_stats(media).select("media_id", "dhash")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="key_blocks"):
        hamming_near_dup_pairs(
            hashes, "media_id", "dhash", key_blocks=4
        ).collect()


def test_incremental_probe_refuses_key_mismatch(spark, tmp_path):
    """A kb=2 probe against a kb=1 index must REFUSE (silent
    false-negatives otherwise — the INDEX_FORMAT-v2 lesson)."""
    import pytest as _pytest

    from fluss_datafusion_spark.operators.incremental import (
        incremental_hamming_pairs,
        write_hamming_index,
    )

    media = synthesize_gradient_bmp_media(_ids_df(spark, 60), cluster_mod=10)
    hashes = image_dhash_stats(media).select("media_id", "dhash")
    root = str(tmp_path / "idx")
    write_hamming_index(
        hashes.filter(F.col("media_id") < 10), "media_id", "dhash", root
    )
    with _pytest.raises(ValueError, match="rebuild the index"):
        incremental_hamming_pairs(
            hashes.filter(F.col("media_id") >= 10),
            root, "media_id", "dhash", key_blocks=2,
        )
    # matching kb=2 build + probe agrees with the kb=1 path
    wide_root = str(tmp_path / "idx2")
    write_hamming_index(
        hashes.filter(F.col("media_id") < 10),
        "media_id", "dhash", wide_root, key_blocks=2,
    )
    wide = {
        (r.id_a, r.id_b)
        for r in incremental_hamming_pairs(
            hashes.filter(F.col("media_id") >= 10),
            wide_root, "media_id", "dhash", key_blocks=2,
        ).collect()
    }
    narrow = {
        (r.id_a, r.id_b)
        for r in incremental_hamming_pairs(
            hashes.filter(F.col("media_id") >= 10),
            root, "media_id", "dhash",
        ).collect()
    }
    assert wide == narrow and len(wide) > 0
