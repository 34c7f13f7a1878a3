"""Binary embedding quantization (operators/embeddings.binarize_sign)
and Hamming-shortlist ANN (operators/similarity.binary_ann_topk):
bit-exact packing vs pure Python, partial-word dims, and the
full-shortlist == exact-brute-force equivalence."""

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.embeddings import binarize_sign
from fluss_datafusion_spark.operators.similarity import (
    binary_ann_topk,
    cosine_topk,
)
from fluss_datafusion_spark.session import read_table

SF_DIR = "/root/testdata/sf0.001"


def _py_pack(vec):
    words = []
    for lo in range(0, len(vec), 64):
        w = 0
        for x in vec[lo : lo + 64]:
            w = (w << 1) | (1 if x > 0 else 0)
        words.append(w - (1 << 64) if w >= (1 << 63) else w)
    return words


def test_binarize_matches_pure_python_dim64(spark):
    emb = read_table(spark, f"{SF_DIR}/embeddings.parquet").limit(20)
    rows = emb.collect()
    got = {
        r.vec_id: r.bcode
        for r in binarize_sign(emb, "embedding").collect()
    }
    for r in rows:
        assert got[r.vec_id] == _py_pack(list(r.embedding)), r.vec_id


def test_binarize_partial_last_word(spark):
    # dim = 150 -> 3 words, last holds 22 bits in the LOW positions
    vecs = [
        (0, [((i * 37 + 11) % 7) - 3.0 for i in range(150)]),
        (1, [((i * 13 + 5) % 5) - 2.0 for i in range(150)]),
        (2, [0.0] * 150),  # x > 0 false everywhere -> all-zero words
    ]
    df = spark.createDataFrame(vecs, ["vid", "v"])
    got = {r.vid: r.bcode for r in binarize_sign(df, "v").collect()}
    for vid, v in vecs:
        want = _py_pack(v)
        assert len(want) == 3 and got[vid] == want, vid
    assert got[2] == [0, 0, 0]


def test_binarize_empty_raises(spark):
    df = spark.createDataFrame([], "vid long, v array<float>")
    with pytest.raises(ValueError, match="empty"):
        binarize_sign(df, "v")


def test_full_shortlist_equals_exact_bruteforce(spark):
    """With rerank*k >= corpus size the shortlist is the whole corpus,
    so the re-ranked top-k must equal exact cosine_topk bit for bit —
    the 'exact on the shortlist' contract."""
    emb = read_table(spark, f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 3)
    k = 5
    exact = {
        (r.vec_id, r.rank): (r.neighbor_id, round(r.cos, 9))
        for r in cosine_topk(
            emb, q, "vec_id", "embedding", "vec_id", "embedding", k=k
        ).collect()
    }
    binary = {
        (r.vec_id, r.rank): (r.neighbor_id, round(r.cos, 9))
        for r in binary_ann_topk(
            emb, q, "vec_id", "embedding", "vec_id", "embedding",
            k=k, rerank=(n // k) + 1,
        ).collect()
    }
    assert binary == exact


def test_binary_ann_ham_is_exact_popcount(spark):
    emb = read_table(spark, f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 2)
    res = binary_ann_topk(
        emb, q, "vec_id", "embedding", "vec_id", "embedding", k=3, rerank=2
    ).collect()
    codes = {
        r.vec_id: r.bcode[0]
        for r in binarize_sign(emb, "embedding").collect()
    }
    mask = (1 << 64) - 1
    for r in res:
        want = bin((codes[r.vec_id] ^ codes[r.neighbor_id]) & mask).count("1")
        assert r.ham == want


def test_precomputed_code_column_agrees(spark):
    emb = read_table(spark, f"{SF_DIR}/embeddings.parquet")
    coded = binarize_sign(emb, "embedding", out_col="code64")
    q = emb.filter(F.col("vec_id") < 2)
    on_the_fly = binary_ann_topk(
        emb, q, "vec_id", "embedding", "vec_id", "embedding", k=4, rerank=3
    ).collect()
    persisted = binary_ann_topk(
        coded, q, "vec_id", "embedding", "vec_id", "embedding",
        k=4, rerank=3, corpus_code="code64",
    ).collect()
    key = lambda r: (r.vec_id, r.rank, r.neighbor_id, r.ham)
    assert sorted(map(key, on_the_fly)) == sorted(map(key, persisted))
