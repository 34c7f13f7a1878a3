"""IVF-PQ (operators/similarity.py — train_pq_codebooks /
pq_encode_udf / pq_ann_topk): codebook determinism, encode/ADC
round-trip quality, and recall floors on clustered vectors."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators import similarity


def _clustered_vecs(n, dim=32, n_clusters=8):
    """Deterministic clustered fixture: unit-ish base + a +2.0 block
    per cluster — well-separated, like the corpus IVF fixture."""
    rows = []
    for i in range(n):
        c = i % n_clusters
        base = [((i * 37 + j * 11) % 19 - 9) / 19.0 for j in range(dim)]
        for j in range(4 * c, 4 * c + 4):
            base[j] += 2.0
        rows.append((i, base))
    return rows


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        _clustered_vecs(160), "vec_id long, embedding array<double>"
    )


def test_codebooks_deterministic_and_shaped(vec_df):
    b1 = similarity.train_pq_codebooks(vec_df, "embedding", "vec_id", m=4, ks=8)
    b2 = similarity.train_pq_codebooks(vec_df, "embedding", "vec_id", m=4, ks=8)
    assert b1.shape == (4, 8, 8)
    assert np.array_equal(b1, b2)


def test_dim_not_divisible_raises(vec_df):
    with pytest.raises(ValueError, match="not divisible"):
        similarity.train_pq_codebooks(vec_df, "embedding", "vec_id", m=5)


def test_encode_reconstruction_beats_random(vec_df, spark):
    books = similarity.train_pq_codebooks(vec_df, "embedding", "vec_id", m=4, ks=16)
    enc = similarity.pq_encode_udf(books)
    rows = vec_df.select("vec_id", "embedding", enc("embedding").alias("code")).collect()
    m, ks, dsub = books.shape
    errs = []
    for r in rows:
        v = np.asarray(r.embedding)
        v = v / np.linalg.norm(v)
        rec = np.concatenate([books[s][r.code[s]] for s in range(m)])
        errs.append(np.linalg.norm(v - rec))
    # mean quantization error well under the unit norm: the codebooks
    # learned the cluster structure (a random codebook sits near 1.0)
    assert np.mean(errs) < 0.5, np.mean(errs)


def test_adc_approximates_cosine(vec_df, spark):
    books = similarity.train_pq_codebooks(vec_df, "embedding", "vec_id", m=4, ks=16)
    enc = similarity.pq_encode_udf(books)
    adc = similarity._pq_adc_udf(books)
    df = vec_df.select(
        "vec_id", "embedding", enc("embedding").alias("code")
    ).withColumn("approx", adc(F.col("embedding"), F.col("code")))
    for r in df.collect():
        # ADC of a vector against its own code ~ ||v||=1 within the
        # quantization error
        assert abs(r.approx - 1.0) < 0.35, (r.vec_id, r.approx)


def test_pq_ann_topk_recall(vec_df, spark):
    queries = vec_df.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(
        vec_df, queries, "vec_id", "embedding", "vec_id", "embedding", k=10
    )
    approx = similarity.pq_ann_topk(
        vec_df, queries, "vec_id", "embedding", "vec_id", "embedding",
        k=10, n_centroids=8, n_probe=2, m=4, ks=16,
    )
    ex = {}
    for r in exact.collect():
        ex.setdefault(r.vec_id, set()).add(r.neighbor_id)
    ap = {}
    for r in approx.collect():
        ap.setdefault(r.vec_id, set()).add(r.neighbor_id)
        assert 1 <= r.rank <= 10
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert min(recalls) >= 0.9, recalls
    assert sum(recalls) / len(recalls) >= 0.95, recalls


def test_pq_shortlist_cosine_is_exact(vec_df, spark):
    # the returned cos must be the EXACT cosine (re-ranked), not ADC
    queries = vec_df.filter(F.col("vec_id") == 0)
    approx = similarity.pq_ann_topk(
        vec_df, queries, "vec_id", "embedding", "vec_id", "embedding",
        k=5, n_centroids=8, n_probe=8, m=4, ks=16,
    ).collect()
    by_id = {r.vec_id: r for r in vec_df.collect()}

    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for r in approx:
        want = cos(by_id[0].embedding, by_id[r.neighbor_id].embedding)
        assert abs(r.cos - want) < 1e-9
