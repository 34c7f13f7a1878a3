"""Distributed PCA / whitening over embedding columns
(operators/embeddings.py) vs a local numpy reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators import embeddings as E


def _anisotropic(n=400, seed=7):
    """3D data stretched along a known oblique axis."""
    rng = np.random.RandomState(seed)
    axis1 = np.array([3.0, 1.0, 0.5]) / np.linalg.norm([3.0, 1.0, 0.5])
    axis2 = np.array([-1.0, 3.0, 0.0]) / np.linalg.norm([-1.0, 3.0, 0.0])
    x = (
        rng.randn(n, 1) * 5.0 * axis1
        + rng.randn(n, 1) * 1.5 * axis2
        + rng.randn(n, 3) * 0.1
        + np.array([10.0, -4.0, 2.0])
    )
    return x


def _df(spark, x, parts=7):
    rows = [(i, row.tolist()) for i, row in enumerate(x)]
    return spark.createDataFrame(
        rows, "id long, emb array<double>"
    ).repartition(parts)


def test_pca_fit_matches_numpy_reference(spark):
    x = _anisotropic()
    model = E.pca_fit(_df(spark, x), "emb", k=3)
    assert model["n"] == len(x) and model["dim"] == 3
    # numpy reference on the same data
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    np.testing.assert_allclose(model["mean"], mean, rtol=1e-9)
    np.testing.assert_allclose(
        sorted(model["eigenvalues"], reverse=True),
        evals[order],
        rtol=1e-6,
    )
    # axes agree up to sign
    for i in range(3):
        got = np.array(model["components"][i])
        want = evecs[:, order[i]]
        assert abs(abs(got @ want) - 1.0) < 1e-6


def test_pca_top_axis_is_the_stretched_direction(spark):
    x = _anisotropic()
    model = E.pca_fit(_df(spark, x), "emb", k=1)
    axis1 = np.array([3.0, 1.0, 0.5]) / np.linalg.norm([3.0, 1.0, 0.5])
    assert abs(np.array(model["components"][0]) @ axis1) > 0.99
    # deterministic sign convention: largest-|entry| coordinate positive
    c = np.array(model["components"][0])
    assert c[int(np.argmax(np.abs(c)))] > 0


def test_pca_fit_partitioning_invariant(spark):
    x = _anisotropic(n=200)
    m1 = E.pca_fit(_df(spark, x, parts=1), "emb", k=2)
    m8 = E.pca_fit(_df(spark, x, parts=8), "emb", k=2)
    np.testing.assert_allclose(m1["mean"], m8["mean"], atol=1e-9)
    np.testing.assert_allclose(
        m1["components"], m8["components"], atol=1e-7
    )


def test_pca_transform_and_whitening(spark):
    x = _anisotropic()
    df = _df(spark, x)
    model = E.pca_fit(df, "emb", k=3)
    out = E.pca_transform(df, "emb", model, out_col="p", whiten=True)
    y = np.stack(
        [r.p for r in out.orderBy("id").collect()]
    )
    # whitened covariance ~ identity
    cov = np.cov(y, rowvar=False)
    np.testing.assert_allclose(cov, np.eye(3), atol=1e-2)
    # unwhitened projection preserves pairwise distances (rotation)
    out2 = E.pca_transform(df, "emb", model, out_col="p")
    y2 = np.stack([r.p for r in out2.orderBy("id").collect()])
    d_orig = np.linalg.norm(x[0] - x[1])
    d_proj = np.linalg.norm(y2[0] - y2[1])
    assert abs(d_orig - d_proj) / d_orig < 1e-9
    # schema keeps the input columns
    assert out.columns == ["id", "emb", "p"]


def test_pca_k_truncation_minimizes_reconstruction(spark):
    x = _anisotropic()
    df = _df(spark, x)
    model = E.pca_fit(df, "emb", k=2)
    y = np.stack(
        [r.p for r in E.pca_transform(df, "emb", model, "p")
         .orderBy("id").collect()]
    )
    w = np.array(model["components"])  # (2, 3)
    recon = y @ w + np.array(model["mean"])
    err_pca = ((x - recon) ** 2).sum()
    # dropping the smallest eigen-direction is optimal: error equals
    # (n-1) * smallest eigenvalue within rounding
    cov = np.cov(x, rowvar=False)
    lam_min = np.linalg.eigh(cov)[0][0]
    assert err_pca == pytest.approx((len(x) - 1) * lam_min, rel=1e-6)
    ev = E.pca_explained_variance(model)
    assert ev[0] > ev[1] > 0 and sum(ev) == pytest.approx(1.0)


def test_pca_refusals_and_nulls(spark):
    x = _anisotropic(n=50)
    df = _df(spark, x)
    with pytest.raises(ValueError, match="exceeds"):
        E.pca_fit(df, "emb", k=4)
    with pytest.raises(ValueError, match="k must be"):
        E.pca_fit(df, "emb", k=0)
    empty = spark.createDataFrame([], "id long, emb array<double>")
    with pytest.raises(ValueError, match="empty"):
        E.pca_fit(empty, "emb", k=1)
    # null embeddings are dropped at fit...
    with_null = df.unionByName(
        spark.createDataFrame([(999, None)], "id long, emb array<double>")
    )
    m = E.pca_fit(with_null, "emb", k=2)
    assert m["n"] == 50
    # ...and rejected loudly at transform
    with pytest.raises(Exception, match="NULL in emb"):
        E.pca_transform(with_null, "emb", m, "p").collect()


# -- feature hashing ------------------------------------------------------


def _py_htf(texts, dim, seed="htf-0", l2=False):
    import hashlib

    out = {}
    for i, txt in texts:
        v = [0.0] * dim
        for tok in txt.lower().split():
            h = int(hashlib.md5(f"{seed}|{tok}".encode()).hexdigest()[:15], 16)
            v[h % dim] += 1.0
        if l2:
            n = sum(x * x for x in v) ** 0.5
            if n > 0:
                v = [x / n for x in v]
        out[i] = v
    return out


def test_hashed_tf_matches_python_reference(spark):
    texts = [
        (1, "the quick brown fox the fox"),
        (2, "lorem ipsum"),
        (3, ""),           # zero vector
        (4, "THE Quick"),  # case-insensitive tokens
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: list(r.vector)
        for r in E.hashed_tf_vectors(df, "doc_id", "text", dim=16).collect()
    }
    assert got == _py_htf(texts, 16)
    assert got[3] == [0.0] * 16
    got = {
        r.doc_id: list(r.vector)
        for r in E.hashed_tf_vectors(
            df, "doc_id", "text", dim=16, l2=True
        ).collect()
    }
    want = _py_htf(texts, 16, l2=True)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # normalized vectors have unit norm (except the zero vector)
    for k, v in got.items():
        n = sum(x * x for x in v)
        assert n == pytest.approx(1.0, abs=1e-9) or n == 0.0


def test_hashed_tf_feeds_pca_and_similarity(spark):
    """Composition: text -> hashed vectors -> PCA projection — the
    model-free text-embedding pipeline end to end."""
    texts = [(i, f"w{i % 5} common w{i % 3}") for i in range(60)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    vecs = E.hashed_tf_vectors(df, "doc_id", "text", dim=32, l2=True)
    model = E.pca_fit(vecs, "vector", k=4)
    out = E.pca_transform(vecs, "vector", model, "p")
    assert out.count() == 60 and len(out.first().p) == 4
    with pytest.raises(ValueError, match="dim must be"):
        E.hashed_tf_vectors(df, "doc_id", "text", dim=0)
