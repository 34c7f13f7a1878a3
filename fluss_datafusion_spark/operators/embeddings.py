"""Distributed PCA / whitening for embedding columns.

Training-data pipelines routinely post-process embedding columns before
dedup / clustering / retrieval: mean-centering and PCA-whitening are
the standard preprocessing for SemDeDup-style semantic dedup and for
ANN indexes (whitened space makes cosine/L2 behave isotropically; see
Jégou & Chum, ECCV 2012 — "Negative evidences and co-occurrences in
image retrieval: the benefit of PCA and whitening").

Scale shape (the only one that survives 100 TB):

    fit      = one Arrow-batched pass computing per-batch moment
               partials (count, Σx, Σxᵀx — d and d² numbers per batch),
               reduced IN SPARK by element-wise sums (one explode over
               d² indices + one map-side-combined agg), so the driver
               receives exactly 1 + d + d² scalars regardless of corpus
               size; the d×d eigendecomposition runs on the driver
               (d is the embedding width — 64..4096 — never corpus-sized)
    transform = one shuffle-free Arrow-batched matmul per partition

The model is plain Python lists (mean, components, eigenvalues) — tiny,
serializable, broadcast implicitly with the closure.

Determinism: eigenvector signs are fixed (largest-|component| entry
made positive), so repeated fits on identical data agree; across
partitionings the partial sums commute up to float rounding, which the
verification-boolean oracle pattern (q45) absorbs with margins.

No reference analog (zuston/fluss-datafusion has no vector operators);
part of the north-star LLM-pipeline surface.
"""

from __future__ import annotations

from typing import Dict, Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(
    df: DataFrame, vec_col: str, k: int, center: bool = True
) -> Dict:
    """Fit a k-component PCA on an ``array<float/double>`` column.

    Returns {"mean": [d], "components": [k][d] (rows = principal axes,
    variance-descending), "eigenvalues": [k], "n": int, "dim": int}.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).ravel().tolist()],
                }
            )

    partials = (
        df.select(vec_col)
        .na.drop()  # null embeddings contribute no moments
        .mapInPandas(_partials, "n long, s array<double>, ss array<double>")
    )
    # element-wise reduction stays in Spark (one explode + one
    # map-side-combined agg): the driver sees 1 + d + d² scalars, never
    # one row per batch (batches grow with the corpus).  n rides at
    # index 0 so fit is ONE pass + one collect.
    reduced = (
        partials.select(
            F.posexplode(
                F.concat(
                    F.array(F.col("n").cast("double")),
                    F.col("s"),
                    F.col("ss"),
                )
            ).alias("idx", "val")
        )
        .groupBy("idx")
        .agg(F.sum("val").alias("val"))
    )
    flat = {r["idx"]: r["val"] for r in reduced.collect()}
    if not flat:
        raise ValueError("pca_fit on an empty / all-null vector column")
    n_total = int(flat[0])
    d2 = len(flat) - 1
    # d + d*d = d2  =>  d = (-1 + sqrt(1 + 4*d2)) / 2
    dim = int((-1 + (1 + 4 * d2) ** 0.5) / 2)
    if dim * (dim + 1) != d2:
        raise ValueError(f"inconsistent vector widths in {vec_col}")
    if k > dim:
        raise ValueError(f"k={k} exceeds embedding dim {dim}")
    s = np.array([flat[1 + i] for i in range(dim)])
    ss = np.array(
        [flat[1 + dim + i] for i in range(dim * dim)]
    ).reshape(dim, dim)
    mean = s / n_total if center else np.zeros(dim)
    denom = max(n_total - 1, 1)
    cov = (ss - np.outer(mean, mean) * n_total) / denom
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T  # (k, d)
    eigvals = np.maximum(eigvals[order], 0.0)
    # deterministic sign: the largest-|entry| coordinate is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "eigenvalues": eigvals.tolist(),
        "n": int(n_total),
        "dim": dim,
    }


def pca_transform(
    df: DataFrame,
    vec_col: str,
    model: Dict,
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project vectors onto the fitted components — one shuffle-free
    Arrow-batched matmul.  ``whiten=True`` scales each projected
    coordinate by 1/sqrt(eigenvalue + eps) so the output has identity
    covariance on the fitted data (PCA-whitening)."""
    mean = np.array(model["mean"], dtype=np.float64)
    comps = np.array(model["components"], dtype=np.float64)
    scale = (
        1.0 / np.sqrt(np.array(model["eigenvalues"]) + eps)
        if whiten
        else np.ones(comps.shape[0])
    )
    w = (comps * scale[:, None]).T  # (d, k)
    in_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def _project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if pdf[vec_col].isna().any():
                raise ValueError(
                    f"pca_transform: NULL in {vec_col} — filter nulls first"
                )
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            out = (x - mean) @ w
            pdf = pdf.copy()
            pdf[out_col] = list(out)
            yield pdf

    return df.mapInPandas(_project, f"{in_fields}, {out_col} array<double>")


def pca_explained_variance(model: Dict) -> List[float]:
    """Fraction of (top-k-captured) variance per component — the usual
    scree diagnostic; sums to <= 1 relative to total variance only when
    k == dim, so this normalizes within the captured spectrum."""
    ev = np.array(model["eigenvalues"], dtype=np.float64)
    total = ev.sum()
    if total <= 0:
        return [0.0] * len(ev)
    return (ev / total).tolist()


def hashed_tf_vectors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
    l2: bool = False,
    seed: str = "htf-0",
) -> DataFrame:
    """Feature hashing ("the hashing trick", Weinberger et al., ICML
    2009): texts become fixed-width term-frequency vectors by hashing
    each token into one of ``dim`` buckets — the model-free featurizer
    that feeds this module's PCA/whitening, the similarity operators,
    and embedding dedup when no learned embeddings exist.

    Returns (id, vector array<double>) with vector[i] = count of tokens
    hashing to bucket i (L2-normalized when ``l2``); documents with no
    tokens get the zero vector.  Hash = md5(seed|token) 60-bit prefix
    mod dim — deterministic and externally replayable.

    Plan: one explode + one (doc, bucket) map-side-combined count + one
    per-doc assembly agg; the dense vector is built with JVM map/array
    expressions, no UDF.
    """
    from pyspark.sql import functions as F

    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    from fluss_datafusion_spark.functions.text import tokens as _tokens

    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(seed), F.col("__tok__"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
        F.lit(dim),
    )
    counts = (
        df.select(
            F.col(id_col).alias("__doc__"),
            F.explode(_tokens(F.lower(F.col(text_col)))).alias("__tok__"),
        )
        .filter(F.col("__tok__") != "")
        .withColumn("__idx__", bucket)
        .groupBy("__doc__", "__idx__")
        .agg(F.count(F.lit(1)).alias("__cnt__"))
    )
    assembled = counts.groupBy("__doc__").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__idx__"), F.col("__cnt__")))
        ).alias("__m__")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m__"), i.cast("long")), F.lit(0)
        ).cast("double"),
    )
    assembled = assembled.withColumn("__v__", vec)
    if l2:
        norm = F.sqrt(
            F.aggregate(
                F.col("__v__"),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        )
        assembled = assembled.withColumn(
            "__v__",
            F.when(
                norm > 0,
                F.transform(F.col("__v__"), lambda x: x / norm),
            ).otherwise(F.col("__v__")),
        )
    zero = F.array_repeat(F.lit(0.0), dim)
    return (
        df.select(F.col(id_col).alias("__doc__"))
        .distinct()
        .join(assembled, "__doc__", "left")
        .select(
            F.col("__doc__").alias(id_col),
            F.coalesce(F.col("__v__"), zero).alias("vector"),
        )
    )


def binarize_sign(
    df: DataFrame,
    vec_col: str,
    out_col: str = "bcode",
    dim: int | None = None,
) -> DataFrame:
    """Binary (sign-bit) embedding quantization: append ``out_col`` =
    ``array<bigint>`` packing bit_i = (v[i] > 0) MSB-first into
    ceil(dim/64) words — 32x smaller than float32, and Hamming distance
    over the codes approximates angular distance (Charikar STOC 2002:
    for unit vectors P[sign bits differ] = angle/pi per coordinate
    hyperplane; here the hyperplanes are the coordinate axes, the
    standard "binary quantization" in vector databases).

    Pure JVM expressions (one aggregate-fold per word, whole-stage
    codegen) — no UDF, no shuffle, no driver data.  ``dim`` is read
    from one row when not given (plan-time scalar).  The fold shifts
    left once per element, so a full word's first element lands at bit
    63 and the last word of a non-multiple-of-64 dim packs its bits in
    the LOW positions — any consistent convention works; codes of
    equal-dim vectors are always comparable.

    Pairs with ``similarity.binary_ann_topk`` (Hamming shortlist +
    exact rerank) and ``dedup.hamming_near_dup_pairs`` (banded
    near-dup over single-word codes)."""
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("cannot infer dim from an empty DataFrame")
        dim = first["d"]
    n_words = (dim + 63) // 64
    words = []
    for w in range(n_words):
        lo = w * 64
        width = min(64, dim - lo)
        word = F.aggregate(
            F.slice(F.col(vec_col), lo + 1, width),
            F.lit(0).cast("long"),
            lambda acc, x: F.shiftleft(acc, 1)
            + (x > 0).cast("long"),
        )
        words.append(word)
    return df.withColumn(out_col, F.array(*words))
