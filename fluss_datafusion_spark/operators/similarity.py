"""Similarity search over embedding columns.

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query vectors are broadcast (tiny), the corpus streams; cosine
  runs in the Arrow-batched numpy kernel (bit-identical to the JVM
  fold), then TakeOrderedAndProject keeps k.  Linear scan:
  right answer at any scale, bounded memory.
- ``lsh_ann_topk``: random-hyperplane LSH — the scale path.  Corpus is
  bucketed once by sign-pattern; a query probes only its own bucket
  (plus optional multi-probe neighbors).  Sub-linear reads at the cost
  of approximate recall.  Hyperplanes come from a fixed seed so bucket
  assignment is deterministic.
"""

from __future__ import annotations

import random
from typing import List, Sequence

# module-level so the pandas_udf kernels' stringified type hints (PEP
# 563 `from __future__ import annotations`) resolve 'pd.Series' against
# this module's globals at decoration time (same note as skipping.py)
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# cosine_fast: Arrow-batched numpy kernel, bit-identical to the JVM
# fold (dim-order accumulation) but 10-100x faster per row.
from fluss_datafusion_spark.functions.vector import cosine_fast as cosine
from fluss_datafusion_spark.session import spread_small_scan


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors for every query vector.
    Returns (query_id, neighbor_id, cos, rank) — rank 1..k, ties broken
    by neighbor id so results are fully deterministic."""
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv__"))
    q = queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("__qv__"))
    scored = F.broadcast(q).crossJoin(c).select(
        F.col("qid").alias(query_id),
        "neighbor_id",
        cosine(F.col("__qv__"), F.col("__cv__")).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    """Deterministic random hyperplanes (fixed seed -> stable buckets)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _bucket_expr(vec_col, planes: Sequence[Sequence[float]]):
    """Sign-pattern bucket id: bit i = (vec . plane_i) >= 0."""
    bits = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.lit(2**i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _table_buckets(vec_col, dim: int, n_planes: int, n_tables: int, seed: int):
    """array<struct<table:int, bucket:int>> — one sign-pattern bucket per
    hash table, each table with its own seeded hyperplanes."""
    entries = []
    for table in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + table)
        entries.append(
            F.struct(
                F.lit(table).alias("table"),
                _bucket_expr(vec_col, planes).alias("bucket"),
            )
        )
    return F.array(*entries)


def _table_buckets_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """Arrow-batched bucket assignment: ONE numpy matmul per batch
    computes every (table, plane) dot product at once — versus
    n_tables*n_planes interpreted aggregate-lambda passes per row for
    the expression variant (_table_buckets).  Returns array<int> of
    length n_tables (bucket id per table); same bit convention as
    _bucket_expr, with ties (dot == 0) counted as positive."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # dim x (n_tables*n_planes): all tables' planes stacked column-wise.
    mat = np.array(
        [p for t in range(n_tables) for p in hyperplanes(dim, n_planes, seed + t)]
    ).T
    weights = (2 ** np.arange(n_planes)).astype(np.int64)

    def buckets(v: pd.Series) -> pd.Series:
        vecs = np.stack(v.to_numpy()).astype(np.float64)  # N x dim
        signs = (vecs @ mat) >= 0  # N x (n_tables*n_planes)
        per_table = signs.reshape(len(vecs), n_tables, n_planes)
        ids = (per_table * weights).sum(axis=2).astype(np.int32)  # N x n_tables
        return pd.Series(list(ids))

    return pandas_udf(buckets, "array<int>")


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k with multi-table random-hyperplane LSH.

    A single sign-pattern table has per-neighbor hit probability
    (1-θ/π)^n_planes — too low for weakly-correlated corpora — so we use
    the standard L-table construction: candidates are the union over
    ``n_tables`` independent plane sets, then scored exactly once.
    Storage/shuffle cost scales with n_tables; recall approaches
    1-(1-p)^L.  Returns (query_id, neighbor_id, cos, rank).
    """
    bucket_udf = _table_buckets_udf(dim, n_planes, n_tables, seed)
    # No spread (r13): the bucket UDF is one vectorized numpy matmul per
    # Arrow batch — widening a small corpus to core count multiplies
    # python-worker round trips instead of overlapping compute
    # (interleaved A/B at sf0.1: lsh 2.2 -> 1.5 s, ivf 1.7 -> 1.2 s).
    # At 100 TB the guard was a no-op anyway.
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv__"),
        F.posexplode(bucket_udf(F.col(corpus_vec))).alias("__table__", "__bucket__"),
    )
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(query_vec).alias("__qv__"),
        F.posexplode(bucket_udf(F.col(query_vec))).alias("__table__", "__bucket__"),
    )
    candidates = (
        F.broadcast(q)
        .join(c, ["__table__", "__bucket__"])
        .select("qid", "__qv__", "neighbor_id", "__cv__")
        .dropDuplicates(["qid", "neighbor_id"])
    )
    scored = candidates.select(
        F.col("qid").alias(query_id),
        "neighbor_id",
        cosine(F.col("__qv__"), F.col("__cv__")).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _normalize(mat):
    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _max_sim_udf(centroids):
    """Arrow-batched UDF: max cosine (dot on normalized inputs) of each
    vector against the given seed matrix."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(centroids, dtype=np.float64).T

    def maxsim(v: pd.Series) -> pd.Series:
        vecs = _normalize(np.stack(v.to_numpy()).astype(np.float64))
        return pd.Series((vecs @ cmat).max(axis=1))

    return pandas_udf(maxsim, "double")


def _kmeans_parallel_seeds(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    rounds: int = 3,
    vecs: "DataFrame | None" = None,
) -> "object":
    """Deterministic k-means|| seeding (Bahmani et al., VLDB 2012 — the
    distributed k-means++): start from the min-id vector, then for a
    FIXED number of rounds (independent of k, unlike sequential
    k-means++'s k passes) oversample 2k candidates per round weighted by
    the cosine distance**2 to the nearest already-picked candidate,
    weight the candidate pool by how many corpus rows each candidate is
    nearest to, and reduce the pool to k seeds with weighted k-means++
    LOCALLY (the pool is model-sized: <= 1 + 2k*rounds rows).

    Determinism: the per-row sampling uses md5-derived uniforms keyed by
    (id, round) — same corpus, same seeds, every run, any partitioning.
    Scale shape: each round is ONE job — an Arrow matmul pass feeding a
    TakeOrdered of the 2k best A-ES keys (Efraimidis-Spirakis weighted
    sampling: pick the smallest -ln(u)/w, the same variate family the
    curation samplers use) — r7 replaced the total+Bernoulli two-pass;
    only candidate vectors (model state) ever reach the driver."""
    import numpy as np

    if vecs is None:
        vecs = corpus.select(F.col(id_col).alias("__id__"),
                             F.col(vec_col).alias("__v__"))
    first = vecs.orderBy("__id__").limit(1).collect()
    if not first:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    pool = _normalize(np.array([first[0]["__v__"]], dtype=np.float64))
    ell = 2 * k  # oversample per round
    for r in range(rounds):
        maxsim = _max_sim_udf(pool)
        # cosine distance**2 weights; md5 uniform in (0, 1]
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("__id__").cast("string"),
                                   F.lit(f":kmp:{r}"))),
                    1, 15,
                ),
                16, 10,
            ).cast("double")
            + F.lit(1.0)
        ) / F.lit(float(1 << 60))
        weighted = vecs.select(
            "__id__", "__v__",
            F.pow(F.greatest(F.lit(0.0), F.lit(1.0) - maxsim(F.col("__v__"))),
                  F.lit(2.0)).alias("__w__"),
            u.alias("__u__"),
        )
        # exactly-ell weighted draw without replacement: smallest
        # -ln(u)/w keys (w=0 rows coincide with a candidate — excluded)
        picked = (
            weighted.filter(F.col("__w__") > 0)
            .orderBy((-F.log(F.col("__u__")) / F.col("__w__")).asc(),
                     F.col("__id__"))
            .limit(ell)
            .collect()
        )
        if not picked:
            break  # every vector coincides with a candidate already
        pool = np.vstack(
            [pool, _normalize(np.array([p["__v__"] for p in picked],
                                       dtype=np.float64))]
        )
    # weight pool members by their nearest-corpus-row counts (one pass)
    assign = ivf_assign_udf(pool, n_probe=1)
    counts = dict(
        (r["__c__"], r["__n__"])
        for r in vecs.select(assign(F.col("__v__"))[0].alias("__c__"))
        .groupBy("__c__").agg(F.count(F.lit(1)).alias("__n__")).collect()
    )
    weights = np.array(
        [float(counts.get(i, 0)) for i in range(pool.shape[0])]
    )
    # local weighted k-means++ reduction to k seeds (pool is tiny);
    # fixed-seed RNG keeps the whole trainer deterministic
    rng = np.random.RandomState(0)
    seeds = [int(np.argmax(weights))]
    d2 = 1.0 - pool @ pool[seeds[0]]
    d2 = np.maximum(d2, 0.0) ** 2
    while len(seeds) < min(k, pool.shape[0]):
        probs = weights * d2
        s = probs.sum()
        if s <= 0:
            remaining = [i for i in range(pool.shape[0]) if i not in seeds]
            seeds.extend(remaining[: k - len(seeds)])
            break
        pick = int(rng.choice(pool.shape[0], p=probs / s))
        if pick in seeds:
            # zero-probability guard under float rounding
            d2[pick] = 0.0
            continue
        seeds.append(pick)
        d2 = np.minimum(d2, np.maximum(1.0 - pool @ pool[pick], 0.0) ** 2)
    out = pool[seeds]
    if out.shape[0] < k:
        # fewer distinct directions than k: pad by repeating seeds (the
        # duplicate lists stay empty after Lloyd — harmless)
        out = np.vstack([out] + [out[:1]] * (k - out.shape[0]))
    return _normalize(out)


def _train_local_kmeans(sample, k: int, n_iters: int):
    """Deterministic local k-means over a bounded training SAMPLE
    (rows already sorted by the caller's deterministic order): k-means++
    seeding (fixed-seed RNG, d**2-weighted) + ``n_iters`` Lloyd steps,
    all numpy.  The sample is model-sized by contract (<= sample_cap
    vectors), so this is driver-side model fitting, not data movement."""
    import numpy as np

    mat = _normalize(np.asarray(sample, dtype=np.float64))
    n = mat.shape[0]
    rng = np.random.RandomState(0)
    seeds = [0]  # min-id vector, matching the distributed path's start
    d2 = np.maximum(1.0 - mat @ mat[0], 0.0) ** 2
    while len(seeds) < min(k, n):
        s = d2.sum()
        if s <= 0:
            remaining = [i for i in range(n) if i not in seeds]
            seeds.extend(remaining[: k - len(seeds)])
            break
        pick = int(rng.choice(n, p=d2 / s))
        if pick in seeds:
            d2[pick] = 0.0
            continue
        seeds.append(pick)
        d2 = np.minimum(d2, np.maximum(1.0 - mat @ mat[pick], 0.0) ** 2)
    centroids = mat[seeds]
    if centroids.shape[0] < k:
        centroids = np.vstack(
            [centroids] + [centroids[:1]] * (k - centroids.shape[0])
        )
    for _ in range(n_iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        new = centroids.copy()
        for c in range(k):
            members = mat[assign == c]
            if members.shape[0]:
                vec = members.sum(axis=0)
                if np.linalg.norm(vec) > 0:
                    new[c] = vec
        centroids = _normalize(new)
    return centroids


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int = 16,
    n_iters: int = 2,
    sample_cap: "int | None" = 256 * 64,
):
    """Deterministic IVF coarse quantizer for cosine similarity.

    Default path (r7): FAISS-style SAMPLED training — one distributed
    job draws a deterministic md5-keyed sample of
    ``min(sample_cap, 256*n_centroids)`` vectors (the 256-per-centroid
    cap FAISS uses; quantizer quality saturates well below it), then
    k-means++ seeding + ``n_iters`` Lloyd steps run locally in numpy.
    The sample is model-sized by construction, so at 100 TB training is
    ONE TakeOrdered pass over the corpus instead of ~7 full passes —
    the shape every production ANN system uses.

    ``sample_cap=None`` keeps the r6 full-corpus path: deterministic
    k-means|| seeding (``_kmeans_parallel_seeds``, Bahmani 2012) +
    Lloyd steps as DataFrame jobs (Arrow-batched argmax matmul
    assignment, groupBy mean-update) — only the centroid matrix ever
    reaches the driver.  Both paths are deterministic for a given
    corpus.  Returns a normalized numpy array, row i = centroid i.
    """
    import numpy as np

    if sample_cap is not None:
        cap = min(sample_cap, 256 * n_centroids)
        sample = (
            corpus.select(F.col(id_col).alias("__id__"),
                          F.col(vec_col).alias("__v__"))
            .orderBy(F.md5(F.col("__id__").cast("string")), F.col("__id__"))
            .limit(cap)
            .collect()
        )
        if not sample:
            raise ValueError("cannot train IVF centroids on an empty corpus")
        # min-id first so seeding starts where the distributed path does
        sample.sort(key=lambda r: r["__id__"])
        return _train_local_kmeans(
            [r["__v__"] for r in sample], n_centroids, n_iters
        )

    # One persisted projection feeds every training pass (3 seeding
    # rounds + the pool-weighting pass + n_iters Lloyd steps) — without
    # it each pass re-runs the caller's scan/transform lineage.
    vecs = corpus.select(F.col(id_col).alias("__id__"),
                         F.col(vec_col).alias("__v__")).persist()
    try:
        centroids = _kmeans_parallel_seeds(
            corpus, vec_col, id_col, n_centroids, vecs=vecs
        )

        for _ in range(n_iters):
            assign = ivf_assign_udf(centroids, n_probe=1)
            assigned = vecs.select(
                F.col("__v__"),
                assign(F.col("__v__"))[0].alias("__c__"),
            )
            sums = (
                assigned.select(
                    "__c__", F.posexplode(F.col("__v__")).alias("__i__", "__x__")
                )
                .groupBy("__c__", "__i__")
                .agg(F.sum("__x__").alias("__s__"))
                .collect()
            )
            new = centroids.copy()
            by_c: dict = {}
            for r in sums:
                by_c.setdefault(r["__c__"], {})[r["__i__"]] = r["__s__"]
            for c, comps in by_c.items():
                vec = np.array(
                    [comps.get(i, 0.0) for i in range(centroids.shape[1])]
                )
                if np.linalg.norm(vec) > 0:
                    new[c] = vec
            centroids = _normalize(new)
        return centroids
    finally:
        vecs.unpersist()


def ivf_assign_udf(centroids, n_probe: int = 1):
    """Arrow-batched UDF: array<int> of the ``n_probe`` nearest centroid
    ids (by cosine = dot on normalized inputs) for each vector."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(centroids, dtype=np.float64).T  # dim x n_centroids

    def assign(v: pd.Series) -> pd.Series:
        vecs = _normalize(np.stack(v.to_numpy()).astype(np.float64))
        sims = vecs @ cmat  # N x n_centroids
        top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return pandas_udf(assign, "array<int>")


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 2,
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    inverted list; a query scans only its ``n_probe`` closest lists.

    The scale path complementing lsh_ann_topk: reads ~n_probe/n_centroids
    of the corpus per query, shuffles on the centroid id (uniform-ish by
    construction after Lloyd), scoring is exact on the probed subset.
    Returns (query_id, neighbor_id, cos, rank).
    """
    centroids = train_ivf_centroids(corpus, corpus_vec, corpus_id, n_centroids, n_iters)

    c_assign = ivf_assign_udf(centroids, n_probe=1)
    # no spread: vectorized assign UDF, same rationale as lsh_ann_topk
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv__"),
        c_assign(F.col(corpus_vec))[0].alias("__c__"),
    )
    q_assign = ivf_assign_udf(centroids, n_probe=n_probe)
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(query_vec).alias("__qv__"),
        F.explode(q_assign(F.col(query_vec))).alias("__c__"),
    )
    candidates = F.broadcast(q).join(c, "__c__").select(
        "qid", "__qv__", "neighbor_id", "__cv__"
    )
    scored = candidates.select(
        F.col("qid").alias(query_id),
        "neighbor_id",
        cosine(F.col("__qv__"), F.col("__cv__")).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_vec_expr(vec_col):
    """(scale float, q array<tinyint>): symmetric int8 scalar
    quantization of a float vector — q[i] = round(127 * v[i] / max|v|),
    dequantized as q[i] * scale with scale = max|v| / 127.  Pure JVM
    expressions (transform/aggregate), no UDF."""
    mx = F.aggregate(
        F.transform(vec_col, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = F.when(mx > 0, mx / 127.0).otherwise(F.lit(1.0))
    q = F.transform(
        vec_col, lambda x: F.round(x.cast("double") / scale).cast("tinyint")
    )
    return scale, q


def write_ann_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_centroids: int = 16,
    n_iters: int = 2,
    quantize: bool = False,
) -> None:
    """Train the IVF coarse quantizer and persist the index: centroids
    (one tiny parquet) plus the corpus inverted lists PARTITIONED BY
    centroid id.  Train once, query many — the index lifecycle that
    amortizes Lloyd training across every future query batch.

    The partitionBy layout is the point at scale: each probe reads only
    its list's directory (partition pruning), so a query batch touching
    n_probe of n_centroids lists scans ~n_probe/n_centroids of the
    corpus bytes.  ``quantize=True`` additionally stores the list
    vectors int8-scalar-quantized (IVF+SQ8: per-vector max-abs scale +
    tinyint components — 4x smaller lists, the memory/IO lever real
    vector stores pull first); ``ann_query_index`` dequantizes at
    scoring time, trading ~1/254 relative component error for the
    bandwidth.
    """
    import os

    centroids = train_ivf_centroids(corpus, vec_col, id_col, n_centroids, n_iters)
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(centroids)],
        "centroid_id int, centroid array<double>",
    ).repartition(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    assign = ivf_assign_udf(centroids, n_probe=1)
    rows = spread_small_scan(corpus)
    if quantize:
        scale, q = quantize_vec_expr(F.col(vec_col))
        lists = rows.select(
            F.col(id_col).alias("neighbor_id"),
            scale.alias("__scale__"),
            q.alias("__qv__"),
            assign(F.col(vec_col))[0].alias("__c__"),
        )
    else:
        lists = rows.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv__"),
            assign(F.col(vec_col))[0].alias("__c__"),
        )
    lists.write.mode("overwrite").partitionBy("__c__").parquet(
        os.path.join(path, "lists")
    )


def append_to_ann_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
) -> None:
    """Extend a persisted IVF index with new vectors WITHOUT retraining:
    load the centroid matrix (model state, tiny), assign each new vector
    to its nearest existing centroid, append to that inverted list's
    partition directory.  The quantizer stays frozen — the standard IVF
    ingest trade (lists drift from optimal as the distribution shifts;
    retrain via ``write_ann_index`` when recall degrades).  Mirrors
    ``incremental.append_to_index`` for the dedup index: train once,
    append forever, query many."""
    import os

    import numpy as np

    spark = corpus.sparkSession
    crows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("centroid_id")
        .collect()
    )
    centroids = np.array([r["centroid"] for r in crows], dtype=np.float64)
    assign = ivf_assign_udf(centroids, n_probe=1)
    # match the existing lists' storage format (float vs int8-quantized)
    # — a mixed-schema append would corrupt every later read
    existing = spark.read.parquet(os.path.join(path, "lists"))
    rows = spread_small_scan(corpus)
    if "__qv__" in existing.columns:
        scale, q = quantize_vec_expr(F.col(vec_col))
        out = rows.select(
            F.col(id_col).alias("neighbor_id"),
            scale.alias("__scale__"),
            q.alias("__qv__"),
            assign(F.col(vec_col))[0].alias("__c__"),
        )
    else:
        out = rows.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv__"),
            assign(F.col(vec_col))[0].alias("__c__"),
        )
    out.write.mode("append").partitionBy("__c__").parquet(
        os.path.join(path, "lists")
    )


def ann_ingest_sink(
    stream_vectors: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metrics=None,
):
    """Continuous ANN-index ingest: per micro-batch, assign the new
    vectors to their nearest existing centroid and append them to the
    partitioned inverted lists (``append_to_ann_index``) — queries
    issued after the batch commits see the new vectors.  The streaming
    twin of ``incremental.dedup_ingest_sink``: state lives in the index
    (the query itself is stateless, restart-clean from the checkpoint),
    the quantizer stays frozen, and retraining is an offline
    ``write_ann_index`` when drift degrades recall.  ``metrics``
    (optional list) records {batch_id, n_vectors} per batch."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            n = batch_df.count()
            if n == 0:
                return
            append_to_ann_index(batch_df, id_col, vec_col, index_path)
            if metrics is not None:
                metrics.append({"batch_id": batch_id, "n_vectors": n})
        finally:
            batch_df.unpersist()

    return (
        stream_vectors.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ann_query_index(
    queries: DataFrame,
    index_path: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k against a persisted IVF index: load the centroid
    matrix (model state, tiny), assign each query its ``n_probe`` lists,
    and join against the partitioned inverted lists — the broadcast join
    on the partition column lets dynamic partition pruning skip every
    unprobed list's files.  Scoring is exact on the probed subset.
    Identical results to ``ivf_ann_topk`` built with the same
    parameters (same deterministic quantizer).
    """
    import os

    import numpy as np

    spark = queries.sparkSession
    crows = (
        spark.read.parquet(os.path.join(index_path, "centroids"))
        .orderBy("centroid_id")
        .collect()
    )
    centroids = np.array([r["centroid"] for r in crows], dtype=np.float64)
    q_assign = ivf_assign_udf(centroids, n_probe=n_probe)
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(query_vec).alias("__qv__"),
        F.explode(q_assign(F.col(query_vec))).alias("__c__"),
    )
    lists = spark.read.parquet(os.path.join(index_path, "lists"))
    if "__qv__" in lists.columns:
        # int8-quantized lists (IVF+SQ8): dequantize at scoring time —
        # the scale is per-row, so this is a pure map-side transform
        lists = lists.select(
            "neighbor_id",
            "__c__",
            F.transform(
                F.col("__qv__"), lambda x: x.cast("double") * F.col("__scale__")
            ).alias("__cv__"),
        )
    candidates = F.broadcast(q).join(lists, "__c__")
    scored = candidates.select(
        F.col("qid").alias(query_id),
        "neighbor_id",
        cosine(F.col("__qv__"), F.col("__cv__")).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
    band=(0.3, 0.8),
    exclude_pairs: DataFrame = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training (the negatives that
    actually teach: similar enough to be confused, dissimilar enough to
    be wrong — e.g. DPR, Karpukhin et al. 2020 §3.2): for every anchor,
    the top-``k`` corpus vectors whose cosine falls in ``[band[0],
    band[1])``, excluding the anchor itself and any pair listed in
    ``exclude_pairs`` (known positives/duplicates as (id_a, id_b) in
    either order — mined negatives must never contain a positive).

    Returns (query_id, neighbor_id, cos, rank), cos rounded 6.

    Scale shape: anchors broadcast against the streamed corpus (the
    brute-force baseline, same as cosine_topk — swap in the ANN index
    probe for huge anchor sets); the exclusion list semi-joins as two
    hash joins on the pair endpoints; top-k is one window per anchor.
    The band predicate prunes before the window, so per-anchor state is
    the in-band slice, not the corpus."""
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv__")
    )
    q = queries.select(
        F.col(query_id).alias("__qid__"), F.col(query_vec).alias("__qv__")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .select(
            F.col("__qid__"),
            "neighbor_id",
            cosine(F.col("__qv__"), F.col("__cv__")).alias("cos"),
        )
        .filter(F.col("__qid__") != F.col("neighbor_id"))
        .filter(
            (F.col("cos") >= float(band[0])) & (F.col("cos") < float(band[1]))
        )
    )
    if exclude_pairs is not None:
        both = exclude_pairs.select(
            F.col("id_a").alias("__qid__"), F.col("id_b").alias("neighbor_id")
        ).unionByName(
            exclude_pairs.select(
                F.col("id_b").alias("__qid__"), F.col("id_a").alias("neighbor_id")
            )
        )
        scored = scored.join(both, ["__qid__", "neighbor_id"], "left_anti")
    w = Window.partitionBy("__qid__").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid__").alias(query_id),
            "neighbor_id",
            F.round("cos", 6).alias("cos"),
            "rank",
        )
    )


# -- product quantization (IVF-PQ) -------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 8,
    ks: int = 16,
    n_iters: int = 3,
    sample_cap: int = 4096,
):
    """Deterministic product-quantization codebooks (Jégou, Douze &
    Schmid 2011, "Product Quantization for Nearest Neighbor Search"):
    split the (normalized) vector into ``m`` equal subspaces and fit an
    independent ``ks``-centroid Euclidean k-means per subspace over ONE
    deterministic md5-keyed sample — the same one-job training shape as
    the sampled IVF coarse quantizer.  Seeding is farthest-first
    traversal from the min-id vector (deterministic, no RNG), then
    ``n_iters`` Lloyd steps in numpy.

    A code is ``m`` bytes instead of ``4*dim`` float bytes — at 100 TB
    of embeddings the inverted lists shrink ~32x, which is the entire
    point: the scoring scan reads codes, full vectors are touched only
    by the shortlist re-rank.  Returns an (m, ks, dim//m) numpy array.
    """
    import numpy as np

    sample_rows = (
        corpus.select(F.col(id_col).alias("__id__"), F.col(vec_col).alias("__v__"))
        .orderBy(F.md5(F.col("__id__").cast("string")), F.col("__id__"))
        .limit(sample_cap)
        .collect()
    )
    if not sample_rows:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    sample_rows.sort(key=lambda r: r["__id__"])
    mat = _normalize(
        np.asarray([r["__v__"] for r in sample_rows], dtype=np.float64)
    )
    dim = mat.shape[1]
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} is not divisible by m={m}")
    dsub = dim // m
    books = np.zeros((m, ks, dsub))
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        n = sub.shape[0]
        k_eff = min(ks, n)
        # farthest-first seeding from row 0 (rows are id-sorted)
        seeds = [0]
        d2 = ((sub - sub[0]) ** 2).sum(axis=1)
        while len(seeds) < k_eff:
            pick = int(np.argmax(d2))
            if d2[pick] <= 0:
                break
            seeds.append(pick)
            d2 = np.minimum(d2, ((sub - sub[pick]) ** 2).sum(axis=1))
        cents = sub[seeds]
        if cents.shape[0] < ks:
            cents = np.vstack([cents] + [cents[:1]] * (ks - cents.shape[0]))
        for _ in range(n_iters):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(ks):
                members = sub[assign == c]
                if members.shape[0]:
                    cents[c] = members.mean(axis=0)
        books[s] = cents
    return books


def pq_encode_udf(codebooks):
    """Arrow-batched UDF: array<tinyint> of ``m`` codebook ids — each
    subspace of the NORMALIZED vector snaps to its nearest centroid
    (Euclidean argmin, ties to the lowest id via argmin's first-hit)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = np.asarray(codebooks, dtype=np.float64)
    m, ks, dsub = books.shape

    def encode(v):
        vecs = _normalize(np.stack(v.to_numpy()).astype(np.float64))
        n = vecs.shape[0]
        codes = np.zeros((n, m), dtype=np.int8)
        for s in range(m):
            sub = vecs[:, s * dsub : (s + 1) * dsub]
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 -> argmin over c
            d = (
                (sub**2).sum(axis=1, keepdims=True)
                - 2.0 * sub @ books[s].T
                + (books[s] ** 2).sum(axis=1)[None, :]
            )
            codes[:, s] = np.argmin(d, axis=1).astype(np.int8)
        return pd.Series(list(codes))

    return pandas_udf(encode, "array<tinyint>")


def _pq_adc_udf(codebooks):
    """Arrow-batched UDF (query_vec, codes) -> asymmetric-distance
    approximate dot: sum over subspaces of <q_sub, codebook[s][code]>.
    On normalized inputs this approximates cosine; exactness returns at
    the shortlist re-rank."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = np.asarray(codebooks, dtype=np.float64)
    m, ks, dsub = books.shape

    def adc(qv, codes):
        q = _normalize(np.stack(qv.to_numpy()).astype(np.float64))
        c = np.stack(codes.to_numpy()).astype(np.int64)  # N x m
        q3 = q.reshape(q.shape[0], m, dsub)
        gathered = books[np.arange(m)[None, :], c]  # N x m x dsub
        return pd.Series((q3 * gathered).sum(axis=(1, 2)))

    return pandas_udf(adc, "double")


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    m: int = 8,
    ks: int = 16,
    n_iters: int = 2,
    rerank: int = 4,
) -> DataFrame:
    """IVF-PQ approximate top-k (the FAISS IVFPQ + refine shape): the
    IVF coarse quantizer restricts each query to ``n_probe`` inverted
    lists, the probed candidates are scored by PQ asymmetric distance
    over ``m``-byte codes, the ADC top ``rerank * k`` shortlist is
    re-ranked with exact cosine against the full vectors, and the final
    top-k is exact-on-the-shortlist.

    Scale decomposition, which is the point: the scoring scan reads
    ~n_probe/n_centroids of the corpus as CODES (m bytes/vector, ~32x
    smaller than float32 at dim 64), and only shortlist-sized data —
    O(queries * rerank * k) rows — ever touches full vectors (a
    semi-join on the id).  Both trainers are one-sample-job
    deterministic; scoring/encoding are Arrow-batched.

    Returns (query_id, neighbor_id, cos, rank) with exact cosine."""
    centroids = train_ivf_centroids(
        corpus, corpus_vec, corpus_id, n_centroids, n_iters
    )
    books = train_pq_codebooks(corpus, corpus_vec, corpus_id, m=m, ks=ks)

    c_assign = ivf_assign_udf(centroids, n_probe=1)
    encode = pq_encode_udf(books)
    lists = spread_small_scan(corpus).select(
        F.col(corpus_id).alias("neighbor_id"),
        c_assign(F.col(corpus_vec))[0].alias("__c__"),
        encode(F.col(corpus_vec)).alias("__code__"),
    )
    q_assign = ivf_assign_udf(centroids, n_probe=n_probe)
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(query_vec).alias("__qv__"),
        F.explode(q_assign(F.col(query_vec))).alias("__c__"),
    )
    adc = _pq_adc_udf(books)
    scored = (
        F.broadcast(q)
        .join(lists, "__c__")
        .select(
            "qid",
            "neighbor_id",
            adc(F.col("__qv__"), F.col("__code__")).alias("__adc__"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("__adc__").desc(), F.col("neighbor_id")
    )
    shortlist = (
        scored.withColumn("__r__", F.row_number().over(w))
        .filter(F.col("__r__") <= rerank * k)
        .select("qid", "neighbor_id")
    )
    full = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv__")
    )
    qv = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("__qv__")
    )
    exact = (
        shortlist.join(full, "neighbor_id")
        .join(F.broadcast(qv), "qid")
        .select(
            F.col("qid").alias(query_id),
            "neighbor_id",
            cosine(F.col("__qv__"), F.col("__cv__")).alias("cos"),
        )
    )
    wf = Window.partitionBy(query_id).orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return exact.withColumn("rank", F.row_number().over(wf)).filter(
        F.col("rank") <= k
    )


def binary_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
    rerank: int = 4,
    dim: int | None = None,
    corpus_code: str | None = None,
) -> DataFrame:
    """Binary-quantization ANN (the vector-database "binary quantize +
    rescore" shape): sign-bit codes (embeddings.binarize_sign, 32x
    smaller than float32) are scanned with XOR+popcount Hamming
    distance to build a ``rerank * k`` shortlist per query, then ONLY
    the shortlist's raw vectors are fetched for exact-cosine re-ranking
    — top-k is exact-on-the-shortlist.

    Scale shape: the per-query top-(rerank*k) shuffle carries CODES
    ONLY (a handful of bigints per row, never the float vectors);
    phase 2 broadcast-semi-joins the shortlist ids back to the corpus,
    so raw vectors cross the wire for candidate rows only.  Pass
    ``corpus_code`` (a column precomputed once by
    embeddings.binarize_sign and persisted) to make phase 1's SCAN
    touch ~3% of the float bytes too — with codes derived on the fly
    the scan still reads the vectors, it just never shuffles them.
    No index build: this is the zero-maintenance middle ground between
    brute force (full float scan) and IVF (train + route).

    Determinism: both phases break ties by neighbor id.  Returns
    (query_id, neighbor_id, ham, cos, rank) — rank 1..k by exact
    cosine over the shortlist."""
    from fluss_datafusion_spark.operators.embeddings import binarize_sign

    if corpus_code is not None:
        c_codes = corpus.select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(corpus_code).alias("__cc__"),
        )
    else:
        c_codes = binarize_sign(
            corpus.select(
                F.col(corpus_id).alias("neighbor_id"),
                F.col(corpus_vec).alias("__cv__"),
            ),
            "__cv__",
            out_col="__cc__",
            dim=dim,
        ).select("neighbor_id", "__cc__")
    q = binarize_sign(
        queries.select(
            F.col(query_id).alias("__qid__"),
            F.col(query_vec).alias("__qv__"),
        ),
        "__qv__",
        out_col="__qc__",
        dim=dim,
    )
    ham = F.aggregate(
        F.zip_with(
            F.col("__qc__"),
            F.col("__cc__"),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("__qid__").orderBy("ham", "neighbor_id")
    shortlist = (
        F.broadcast(q.select("__qid__", "__qc__"))
        .crossJoin(spread_small_scan(c_codes))
        .select("__qid__", "neighbor_id", ham.alias("ham"))
        .withColumn("__r__", F.row_number().over(w))
        .filter(F.col("__r__") <= rerank * k)
        .drop("__r__")
    )
    cand_vecs = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv__"),
    ).join(
        F.broadcast(shortlist.select("neighbor_id").distinct()),
        "neighbor_id",
        "left_semi",
    )
    exact = (
        shortlist.join(
            F.broadcast(q.select("__qid__", "__qv__")), "__qid__"
        )
        .join(cand_vecs, "neighbor_id")
        .select(
            F.col("__qid__").alias(query_id),
            "neighbor_id",
            "ham",
            cosine(F.col("__qv__"), F.col("__cv__")).alias("cos"),
        )
    )
    wf = Window.partitionBy(query_id).orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return exact.withColumn("rank", F.row_number().over(wf)).filter(
        F.col("rank") <= k
    )


def semantic_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_vec: str,
    right_id: str,
    right_vec: str,
    threshold: float = 0.8,
    n_planes: int = 8,
    n_tables: int = 16,
    seed: int = 4242,
    dim: int | None = None,
) -> DataFrame:
    """Fuzzy join on MEANING — the cross-table twin of
    embedding_cosine_pairs_lsh: (left_id, right_id, cos) for every
    cross-table pair with exact cosine >= threshold among candidates
    that share a random-hyperplane LSH bucket in ANY of ``n_tables``
    hash tables (entity/product matching across sources, RAG corpus
    linking — the join form no equi-key can express).

    Scale shape: both sides bucket with the SAME seeded hyperplanes
    (one Arrow matmul pass each), candidates come from an equi-join on
    (table, bucket) — a hash shuffle, never a cross join — and only
    candidates are verified with exact cosine (two narrow id joins
    fetch the vectors).  Recall is the standard sign-LSH bound: a pair
    at angle θ shares one table's bucket with prob (1 − θ/π)^n_planes,
    so p_any = 1 − (1 − p_table)^n_tables — at cos 0.8 (θ ≈ 36.9°) the
    defaults give p_table ≈ 0.16 and p_any ≈ 0.94 (measured 0.96 on
    the clustered fixture; 12 planes measured 0.70 — too coarse).
    Raise n_tables (cost: linear in bucket rows) or lower n_planes
    (cost: bigger buckets) for higher recall; exactness needs the
    brute-force join.  Determinism: fixed seed, exact verify — the
    result is a pure function of the inputs."""
    if dim is None:
        first = left.select(F.size(F.col(left_vec)).alias("d")).first()
        if first is None:
            raise ValueError("cannot infer dim from an empty left side")
        dim = first["d"]
    bucketer = _table_buckets_udf(dim, n_planes, n_tables, seed)

    def side(df, id_col, vec_col, out_id):
        return (
            df.select(
                F.col(id_col).alias(out_id), F.col(vec_col).alias("__v__")
            )
            .withColumn("__bk__", bucketer(F.col("__v__")))
            .select(
                out_id,
                F.posexplode("__bk__").alias("__table__", "__bucket__"),
            )
        )

    lb = side(left, left_id, left_vec, "__lid__")
    rb = side(right, right_id, right_vec, "__rid__")
    candidates = (
        lb.join(rb, ["__table__", "__bucket__"])
        .select("__lid__", "__rid__")
        .distinct()
    )
    lv = left.select(
        F.col(left_id).alias("__lid__"), F.col(left_vec).alias("__lv__")
    )
    rv = right.select(
        F.col(right_id).alias("__rid__"), F.col(right_vec).alias("__rv__")
    )
    return (
        candidates.join(lv, "__lid__")
        .join(rv, "__rid__")
        .withColumn("cos", cosine(F.col("__lv__"), F.col("__rv__")))
        .filter(F.col("cos") >= F.lit(threshold))
        .select(
            F.col("__lid__").alias(left_id),
            F.col("__rid__").alias(right_id),
            "cos",
        )
    )
