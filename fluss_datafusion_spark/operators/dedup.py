"""Deduplication operators for training-data pipelines.

Four families, all shuffle-planned by Catalyst and scale-safe:

- exact:       hash-groupBy on a content fingerprint — one shuffle.
- n-gram Jaccard: exact all-pairs within blocking keys — the *oracle*
  path; quadratic within a block, so only usable with tight blocking.
- MinHash+LSH: the scale path — signatures (narrow), band buckets
  (shuffle on bucket), candidate pairs (bucket-local), exact verify on
  the candidates only.  Linear-ish in corpus size; this is the one you
  run at 100 TB.
- SimHash:     64-bit signature via per-bit token votes; equal-signature
  grouping finds near-identical docs in ONE aggregation (no pair join).

All hashing uses Spark's xxhash64 with fixed literal seeds, so results
are deterministic across runs and clusters.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluss_datafusion_spark.functions.text import fingerprint, word_shingles
from fluss_datafusion_spark.functions.vector import cosine


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per normalized-content fingerprint."""
    return (
        df.withColumn("__fp__", fingerprint(F.col(text_col)))
        .groupBy("__fp__")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
        .drop("__fp__")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.4,
    block_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Exact word-k-gram Jaccard near-duplicate pairs.

    Quadratic within each block (block_cols, e.g. language) — correct by
    construction, usable as the verification oracle for the LSH path.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    block_cols = block_cols or []
    sh = df.select(
        F.col(id_col).alias("__id__"),
        *[F.col(c).alias(f"__b{i}__") for i, c in enumerate(block_cols)],
        word_shingles(F.col(text_col), k).alias("__sh__"),
    ).filter(F.size("__sh__") > 0)

    a = sh.alias("a")
    b = sh.alias("b")
    cond = F.col(f"a.__id__") < F.col("b.__id__")
    for i in range(len(block_cols)):
        cond = cond & (F.col(f"a.__b{i}__") == F.col(f"b.__b{i}__"))
    inter = F.size(F.array_intersect(F.col("a.__sh__"), F.col("b.__sh__")))
    union = F.size(F.array_union(F.col("a.__sh__"), F.col("b.__sh__")))
    jac = inter / union
    return (
        a.join(b, cond)
        .select(
            F.col("a.__id__").alias("id_a"),
            F.col("b.__id__").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_perm: int = 128
) -> DataFrame:
    """(id, array<bigint> signature): per permutation i,
    sig[i] = min over shingles of xxhash64(shingle, i).

    One explode + one groupBy — two narrow shuffles; signature width is
    constant, so this stays linear at any corpus size.
    """
    exploded = (
        df.select(
            F.col(id_col).alias("__id__"), word_shingles(F.col(text_col), k).alias("__sh__")
        )
        .filter(F.size("__sh__") > 0)
        .select("__id__", F.explode("__sh__").alias("__s__"))
    )
    aggs = [
        F.min(F.xxhash64(F.col("__s__"), F.lit(i))).alias(f"h{i}") for i in range(num_perm)
    ]
    sig = exploded.groupBy("__id__").agg(*aggs)
    return sig.select(
        "__id__", F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("__sig__")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_perm: int = 128,
    rows_per_band: int = 2,
    threshold: float = 0.4,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs with exact verification.

    bands = num_perm / rows_per_band.  With r=2, b=64 the candidate
    recall at jaccard=0.4 is 1-(1-0.4^2)^64 ≈ 1-1.4e-5 — and because the
    hash seeds are fixed literals, the candidate set is a deterministic
    function of the data.  Candidates are verified with exact Jaccard, so
    precision is exact; only recall is (negligibly) approximate.

    Scale shape: signatures are linear; band bucketing shuffles on
    (band, bucket-hash); pairs are generated bucket-locally (a skewed
    mega-bucket would be the hot spot — cap with a bucket-size guard
    upstream if the corpus has degenerate boilerplate).
    """
    n_bands = num_perm // rows_per_band
    sig = minhash_signatures(df, id_col, text_col, k, num_perm)

    band_cols = []
    for band in range(n_bands):
        piece = F.slice("__sig__", band * rows_per_band + 1, rows_per_band)
        band_cols.append(
            F.struct(
                F.lit(band).alias("band"), F.xxhash64(piece.cast("string")).alias("bucket")
            )
        )
    buckets = sig.select(
        "__id__", F.explode(F.array(*band_cols)).alias("__b__")
    ).select("__id__", F.col("__b__.band").alias("__band__"), F.col("__b__.bucket").alias("__bucket__"))

    a = buckets.alias("a")
    b = buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.__band__") == F.col("b.__band__"))
            & (F.col("a.__bucket__") == F.col("b.__bucket__"))
            & (F.col("a.__id__") < F.col("b.__id__")),
        )
        .select(F.col("a.__id__").alias("id_a"), F.col("b.__id__").alias("id_b"))
        .distinct()
    )

    # Exact verification of candidates only (tiny relative to corpus).
    sh = df.select(
        F.col(id_col).alias("__id__"), word_shingles(F.col(text_col), k).alias("__sh__")
    )
    verified = (
        candidates.join(sh.withColumnRenamed("__id__", "id_a").withColumnRenamed("__sh__", "__sha__"), "id_a")
        .join(sh.withColumnRenamed("__id__", "id_b").withColumnRenamed("__sh__", "__shb__"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sha__", "__shb__"))
            / F.size(F.array_union("__sha__", "__shb__")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: explode tokens, hash each token once,
    per-bit weighted vote, reassemble.  One explode + one groupBy; the 64
    per-bit votes are plain conditional aggregates (codegen-friendly)."""
    from fluss_datafusion_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col).alias("__id__"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__t__"),
    ).withColumn("__h__", F.xxhash64("__t__", F.lit(0)))

    votes = [
        F.sum(
            F.when(F.shiftright("__h__", bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{bit}")
        for bit in range(64)
    ]
    voted = toks.groupBy("__id__").agg(*votes)
    sig = voted.select(
        "__id__",
        sum(
            [
                F.when(F.col(f"v{bit}") > 0, F.lit(1).cast("long") * (2**bit if bit < 63 else -(2**63))).otherwise(0)
                for bit in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sig.select(F.col("__id__").alias(id_col), "simhash")


def simhash_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Documents sharing an identical 64-bit simhash (near-identical token
    multisets) — found with one aggregation, no pair join."""
    sig = simhash(df, id_col, text_col)
    return (
        sig.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.3,
    block_col: Optional[str] = None,
) -> DataFrame:
    """Embedding near-duplicate pairs by cosine similarity, blocked to
    keep the pair join bounded (block on a cluster/label/LSH-bucket key).
    Returns (id_a, id_b, cos) with id_a < id_b."""
    cols = [F.col(id_col).alias("__id__"), F.col(vec_col).alias("__v__")]
    if block_col:
        cols.append(F.col(block_col).alias("__blk__"))
    e = df.select(*cols)
    a, b = e.alias("a"), e.alias("b")
    cond = F.col("a.__id__") < F.col("b.__id__")
    if block_col:
        cond = cond & (F.col("a.__blk__") == F.col("b.__blk__"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.__id__").alias("id_a"),
            F.col("b.__id__").alias("id_b"),
            cosine(F.col("a.__v__"), F.col("b.__v__")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
