"""KMV (k-minimum-values) distinct-count sketches as DataFrame algebra.

The KMV / bottom-k sketch (Bar-Yossef et al., RANDOM 2002; Beyer et al.,
SIGMOD 2007) keeps the k smallest hash values of a set.  Three
properties make it the right second sketch next to HLL++:

1. **Mergeable set algebra**: two sketches union by "merge + keep k
   smallest", and — unlike HLL — support INTERSECTION estimates via the
   Jaccard trick ρ = |S_k(A∪B) ∩ S_A ∩ S_B| / |S_k(A∪B)| (Beyer 2007),
   the "how many users did segments A and B share" query HLL cannot
   answer.
2. **Deterministic and engine-replayable**: the sketch is literally
   "the k smallest md5 values", so an external engine reproduces the
   ESTIMATE bit-for-bit — a hash-checkable oracle where HLL's register
   internals are implementation-defined (our q45/q46 raw estimates are
   rows-only for exactly that reason).
3. **Plain DataFrame shape**: a sketch is a (group..., hash) DataFrame
   with <= k rows per group — persistable, joinable, unionable with
   ordinary operators.

Estimator (unbiased, Beyer 2007): with U_k the k-th smallest hash
normalized to (0, 1],  D̂ = (k - 1) / U_k;  below k distinct values the
sketch IS the set and the count is exact.  Relative stderr ~ 1/sqrt(k-2).

Hashing: md5(seed|value) truncated to 15 hex chars (60 bits — exact in
a BIGINT and in an IEEE double), identical to the engine's other
deterministic-draw operators so DuckDB replays it verbatim.

Scale shape: sketch build = one distinct + one per-group top-k window
(map-side-combinable at the distinct); merges touch only sketch rows
(k per group), never the corpus.  No reference analog.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 16^15 — one past the max 60-bit hash value; normalizing divisor
_MAX_H = float(1 << 60)
_H = "__kmv_h__"


def _hash60(col, seed: str):
    """Deterministic 60-bit hash of a value: md5(seed|value) prefix —
    exact as BIGINT, replayable in any engine with md5."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 256,
    seed: str = "kmv-0",
) -> DataFrame:
    """Per-group bottom-k sketch: (group..., __kmv_h__) with the k
    smallest distinct 60-bit hashes of ``value_col`` (nulls ignored —
    COUNT DISTINCT semantics)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, _hash60(F.col(value_col), seed).alias(_H))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col(_H).asc())
    return (
        hashed.withColumn("__kmv_rn__", F.row_number().over(w))
        .filter(F.col("__kmv_rn__") <= k)
        .drop("__kmv_rn__")
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: Sequence[str], k: int
) -> DataFrame:
    """(group..., distinct_est double): exact below k, else
    (k-1) / (U_k / 2^60), rounded to 4 — deterministic, so an external
    replay of the same hash chain reproduces it bit-for-bit."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n__"), F.max(_H).alias("__uk__")
    )
    est = F.when(F.col("__n__") < k, F.col("__n__").cast("double")).otherwise(
        (k - 1) / (F.col("__uk__").cast("double") / F.lit(_MAX_H))
    )
    return agg.select(*group_cols, F.round(est, 4).alias("distinct_est"))


def kmv_union(
    s1: DataFrame, s2: DataFrame, group_cols: Sequence[str], k: int
) -> DataFrame:
    """Sketch of the UNION of the underlying sets: merge, dedup, keep
    the k smallest per group — touches only sketch rows."""
    merged = s1.unionByName(s2).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col(_H).asc())
    return (
        merged.withColumn("__kmv_rn__", F.row_number().over(w))
        .filter(F.col("__kmv_rn__") <= k)
        .drop("__kmv_rn__")
    )


def kmv_set_estimates(
    s1: DataFrame, s2: DataFrame, group_cols: Sequence[str], k: int
) -> DataFrame:
    """Per-group (union_est, intersect_est, jaccard_est) from two
    sketches — the set-overlap algebra HLL cannot express.

    jaccard ρ = |S_k(A∪B) ∩ S_A ∩ S_B| / |S_k(A∪B)| and
    intersect = ρ * union_est (Beyer et al. 2007).  All arithmetic is
    over deterministic hash sets, so estimates replay externally."""
    groups: List[str] = list(group_cols)
    u = kmv_union(s1, s2, groups, k)
    union_est = kmv_estimate(u, groups, k).withColumnRenamed(
        "distinct_est", "union_est"
    )
    in_both = (
        u.join(s1, groups + [_H], "left_semi")
        .join(s2, groups + [_H], "left_semi")
        .groupBy(*groups)
        .agg(F.count(F.lit(1)).alias("__both__"))
    )
    u_size = u.groupBy(*groups).agg(F.count(F.lit(1)).alias("__usz__"))
    return (
        union_est.join(u_size, groups)
        .join(in_both, groups, "left")
        .select(
            *groups,
            "union_est",
            F.round(
                F.coalesce(F.col("__both__"), F.lit(0))
                / F.col("__usz__")
                * F.col("union_est"),
                4,
            ).alias("intersect_est"),
            F.round(
                F.coalesce(F.col("__both__"), F.lit(0)) / F.col("__usz__"), 4
            ).alias("jaccard_est"),
        )
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 256,
    seed: str = "kmv-0",
) -> DataFrame:
    """One-shot per-group approx-distinct through a KMV sketch."""
    return kmv_estimate(
        kmv_sketch(df, group_cols, value_col, k=k, seed=seed), group_cols, k
    )
