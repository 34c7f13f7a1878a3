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


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
# ---------------------------------------------------------------------------
#
# The frequency-estimation companion to KMV's distinct counts: d
# independent hash rows of w counters; point estimate = min over rows of
# the addressed counter.  Guarantees (with N = total weight):
#   est >= true  (always — collisions only add), and
#   est <= true + (e/w) * N  with probability >= 1 - (1/e)^d.
# Counters ADD, so two sketches merge by summing matching cells —
# the mergeable-summary property that lets 1000 executors sketch
# shards independently and combine d*w-size results.
#
# DataFrame shape: a sketch is (group..., __cms_i__, __cms_b__, cnt)
# with <= d*w rows per group (zero cells are simply absent; estimates
# coalesce them to 0).  Hashing is the same md5-60bit chain as KMV with
# a per-row seed, so DuckDB replays every counter and every estimate
# bit-for-bit.
#
# Build cost at scale: one exact per-(group, value) pre-aggregation
# (map-side combinable — the d-way explode happens AFTER the corpus is
# reduced to distinct values), then one (group, i, bucket) aggregation
# whose output is bounded by d*w per group.  No reference analog.

_CMS_I = "__cms_i__"
_CMS_B = "__cms_b__"


def _cms_bucket(value_col, row_col, width: int, seed: str):
    """Row-i counter address of a value: md5(seed|i|value) 60-bit prefix
    mod width — the same engine-replayable chain as :func:`_hash60`,
    salted by the hash-row index."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(seed), row_col.cast("string"), value_col.cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    width: int = 512,
    depth: int = 3,
    seed: str = "cms-0",
    weight_col: str = None,
) -> DataFrame:
    """Per-group count-min sketch of ``value_col`` frequencies
    (optionally weighted): (group..., __cms_i__, __cms_b__, cnt) with
    <= depth*width rows per group; zero cells are absent."""
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1; got {width}x{depth}")
    groups = list(group_cols)
    w_expr = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    # Exact (group, value) pre-aggregation first: the d-way explode
    # multiplies DISTINCT values, never corpus rows.
    per_value = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*groups, F.col(value_col).cast("string").alias("__cms_v__"))
        .agg(F.sum(w_expr).alias("__cms_w__"))
    )
    return (
        per_value.select(
            *groups,
            "__cms_v__",
            "__cms_w__",
            F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias(_CMS_I),
        )
        .withColumn(_CMS_B, _cms_bucket(F.col("__cms_v__"), F.col(_CMS_I), width, seed))
        .groupBy(*groups, _CMS_I, _CMS_B)
        .agg(F.sum("__cms_w__").alias("cnt"))
    )


def cms_merge(s1: DataFrame, s2: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Combine two sketches built with the same (width, depth, seed):
    counters add cell-wise — touches only sketch rows."""
    return (
        s1.unionByName(s2)
        .groupBy(*group_cols, _CMS_I, _CMS_B)
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    width: int,
    depth: int,
    seed: str = "cms-0",
) -> DataFrame:
    """Point-estimate the frequency of each candidate value:
    (group..., value_col, freq_est) = min over the d addressed counters
    (absent cells read 0).  ``candidates`` carries (group..., value_col);
    the join is on (group, row, bucket) — candidate-sized, so a small
    candidate set broadcasts against a d*w-bounded sketch."""
    groups = list(group_cols)
    addressed = (
        candidates.filter(F.col(value_col).isNotNull())
        .select(
            *groups,
            F.col(value_col).cast("string").alias("__cms_q__"),
            F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias(_CMS_I),
        )
        .withColumn(_CMS_B, _cms_bucket(F.col("__cms_q__"), F.col(_CMS_I), width, seed))
    )
    joined = addressed.join(sketch, groups + [_CMS_I, _CMS_B], "left")
    return (
        joined.groupBy(*groups, "__cms_q__")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("freq_est"))
        .withColumnRenamed("__cms_q__", value_col)
    )
