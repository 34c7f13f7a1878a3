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


# -- KLL-style quantile sketches ---------------------------------------------


class QuantileSketch:
    """Multilevel-compactor quantile sketch (the KLL family — Karnin,
    Lang & Liberty, FOCS 2016; uniform per-level capacities, the
    simpler Manku-style layout).  Items at level i carry weight 2^i; a
    full level sorts and keeps every other item (deterministic
    md5-keyed offset — same engine-replayable-draw discipline as KMV),
    promoting the survivors one level up.  Size is O(k log(n/k));
    rank error is O(n/k)-ish and MEASURED, not just cited, in
    tests/test_kll.py (uniform, skewed, and adversarially sorted
    inputs).

    Mergeable: concatenate per-level buffers and recompact — which is
    what makes the distributed build shape work (one model-sized sketch
    per partition, merged on the driver; the corpus never moves).
    Model state, not data: everything here is driver/executor-local
    python over <= k*levels floats."""

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be at least 8")
        self.k = k
        self.levels: List[List[float]] = [[]]
        self.n = 0
        self._n_compactions = 0

    def _offset(self, level: int) -> int:
        import hashlib

        h = hashlib.md5(
            f"kll|{level}|{self._n_compactions}".encode()
        ).hexdigest()
        return int(h[0], 16) & 1

    def _compact_level(self, level: int) -> None:
        buf = sorted(self.levels[level])
        off = self._offset(level)
        self._n_compactions += 1
        promoted = buf[off::2]
        self.levels[level] = []
        if level + 1 == len(self.levels):
            self.levels.append([])
        self.levels[level + 1].extend(promoted)

    def _maybe_compact(self) -> None:
        level = 0
        while level < len(self.levels):
            if len(self.levels[level]) > self.k:
                self._compact_level(level)
            level += 1

    def update_many(self, values) -> "QuantileSketch":
        for v in values:
            if v is None:
                continue
            self.levels[0].append(float(v))
            self.n += 1
            if len(self.levels[0]) > self.k:
                self._maybe_compact()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for level, buf in enumerate(other.levels):
            while level >= len(self.levels):
                self.levels.append([])
            self.levels[level].extend(buf)
        self.n += other.n
        self._maybe_compact()
        return self

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1]; got {q}")
        if self.n == 0:
            raise ValueError("empty sketch")
        weighted = []
        for level, buf in enumerate(self.levels):
            w = 1 << level
            weighted.extend((v, w) for v in buf)
        weighted.sort()
        target = q * self.n
        acc = 0
        for v, w in weighted:
            acc += w
            if acc >= target:
                return v
        return weighted[-1][0]

    def quantiles(self, qs: Sequence[float]) -> List[float]:
        return [self.quantile(q) for q in qs]


def kll_build(df: DataFrame, col: str, k: int = 200) -> QuantileSketch:
    """Distributed sketch build: one QuantileSketch per partition
    (Arrow-batched pass, no shuffle), partial sketches shipped as
    (partition, level, value) rows — O(k log n) each, model-sized —
    and merged on the driver in deterministic partition order."""
    import pandas as pd

    def _part(batches):
        sk = QuantileSketch(k)
        for pdf in batches:
            sk.update_many(pdf[col].dropna().to_numpy())
        rows = {"level": [], "value": [], "n": []}
        for level, buf in enumerate(sk.levels):
            for v in buf:
                rows["level"].append(level)
                rows["value"].append(v)
                rows["n"].append(0)
        # ride the true item count on one marker row per partition
        rows["level"].append(-1)
        rows["value"].append(0.0)
        rows["n"].append(sk.n)
        yield pd.DataFrame(rows)

    parts = (
        df.select(F.col(col).cast("double").alias(col))
        .mapInPandas(_part, f"level int, value double, n long")
        .withColumn("__pid__", F.spark_partition_id())
        .collect()
    )
    merged = QuantileSketch(k)
    by_pid: dict = {}
    for r in parts:
        by_pid.setdefault(r["__pid__"], []).append(r)
    for pid in sorted(by_pid):
        sk = QuantileSketch(k)
        for r in by_pid[pid]:
            if r["level"] < 0:
                sk.n = int(r["n"])
                continue
            while r["level"] >= len(sk.levels):
                sk.levels.append([])
            sk.levels[r["level"]].append(float(r["value"]))
        merged.merge(sk)
    return merged


def kll_quantile_check(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    k: int = 200,
    eps: float = 0.025,
) -> DataFrame:
    """The q45-pattern bounds-checked oracle form for the quantile
    sketch: estimate each quantile from the sketch, then verify IN THE
    SAME QUERY that the estimate's exact rank sits within ``eps * n``
    of the target rank — one exact-rank aggregation over the corpus
    per call (conditional sums, map-side combined).  Output is
    integers + booleans only (the estimate itself is approximate by
    design and stays out of the hash): (qtile, target_rank, n, ok)."""
    sk = kll_build(df, col, k)
    ests = sk.quantiles(list(qs))
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, est in enumerate(ests):
        aggs.append(
            F.sum(
                (F.col(col).cast("double") <= F.lit(float(est))).cast("long")
            ).alias(f"__r{i}__")
        )
    row = df.agg(*aggs).collect()[0]
    n = int(row["__n__"])
    out = []
    for i, q in enumerate(qs):
        rank = int(row[f"__r{i}__"])
        ok = abs(rank - q * n) <= eps * n
        out.append((float(q), int(q * n), n, bool(ok)))
    return df.sparkSession.createDataFrame(
        out, "qtile double, target_rank bigint, n bigint, ok boolean"
    )
