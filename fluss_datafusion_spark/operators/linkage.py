"""Probabilistic record linkage — the Fellegi–Sunter model (JASA 1969)
with EM-fitted parameters (Winkler 1988), the Splink/fastLink shape.

Given CANDIDATE PAIRS (from any blocking stage — LSH, fuzzy deletion
neighborhoods, exact keys) with BINARY agreement columns (name agrees,
phone agrees, …), fit per-field match/non-match probabilities

    m_k = P(field k agrees | pair is a match)
    u_k = P(field k agrees | pair is a non-match)

and the match prior ``p`` by EM, then score every pair with the
log2 likelihood ratio  Σ_k log2(m_k/u_k or (1-m_k)/(1-u_k)) and the
posterior match probability.

Scale shape (the part that matters at 100 TB): the E/M steps only ever
touch the DISTINCT AGREEMENT PATTERNS — at most 2^F rows for F fields,
a constant — so the fit is ONE map-side-combined groupBy().count()
over the pairs plus a pure-Python EM on the collected pattern table
(driver cost independent of corpus size, no per-iteration Spark jobs).
Scoring is a single JVM expression over the pairs; the fitted model is
a plain dict riding the closure.

Determinism: fixed initialization, fixed iteration count, pattern table
sorted before the EM — identical inputs give identical parameters on
any partitioning (counts are exact integers).

No reference analog (zuston/fluss-datafusion is a storage-federation
CLI); north-star extension surface for entity resolution over the same
tables.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-6


def _clamp(x: float) -> float:
    return min(max(x, _EPS), 1.0 - _EPS)


def fs_em_fit(
    pairs: DataFrame,
    agree_cols: Sequence[str],
    iters: int = 20,
    p_init: float = 0.1,
    m_init: float = 0.9,
    u_init: float = 0.1,
) -> Dict:
    """Fit the Fellegi–Sunter parameters by EM over the candidate
    pairs' agreement patterns.

    E-step (per pattern γ): w(γ) = p·Π_k m_k^γ_k (1-m_k)^(1-γ_k)
    over that plus the u-side term; M-step re-estimates p, m_k, u_k
    from the pattern counts weighted by w.  Runs entirely on the
    ≤ 2^F pattern rows collected from one exact groupBy count.

    Returns {"p": float, "m": {col: float}, "u": {col: float},
    "n_pairs": int, "iters": int}."""
    cols = list(agree_cols)
    patt = (
        pairs.groupBy(
            *[F.col(c).cast("int").alias(c) for c in cols]
        )
        .agg(F.count(F.lit(1)).alias("__n__"))
        .collect()
    )
    table = sorted(
        (tuple(int(r[c]) for c in cols), int(r["__n__"])) for r in patt
    )
    n_total = sum(n for _, n in table)
    if n_total == 0:
        raise ValueError("no candidate pairs to fit on")
    p = _clamp(p_init)
    m = [_clamp(m_init)] * len(cols)
    u = [_clamp(u_init)] * len(cols)
    for _ in range(iters):
        sw = 0.0  # Σ n·w
        sm = [0.0] * len(cols)  # Σ n·w·γ_k
        su = [0.0] * len(cols)  # Σ n·(1-w)·γ_k
        for gamma, n in table:
            lm = p
            lu = 1.0 - p
            for k, g in enumerate(gamma):
                lm *= m[k] if g else (1.0 - m[k])
                lu *= u[k] if g else (1.0 - u[k])
            w = lm / (lm + lu)
            sw += n * w
            for k, g in enumerate(gamma):
                if g:
                    sm[k] += n * w
                    su[k] += n * (1.0 - w)
        p = _clamp(sw / n_total)
        m = [_clamp(sm[k] / sw) for k in range(len(cols))]
        u = [_clamp(su[k] / (n_total - sw)) for k in range(len(cols))]
    return {
        "p": p,
        "m": dict(zip(cols, m)),
        "u": dict(zip(cols, u)),
        "n_pairs": n_total,
        "iters": iters,
    }


def fs_score(
    pairs: DataFrame, agree_cols: Sequence[str], model: Dict
) -> DataFrame:
    """Append ``match_weight`` (the Fellegi–Sunter log2 likelihood
    ratio) and ``match_prob`` (the posterior under the fitted prior) to
    every candidate pair — one JVM expression, no UDF, no shuffle."""
    weight = F.lit(0.0)
    for c in agree_cols:
        mm, uu = model["m"][c], model["u"][c]
        agree_w = math.log2(mm / uu)
        disagree_w = math.log2((1.0 - mm) / (1.0 - uu))
        weight = weight + F.when(
            F.col(c).cast("boolean"), F.lit(agree_w)
        ).otherwise(F.lit(disagree_w))
    p = model["p"]
    prior_odds = p / (1.0 - p)
    odds = F.lit(prior_odds) * F.pow(F.lit(2.0), weight)
    return pairs.withColumn("match_weight", weight).withColumn(
        "match_prob", odds / (F.lit(1.0) + odds)
    )


def fs_link(
    pairs: DataFrame,
    agree_cols: Sequence[str],
    iters: int = 20,
    threshold: float = 0.5,
) -> DataFrame:
    """Fit + score + decide in one call: returns the pairs with
    match_weight, match_prob and ``is_match`` = prob >= threshold."""
    model = fs_em_fit(pairs, agree_cols, iters=iters)
    return fs_score(pairs, agree_cols, model).withColumn(
        "is_match", F.col("match_prob") >= F.lit(threshold)
    )
