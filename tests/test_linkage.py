"""Fellegi–Sunter EM record linkage (operators/linkage.py): exact
agreement with a pure-Python reference EM, partitioning invariance,
scoring arithmetic, and parameter recovery on planted structure."""

import math

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.linkage import (
    fs_em_fit,
    fs_link,
    fs_score,
)

COLS = ["a1", "a2", "a3"]


def _planted_pairs(spark, n=4000):
    """Deterministic mixture: ~1/4 'true matches' whose fields agree
    with high probability, the rest agreeing rarely (pseudo-random by
    integer hashing, fully reproducible)."""
    import hashlib

    def h100(*key):
        raw = hashlib.md5(",".join(map(str, key)).encode()).hexdigest()
        return int(raw[:8], 16) % 100

    rows = []
    for i in range(n):
        is_match = h100("m", i) < 25
        r = []
        for k in range(3):
            h = h100(i, k)
            r.append(1 if (h < 85 if is_match else h < 15) else 0)
        rows.append((i, i + n, *r))
    return spark.createDataFrame(rows, ["id_a", "id_b", *COLS])


def _ref_em(table, iters, p=0.1, m0=0.9, u0=0.1):
    eps = 1e-6
    clamp = lambda x: min(max(x, eps), 1 - eps)
    m = [m0] * 3
    u = [u0] * 3
    n_total = sum(n for _, n in table)
    for _ in range(iters):
        sw, sm, su = 0.0, [0.0] * 3, [0.0] * 3
        for gamma, n in table:
            lm, lu = p, 1 - p
            for k, g in enumerate(gamma):
                lm *= m[k] if g else 1 - m[k]
                lu *= u[k] if g else 1 - u[k]
            w = lm / (lm + lu)
            sw += n * w
            for k, g in enumerate(gamma):
                if g:
                    sm[k] += n * w
                    su[k] += n * (1 - w)
        p = clamp(sw / n_total)
        m = [clamp(sm[k] / sw) for k in range(3)]
        u = [clamp(su[k] / (n_total - sw)) for k in range(3)]
    return p, m, u


def _pattern_table(pairs):
    rows = (
        pairs.groupBy(*COLS).agg(F.count(F.lit(1)).alias("n")).collect()
    )
    return sorted((tuple(int(r[c]) for c in COLS), int(r["n"])) for r in rows)


def test_fit_matches_pure_python_reference(spark):
    pairs = _planted_pairs(spark)
    model = fs_em_fit(pairs, COLS, iters=7)
    p, m, u = _ref_em(_pattern_table(pairs), iters=7)
    assert model["p"] == pytest.approx(p, abs=0)
    for k, c in enumerate(COLS):
        assert model["m"][c] == pytest.approx(m[k], abs=0)
        assert model["u"][c] == pytest.approx(u[k], abs=0)


def test_fit_partitioning_invariant(spark):
    pairs = _planted_pairs(spark)
    a = fs_em_fit(pairs.repartition(13), COLS, iters=5)
    b = fs_em_fit(pairs.coalesce(1), COLS, iters=5)
    assert a == b


def test_recovers_planted_structure(spark):
    model = fs_em_fit(_planted_pairs(spark), COLS, iters=25)
    # true generating process: p=0.25, m ~= 0.85, u ~= 0.15
    assert 0.15 < model["p"] < 0.40
    for c in COLS:
        assert model["m"][c] > 0.7 > 0.3 > model["u"][c]


def test_score_arithmetic(spark):
    model = {
        "p": 0.2,
        "m": {"a1": 0.9, "a2": 0.8, "a3": 0.7},
        "u": {"a1": 0.1, "a2": 0.2, "a3": 0.3},
    }
    df = spark.createDataFrame([(1, 2, 1, 0, 1)], ["id_a", "id_b", *COLS])
    row = fs_score(df, COLS, model).collect()[0]
    want = (
        math.log2(0.9 / 0.1)
        + math.log2((1 - 0.8) / (1 - 0.2))
        + math.log2(0.7 / 0.3)
    )
    assert row.match_weight == pytest.approx(want, rel=1e-12)
    odds = 0.25 * 2**want
    assert row.match_prob == pytest.approx(odds / (1 + odds), rel=1e-12)


def test_link_separates_matches(spark):
    out = fs_link(_planted_pairs(spark), COLS, iters=25, threshold=0.5)
    agg = (
        out.groupBy(*COLS)
        .agg(F.first("is_match").alias("dec"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    dec = {tuple(int(r[c]) for c in COLS): r.dec for r in agg}
    assert dec[(1, 1, 1)] is True
    assert dec[(0, 0, 0)] is False


def test_empty_pairs_raise(spark):
    df = spark.createDataFrame([], "id_a long, id_b long, a1 int, a2 int, a3 int")
    with pytest.raises(ValueError, match="no candidate pairs"):
        fs_em_fit(df, COLS)
