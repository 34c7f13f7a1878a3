"""KLL-style quantile sketch (operators/sketches.QuantileSketch):
measured rank-error guarantees on uniform/skewed/sorted inputs,
mergeability, determinism, and the distributed build."""

import pytest

from fluss_datafusion_spark.operators.sketches import (
    QuantileSketch,
    kll_build,
    kll_quantile_check,
)


def _rank_err(values, sk, qs):
    values = sorted(values)
    n = len(values)
    worst = 0.0
    for q in qs:
        est = sk.quantile(q)
        rank = sum(1 for v in values if v <= est)
        worst = max(worst, abs(rank - q * n) / n)
    return worst


QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def test_rank_error_uniform_and_sorted():
    # deterministic "uniform" stream + the adversarial sorted stream
    vals = [((i * 2654435761) % 100003) / 100003.0 for i in range(50000)]
    for stream in (vals, sorted(vals), sorted(vals, reverse=True)):
        sk = QuantileSketch(k=200).update_many(stream)
        assert _rank_err(vals, sk, QS) <= 0.02, "rank error too large"


def test_rank_error_skewed():
    # log-spaced over ~15 decades, all distinct
    vals = [2.0 ** (((i * 7919) % 3000) / 60.0) for i in range(30000)]
    sk = QuantileSketch(k=200).update_many(vals)
    assert _rank_err(vals, sk, QS) <= 0.02


def test_heavy_ties_land_on_mass_boundaries():
    # 30 distinct values, ~3.3% of mass each: no estimator can beat the
    # boundary granularity, but the returned value's rank interval must
    # CONTAIN a point within eps of the target (the estimate is one of
    # the corpus values whose mass straddles the target rank)
    vals = [2.0 ** ((i * 7919) % 30) for i in range(30000)]
    sk = QuantileSketch(k=200).update_many(vals)
    svals = sorted(vals)
    n = len(svals)
    eps = 0.02
    for q in QS:
        est = sk.quantile(q)
        lo = sum(1 for v in svals if v < est)   # rank interval of est
        hi = sum(1 for v in svals if v <= est)
        # the target rank must fall inside [lo - eps*n, hi + eps*n]
        assert lo - eps * n <= q * n <= hi + eps * n, (q, lo, hi)


def test_small_input_exact():
    vals = [float(i) for i in range(100)]
    sk = QuantileSketch(k=200).update_many(vals)
    # below k items nothing ever compacts: quantiles are exact
    assert sk.quantile(0.5) == 49.0
    assert sk.quantile(0.0) == 0.0
    assert sk.quantile(1.0) == 99.0


def test_merge_preserves_guarantee():
    a = [float((i * 104729) % 9973) for i in range(20000)]
    b = [float((i * 95531) % 9973) + 5000 for i in range(20000)]
    ska = QuantileSketch(k=200).update_many(a)
    skb = QuantileSketch(k=200).update_many(b)
    ska.merge(skb)
    assert ska.n == 40000
    assert _rank_err(a + b, ska, QS) <= 0.02


def test_deterministic():
    vals = [((i * 31) % 1009) / 1009.0 for i in range(10000)]
    s1 = QuantileSketch(k=64).update_many(vals)
    s2 = QuantileSketch(k=64).update_many(vals)
    assert s1.quantiles(QS) == s2.quantiles(QS)


def test_empty_and_validation():
    sk = QuantileSketch(k=64)
    with pytest.raises(ValueError, match="empty"):
        sk.quantile(0.5)
    with pytest.raises(ValueError, match="at least 8"):
        QuantileSketch(k=2)
    sk.update_many([1.0])
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        sk.quantile(1.5)


def test_distributed_build_and_check(spark):
    df = spark.range(30000).selectExpr(
        "CAST((id * 2654435761) % 100003 AS DOUBLE) AS v"
    )
    sk = kll_build(df, "v", k=200)
    assert sk.n == 30000
    vals = [r.v for r in df.collect()]
    assert _rank_err(vals, sk, QS) <= 0.025
    out = kll_quantile_check(df, "v", [0.1, 0.5, 0.9], k=200).collect()
    assert len(out) == 3
    assert all(r.ok for r in out)
    assert all(r.n == 30000 for r in out)
